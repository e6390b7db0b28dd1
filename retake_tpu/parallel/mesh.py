"""Device mesh + sharding rules (tensor/data parallel inference).

The reference's only distribution strategy is NCCL data-parallel eval — one
full model replica per GPU (retake/infer_eval.py:149-229; SURVEY.md §2.4).
TPU-native equivalents here:

* **dp** — replica axis. Eval sharding stays embarrassingly parallel
  (round-robin per host, eval/), but within one process multiple requests can
  also ride a batch axis sharded over ``dp``.
* **tp** — tensor parallel over attention heads / MLP columns via GSPMD:
  parameters carry NamedShardings; XLA inserts the all-reduces over ICI.
  Lets Qwen2-VL-7B (16.6 GB bf16 params) run on 2-4 v5e chips when a single
  chip's HBM is insufficient — the latent "device_map" option the reference
  never implemented (SURVEY.md §2.4).
* pp/sp/ep — intentionally absent: 7B inference needs no pipeline; long
  context is handled *algorithmically* (chunked prefill + PivotKV), which is
  the whole point of ReTaKe (SURVEY.md §5 long-context).

KV-cache sharding rides the kv_heads axis (4 KV heads => tp ≤ 4), so eviction
gather/top-k stays chip-local: scores are reduced over heads with one psum.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    dev = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev, ("dp", "tp"))


# column-parallel linears (output dim sharded); row-parallel (input sharded)
_COL_PARALLEL = ("q", "k", "v", "gate", "up")
_ROW_PARALLEL = ("o", "down")


def _spec_for_path(path, leaf) -> P:
    """TP sharding rule from the tree path — works for both bf16 and int8
    ({'w','scale'}) parameter layouts (models/*/params.py, ops/quantization)."""
    names = [p.key for p in path if hasattr(p, "key")]
    if "layers" in names and len(names) >= 2:
        parent, leaf_name = names[-2], names[-1]
        if parent in _COL_PARALLEL:
            if leaf_name == "w":
                return P(None, None, "tp")
            if leaf_name in ("b", "scale"):
                return P(None, "tp")
        if parent in _ROW_PARALLEL:
            if leaf_name == "w":
                return P(None, "tp", None)
            return P()  # row-parallel outputs replicate bias/scale
    if names and names[0] == "lm_head":
        if names[-1] == "scale":
            return P("tp")
        return P(None, "tp")
    if names == ["lm_head"]:
        return P(None, "tp")
    return P()  # embeddings, norms, vision tower: replicated


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedShardings matching an actual parameter pytree (TP over heads /
    MLP columns; vision + norms replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)),
        params,
    )


def cache_shardings(mesh: Mesh):
    """KVCache shardings: kv_heads on tp; positions replicated (tiny)."""
    from retake_tpu.runtime.cache import KVCache

    return KVCache(
        k=NamedSharding(mesh, P(None, "tp", None, None)),
        v=NamedSharding(mesh, P(None, "tp", None, None)),
        pos=NamedSharding(mesh, P()),
        length=NamedSharding(mesh, P()),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    return jax.device_put(params, param_shardings(mesh, params))
