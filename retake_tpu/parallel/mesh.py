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


def param_shardings(mesh: Mesh) -> dict:
    """NamedShardings for the Qwen2-VL parameter pytree (TP over heads/cols).

    Layout mirrors models/qwen2_vl/params.py. Embedding and norms replicate;
    attention/MLP shard on the tp axis. The vision tower replicates (it is
    small and frame-batched; shard later if it becomes the limiter).
    """

    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    rep = s()
    layers = {
        "input_ln": s(None, None),
        "q": {"w": s(None, None, "tp"), "b": s(None, "tp")},
        "k": {"w": s(None, None, "tp"), "b": s(None, "tp")},
        "v": {"w": s(None, None, "tp"), "b": s(None, "tp")},
        "o": {"w": s(None, "tp", None)},
        "post_ln": s(None, None),
        "gate": {"w": s(None, None, "tp")},
        "up": {"w": s(None, None, "tp")},
        "down": {"w": s(None, "tp", None)},
    }
    visual_rep = jax.tree.map(
        lambda _: rep,
        {
            "patch_embed": {"w": 0},
            "blocks": {
                "ln1": {"scale": 0, "bias": 0},
                "qkv": {"w": 0, "b": 0},
                "proj": {"w": 0, "b": 0},
                "ln2": {"scale": 0, "bias": 0},
                "fc1": {"w": 0, "b": 0},
                "fc2": {"w": 0, "b": 0},
            },
            "merger": {
                "ln_q": {"scale": 0, "bias": 0},
                "fc1": {"w": 0, "b": 0},
                "fc2": {"w": 0, "b": 0},
            },
        },
    )
    return {
        "embed_tokens": rep,
        "layers": layers,
        "final_ln": rep,
        "lm_head": s(None, "tp"),
        "visual": visual_rep,
    }


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
    shardings = param_shardings(mesh)
    if "lm_head" not in params:
        shardings = dict(shardings)
        shardings.pop("lm_head")
    return jax.device_put(params, shardings)
