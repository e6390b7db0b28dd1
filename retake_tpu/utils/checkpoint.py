"""Native checkpoint save/load for (possibly quantized) param pytrees.

The reference has no checkpoint I/O of its own (HF from_pretrained only —
SURVEY.md §5). Here, `tools/quantize_checkpoint.py` quantizes an HF
checkpoint ONCE and saves the resulting pytree; engines then load the
pre-quantized file directly — startup skips both the bf16-sized disk read
(int8 halves the bytes) and the on-device quantization pass. The format
is a single .safetensors file (keys = '/'-joined pytree paths; bf16 and
int8 tensors supported natively) plus a small JSON sidecar recording the
model name and quantization mode for load-time compatibility checks.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

FILENAME = "retake_quantized.safetensors"
META_FILENAME = "retake_quantized.json"


def _flatten(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        assert "/" not in str(k), f"pytree key {k!r} contains '/'"
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        elif v is None:
            continue
        else:
            flat[key] = v
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: dict, out_dir: str, meta: Optional[dict] = None):
    """Write a param pytree (nested dicts of arrays) to ``out_dir``."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    save_file(flat, os.path.join(out_dir, FILENAME))
    with open(os.path.join(out_dir, META_FILENAME), "w") as f:
        json.dump(meta or {}, f)


def has_params(path: str) -> bool:
    return os.path.exists(os.path.join(path, FILENAME))


def load_meta(path: str) -> dict:
    mp = os.path.join(path, META_FILENAME)
    if not os.path.exists(mp):
        return {}
    with open(mp) as f:
        return json.load(f)


def load_checked(path: str, rt, expect_model: str) -> dict:
    """Load a pre-quantized pytree with the compatibility gates both
    engine loaders need: the run's quantization mode must expect int8
    weights, a w8a8 run needs a --vit checkpoint, and the sidecar's
    model_name must match the engine family being built (a qwen run
    pointed at a llava-quantized dir would otherwise fail minutes later
    inside the first jit instead of at startup)."""
    meta = load_meta(path)
    saved = str(meta.get("model_name", "")).lower().replace("-", "").replace("_", "")
    want = expect_model.lower().replace("-", "").replace("_", "")
    # llava_onevision and llava_video share one params layout
    fam = lambda n: "llava" if n.startswith("llava") else n  # noqa: E731
    # explicit raises (not asserts): these are input/config validation and
    # must survive python -O
    if saved and fam(saved) != fam(want):
        raise ValueError(
            f"{path} was quantized for model_name="
            f"{meta.get('model_name')!r}, not {expect_model!r}"
        )
    if rt.quantization not in ("int8", "w8a8"):
        raise ValueError(
            f"{path} holds int8 weights but the config requests "
            f"quantization={rt.quantization!r}"
        )
    if rt.quantization == "w8a8" and not meta.get("vit_int8"):
        raise ValueError(
            "w8a8 config needs a checkpoint quantized with --vit"
        )
    return load_params(path)


def load_params(path: str, device: bool = True) -> dict:
    """Load a saved pytree; arrays land on the default device as jnp
    arrays (``device=False`` keeps host numpy for tests/tools)."""
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(path, FILENAME))
    if device:
        import jax.numpy as jnp

        flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return _unflatten(flat)
