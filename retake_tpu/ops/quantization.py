"""int8 quantization: weight-only (exact dequant) and W8A8 (int8 MXU path).

TPU-native capability beyond the reference (which needs >=24 GB GPUs for the
7B models). Two modes:

* **Weight-only** (``quantization: int8``): int8 weights halve HBM at rest
  and in the decode-critical weight reads, letting Qwen2-VL-7B (16.6 GB
  bf16) fit one 16 GB v5e chip. Matmuls dequantize on the fly —
  ``(x @ w_q) * scale`` commutes with the per-column scale, so results match
  ``x @ (w_q * scale)`` exactly; XLA converts int8 operand tiles to bf16 as
  it feeds the MXU inside the fused dot.
* **W8A8** (``quantization: w8a8``): additionally quantizes *activations*
  per-row (per-token symmetric) at prefill so the dot runs int8 x int8 ->
  int32 on the MXU's double-rate int8 path. Measured on this v5e
  (tools/int8_matmul_bench.py, 8k^3): 279 TOP/s int8 vs 153 TF/s bf16;
  the full dynamic-quant linear sustains 241 TOP/s (1.57x bf16) including
  quantize/dequant. Lossy (~8-bit activation rounding) — opt-in; decode
  keeps the exact weight-only path (single-row matmuls are HBM-bound, the
  int8 MXU rate does not help them).

A quantized linear is represented as {'w': int8 [.., in, out],
'scale': f32 [.., out]}; unquantized ones stay {'w': bf16 array}. The layer
code (models/*/text.py, models/*/vision.py) dispatches on the presence of
'scale'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, axis: int = -2) -> dict:
    """Symmetric per-output-channel int8: reduce |w| over the input axis."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w": q, "scale": jnp.squeeze(scale, axis=axis)}


def quantize_embedding(e: jax.Array) -> dict:
    """Per-row (per-token) int8 for the embedding table [V, d]."""
    e32 = e.astype(jnp.float32)
    amax = jnp.max(jnp.abs(e32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(e32 / scale), -127, 127).astype(jnp.int8)
    return {"w": q, "scale": scale[:, 0]}


def quantize_kv_block(block: jax.Array):
    """Per-key symmetric int8 for KV-cache blocks:
    [.., S, D] -> (int8 block, f32 scale [.., S]). The scale commutes with
    both attention contractions (see runtime/cache.py KVCache docstring)."""
    b32 = block.astype(jnp.float32)
    amax = jnp.max(jnp.abs(b32), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(b32 / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_acts(x: jax.Array):
    """Dynamic per-row symmetric int8 activation quantization.

    Returns (x_q int8, scale f32 [.., 1]); rows are the token axis, so each
    token gets its own scale (robust to per-token magnitude variation).
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul_prequant(
    xq: jax.Array, xs: jax.Array, w_q: jax.Array, w_scale: jax.Array, dtype
) -> jax.Array:
    """int8 dot over pre-quantized activations (so q/k/v or gate/up share
    ONE activation quantization), dequantized to ``dtype``."""
    acc = jax.lax.dot_general(
        xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * w_scale).astype(dtype)


def int8_linear(x: jax.Array, w_q: jax.Array, w_scale: jax.Array) -> jax.Array:
    """W8A8 linear: dynamic-quantize x, int8 dot on the MXU, dequantize.

    x [.., S, in] (any float dtype), w_q int8 [in, out], w_scale f32 [out].
    The int32 accumulator is exact; the only loss is the 8-bit rounding of x.
    """
    xq, xs = quantize_acts(x)
    return int8_matmul_prequant(xq, xs, w_q, w_scale, x.dtype)


def qlinear(x: jax.Array, p: dict, act_int8: bool = False, bias_key: str = "b"):
    """Shared linear dispatch over a {'w'[, 'scale'][, bias]} leaf dict:

    * bf16 weights: plain dot;
    * int8 weights ({'w', 'scale'}): exact weight-only dequant
      ``(x @ w_q) * scale`` — XLA streams the int8 tiles and converts
      in-core inside the fused dot (the decode fast path);
    * ``act_int8``: W8A8 — dynamic per-token activation quant + int8 dot on
      the MXU double-rate path (prefill only).
    """
    w = p["w"]
    if "scale" in p:
        if act_int8:
            y = int8_linear(x, w, p["scale"])
        else:
            y = (x @ w.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ w
    b = p.get(bias_key)
    return y if b is None else y + b


_LINEAR_KEYS = ("q", "k", "v", "o", "gate", "up", "down")
_VIT_BLOCK_KEYS = ("qkv", "proj", "fc1", "fc2")


def _quantize_keys(tree: dict, keys) -> dict:
    """Copy ``tree`` with each ``tree[key]`` linear ({'w', ...}) replaced by
    its int8 {'w', 'scale'} form (biases and other leaves preserved)."""
    out = dict(tree)
    for key in keys:
        lp = dict(out[key])
        qd = quantize_weight(lp["w"])
        lp["w"] = qd["w"]
        lp["scale"] = qd["scale"]
        out[key] = lp
    return out


def quantize_llm_int8(params: dict) -> dict:
    """Quantize the decoder linears + lm_head + embedding of a param pytree
    (Qwen2-VL or LLaVA layout). Norms, biases and the vision tower stay bf16
    (vision is ~8% of 7B's footprint and the accuracy-critical front end).

    Runs as one jit so multi-GB tables never round-trip through host numpy.
    """

    @jax.jit
    def _quant(p):
        out = dict(p)
        out["layers"] = _quantize_keys(p["layers"], _LINEAR_KEYS)
        out["embed_tokens"] = quantize_embedding(p["embed_tokens"])
        if "lm_head" in p:
            out["lm_head"] = quantize_weight(p["lm_head"])
        return out

    return _quant(params)


def quantize_vit_int8(visual: dict) -> dict:
    """Quantize the Qwen2-VL vision-tower block + merger linears (W8A8 mode).

    patch_embed stays bf16 (first layer sees raw pixel statistics and is
    <1% of the tower's FLOPs); layer norms and biases stay bf16.
    """

    @jax.jit
    def _quant(p):
        out = dict(p)
        out["blocks"] = _quantize_keys(p["blocks"], _VIT_BLOCK_KEYS)
        out["merger"] = _quantize_keys(p["merger"], ("fc1", "fc2"))
        return out

    return _quant(visual)


def quantize_siglip_int8(params: dict) -> dict:
    """Quantize the LLaVA SigLIP tower block linears + multimodal projector
    (W8A8 mode). patch_embed / pos_embed / norms stay bf16.
    """

    @jax.jit
    def _quant(p):
        out = dict(p)
        vt = dict(p["vision_tower"])
        vt["blocks"] = _quantize_keys(
            vt["blocks"], ("q", "k", "v", "out", "fc1", "fc2")
        )
        out["vision_tower"] = vt
        out["projector"] = _quantize_keys(
            p["projector"], ("linear_1", "linear_2")
        )
        return out

    return _quant(params)


def param_bytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
