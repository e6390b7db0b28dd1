"""Weight-only int8 quantization (per-output-channel symmetric).

TPU-native capability beyond the reference (which needs >=24 GB GPUs for the
7B models): int8 weights halve HBM at rest and in the decode-critical weight
reads, letting Qwen2-VL-7B (16.6 GB bf16) fit one 16 GB v5e chip. Matmuls
dequantize on the fly — ``(x @ w_q) * scale`` commutes with the per-column
scale, so results match ``x @ (w_q * scale)`` exactly; XLA converts int8
operand tiles to bf16 as it feeds the MXU inside the fused dot.

A quantized linear is represented as {'w': int8 [.., in, out],
'scale': f32 [.., out]}; unquantized ones stay {'w': bf16 array}. The layer
code (models/*/text.py) dispatches on the presence of 'scale'.
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


_LINEAR_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm_int8(params: dict) -> dict:
    """Quantize the decoder linears + lm_head + embedding of a param pytree
    (Qwen2-VL or LLaVA layout). Norms, biases and the vision tower stay bf16
    (vision is ~8% of 7B's footprint and the accuracy-critical front end).

    Runs as one jit so multi-GB tables never round-trip through host numpy.
    """

    @jax.jit
    def _quant(p):
        out = dict(p)
        layers = dict(p["layers"])
        for key in _LINEAR_KEYS:
            lp = dict(layers[key])
            qd = quantize_weight(lp["w"])
            lp["w"] = qd["w"]
            lp["scale"] = qd["scale"]
            layers[key] = lp
        out["layers"] = layers
        out["embed_tokens"] = quantize_embedding(p["embed_tokens"])
        if "lm_head" in p:
            out["lm_head"] = quantize_weight(p["lm_head"])
        return out

    return _quant(params)


def param_bytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
