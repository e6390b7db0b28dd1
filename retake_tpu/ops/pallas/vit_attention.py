"""Pallas TPU kernel: Qwen2-VL ViT attention with fused 2-D rotary.

The ViT runs full bidirectional attention within each temporal slice
(576 patches at 448px) for every frame and head. An XLA einsum materializes
the [T, N, S, S] fp32 logits in HBM — measured ~29 ms per layer per
128-frame chunk (~930 ms of a 1.68 s block stack) for <1% of the ViT's
FLOPs. Here each (frame, head-block) step holds its [S, S] logits entirely
in VMEM (1.3 MB), so attention+rope drop to HBM reads of q/k/v only.

The 2-D rotary (vision.vision_rotary_tables) is applied in-kernel in fp32
(HF parity: rotate in fp32, cast back to bf16 before the MXU), using
``pltpu.roll`` + a sign mask for rotate_half — lane slicing at head_dim/2=40
is not tile-aligned, a roll is.

Layout: the kernel consumes the qkv projection output directly with
HEAD-MAJOR columns ([q_h | k_h | v_h] per head) — the caller reorders the
projection's WEIGHT columns once (models/qwen2_vl/vision.py), so no
[T, S, *] activation ever gets transposed (those transposes alone measured
~6 ms/layer). Heads are lane-axis slices; head groups are sized so block
lane widths are multiples of 128 (Pallas TPU tiling).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_BLOCK = 8  # max heads per grid step


def _qkv_kernel(qkv_ref, cos_ref, sin_ref, o_ref, *, hb: int, scale: float):
    """One (frame, head-group) step over a head-major [S, HB*3*D] qkv block.

    Heads live as lane-axis slices [q_h | k_h | v_h] so every access stays
    2-D (Mosaic cannot shape-cast middle unit dims) and blocks stay small
    enough for VMEM double-buffering."""
    s = qkv_ref.shape[1]
    d = cos_ref.shape[1]
    cos = cos_ref[:]  # [S, D] f32
    sin = sin_ref[:]
    half = d // 2
    sign = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (s, d), 1) < half, -1.0, 1.0
    )

    def rope(x32):
        return x32 * cos + pltpu.roll(x32, half, axis=1) * sign * sin

    outs = []
    for h in range(hb):
        base = h * 3 * d
        q = qkv_ref[0, :, base : base + d]
        k = qkv_ref[0, :, base + d : base + 2 * d]
        v = qkv_ref[0, :, base + 2 * d : base + 3 * d]
        qr = rope(q.astype(jnp.float32)).astype(o_ref.dtype)
        kr = rope(k.astype(jnp.float32)).astype(o_ref.dtype)
        logits = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [S, S] f32, VMEM-resident
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype))
    o_ref[0] = outs[0] if hb == 1 else jnp.concatenate(outs, axis=1)


@jax.jit
def vit_attention_qkv(
    qkv: jax.Array,  # [T, S, N, 3, D] bf16 PRE-rotary, HEAD-MAJOR qkv
    cos: jax.Array,  # [S, D] fp32 2-D rotary tables
    sin: jax.Array,
) -> jax.Array:
    """Attention output [T, S, N*D]; rotary applied in-kernel.

    Expects the qkv projection output with HEAD-MAJOR columns
    ([q_h | k_h | v_h] per head) — reorder the projection's weight columns
    once instead of transposing the [T, S, *] activations every layer.
    """
    t, s, n, _, d = qkv.shape
    # block lane widths (hb*3*d and hb*d) must be multiples of 128 unless
    # they cover the whole axis (Pallas TPU block constraint)
    hb = n
    for cand in range(min(n, HEAD_BLOCK), 0, -1):
        if n % cand == 0 and (cand * 3 * d) % 128 == 0 and (
            cand * d
        ) % 128 == 0:
            hb = cand
            break
    flat = qkv.reshape(t, s, n * 3 * d)
    out = pl.pallas_call(
        functools.partial(
            _qkv_kernel, hb=hb, scale=float(1.0 / math.sqrt(d))
        ),
        grid=(t, n // hb),
        in_specs=[
            pl.BlockSpec((1, s, hb * 3 * d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((s, d), lambda i, j: (0, 0)),
            pl.BlockSpec((s, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, hb * d), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((t, s, n * d), qkv.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * n * s * s * d,
            bytes_accessed=4 * t * n * s * d * 2,
            transcendentals=t * n * s * s,
        ),
    )(flat, cos.astype(jnp.float32), sin.astype(jnp.float32))
    return out
