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

Layout: [T, N, S, D] (heads second) so q/k/v blocks are (1, HB, S, D) with
tile-aligned trailing dims; the caller transposes from the ViT's [T, S, N, D].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_BLOCK = 4


def _kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale: float):
    hb, s, d = q_ref.shape[1:]
    cos = cos_ref[:]  # [S, D] f32
    sin = sin_ref[:]
    half = d // 2
    # rotate_half(x) = concat(-x[half:], x[:half]) == roll(x, half) * sign
    sign = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (s, d), 1) < half, -1.0, 1.0
    )

    def rope(x32):
        return x32 * cos + pltpu.roll(x32, half, axis=1) * sign * sin

    for h in range(hb):
        q32 = q_ref[0, h].astype(jnp.float32)  # [S, D]
        k32 = k_ref[0, h].astype(jnp.float32)
        qr = rope(q32).astype(q_ref.dtype)
        kr = rope(k32).astype(k_ref.dtype)
        logits = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [S, S] f32, VMEM-resident
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            p, v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@jax.jit
def vit_attention(
    q: jax.Array,  # [T, S, N, D] bf16, PRE-rotary
    k: jax.Array,
    v: jax.Array,
    cos: jax.Array,  # [S, D] fp32 2-D rotary tables
    sin: jax.Array,
) -> jax.Array:
    """Returns attention output [T, S, N, D] (rotary applied in-kernel)."""
    t, s, n, d = q.shape
    hb = math.gcd(n, HEAD_BLOCK)
    qt = q.transpose(0, 2, 1, 3)  # [T, N, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    spec = pl.BlockSpec((1, hb, s, d), lambda i, j: (i, j, 0, 0))
    table = pl.BlockSpec((s, d), lambda i, j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(1.0 / math.sqrt(d))),
        grid=(t, n // hb),
        in_specs=[spec, spec, spec, table, table],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t, n, s, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * n * s * s * d,
            bytes_accessed=4 * t * n * s * d * 2,
            transcendentals=t * n * s * s,
        ),
    )(qt, kt, vt, cos.astype(jnp.float32), sin.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3)
