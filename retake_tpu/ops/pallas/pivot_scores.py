"""Pallas TPU kernel: PivotKV eviction scoring with zero HBM probability
traffic.

The reference pays a second full softmax(QK^T) matmul per layer per chunk for
eviction scores (retake/longvideo_cache.py:264-270); an XLA port additionally
materializes the [H, S, S] fp32 probability tensor in HBM (~0.5 GB per layer
per chunk at production shapes). This kernel keeps the whole per-q-block
logit tile in VMEM scratch and does a single matmul + a single exp pass:

  grid (kv_head, q_block):
    scratch[rows, S_pad] = (q_score @ k_score^T) * scale, cols >= valid -> -inf
    m, l = row max / row sum(exp)                      (softmax stats)
    scratch = exp(scratch - m) / l, invalid rows -> 0  (in-place)
    scores[kv_head] += column sums                     (accumulate over q)

Scoring is intentionally NOT fused into the flash-attention kernel: under
``pos_embed_reforge`` (the shipped default) the scoring inputs are the
de-rotated q/k (longvideo_cache.py:248-259), so the attention pass's QK^T
cannot be reused, and measurement showed the in-kernel two-pass variant
(recompute tiles because online-softmax stats finalize only after the sweep)
costs ~2x this standalone single-pass kernel.

Returns per-KV-head sums; combine with ``sums.sum(0) / (num_kv * group)`` and
keypatch/validity masking for parity with ops.pivotkv.eviction_scores.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# VMEM budget for the [G*BQ, S_pad] fp32 logit scratch; block_q shrinks until
# it fits (v5e scoped VMEM is 16 MB and the q/k blocks + pipeline need room)
_SCRATCH_BYTES = 9 * 1024 * 1024
DEFAULT_BQ = 256


def _kernel(
    scalar_ref,  # SMEM [1]: valid_len
    q_ref,  # [1, G, BQ, D]
    k_ref,  # [1, S_pad, D]
    score_ref,  # [1, 8, S_pad] f32 out — sums land in sublane 0
    logit_ref,  # VMEM scratch [G*BQ, S_pad] f32
    *,
    bq: int,
    scale: float,
):
    j = pl.program_id(1)
    valid_len = scalar_ref[0]
    g, _, d = q_ref.shape[1:]
    rows = g * bq
    s_pad = k_ref.shape[1]

    q = q_ref[0].reshape(rows, d)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [rows, S_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, s_pad), 1)
    logit_ref[:] = jnp.where(col < valid_len, s, NEG_INF)

    m = jnp.max(logit_ref[:], axis=-1, keepdims=True)  # [rows, 1]
    p = jnp.exp(logit_ref[:] - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # invalid (padding) query rows contribute no mass; row r of the flattened
    # [G*BQ] layout holds query token j*bq + r % bq
    row_tok = j * bq + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % bq
    )
    w = jnp.where(row_tok < valid_len, 1.0 / jnp.maximum(l, 1e-37), 0.0)
    colsum = jnp.sum(p * w, axis=0, keepdims=True)  # [1, S_pad]
    contrib = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (8, s_pad), 0) == 0, colsum, 0.0
    )
    prev = jnp.where(j == 0, 0.0, score_ref[0])
    score_ref[0] = prev + contrib


@functools.partial(jax.jit, static_argnames=("block_q",))
def pivot_score_sums(
    q_score: jax.Array,  # [H, S, D] scoring queries (de-rotated if reforge)
    k_score: jax.Array,  # [KV, S, D] scoring keys
    valid_len: jax.Array,  # scalar int32 — valid (non-pad) chunk tokens
    block_q: int = DEFAULT_BQ,
) -> jax.Array:
    """Per-KV-head eviction score sums [KV, S] float32."""
    num_heads, s, d = q_score.shape
    num_kv = k_score.shape[0]
    g = num_heads // num_kv

    s_pad_k = -(-s // 512) * 512
    block_q = min(block_q, -(-s // 8) * 8)
    while g * block_q * s_pad_k * 4 > _SCRATCH_BYTES and block_q > 8:
        block_q //= 2
    s_pad_q = -(-s // block_q) * block_q

    q = q_score.reshape(num_kv, g, s, d)
    if s_pad_q != s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad_q - s), (0, 0)))
    k = k_score
    if s_pad_k != s:
        k = jnp.pad(k, ((0, 0), (0, s_pad_k - s), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_kv, s_pad_q // block_q),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda i, j, sc: (i, 0, j, 0)),
            pl.BlockSpec((1, s_pad_k, d), lambda i, j, sc: (i, 0, 0)),
        ],
        # q axis accumulates into the same output block -> "arbitrary"
        out_specs=pl.BlockSpec((1, 8, s_pad_k), lambda i, j, sc: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, s_pad_k), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, bq=block_q, scale=float(1.0 / math.sqrt(d))
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_kv, 8, s_pad_k), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_pad_q * s_pad_k * d * num_heads,
            bytes_accessed=(num_heads * s_pad_q + num_kv * s_pad_k) * d * 2,
            transcendentals=s_pad_q * s_pad_k * num_heads,
        ),
    )(valid_len.astype(jnp.int32)[None], q, k)
    return out.sum(axis=1)[:, :s]  # fold sublane partials
