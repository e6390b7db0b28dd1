"""Pallas TPU kernel: chunked-prefill flash attention over a static KV budget.

The TPU replacement for the reference's flash-attn CUDA kernels
(retake/qwen2_vl.py:224-363). One kernel handles the whole ReTaKe chunk-step
attention pattern:

  queries  : one prefill chunk [H, S, D] (padded tail masked via valid_len)
  keys     : [static cache budget | chunk] — cached prefix masked by the
             *runtime* fill level cache_len, chunk part causal

Design points (see /opt/skills/guides/pallas_guide.md):
  * grid (kv_head, q_block, kv_block) with the kv axis innermost/sequential;
    online-softmax state (m, l, acc) lives in VMEM scratch across kv steps.
  * **dead-block skipping**: cache blocks beyond ``cache_len`` and chunk
    blocks above the causal diagonal are skipped — their index_map points at
    block 0 (Pallas elides the re-DMA of a repeated block) and ``pl.when``
    skips the compute, so attention cost tracks the actual cache fill level,
    not the budget. This is what lets one compiled program serve every fill
    level at reference-like FLOPs, where the XLA fallback pays for the whole
    budget every chunk.
  * the DMA/grid block (BK, large: few grid steps, low dead-step overhead)
    is decoupled from the compute tile (SUB_K: bounds the [G*BQ, SUB_K] fp32
    logit/prob temporaries to fit the 16 MB VMEM). Queries and chunk keys pad
    independently (block_q | block_k).
  * GQA: the G query heads of one KV head are flattened into the row axis of
    a single [G*BQ, SUB_K] MXU matmul.
  * bf16 matmul inputs, fp32 logits/softmax state (flash-attn numerics).

PivotKV eviction scoring deliberately lives in its own kernel
(ops/pallas/pivot_scores.py): under ``pos_embed_reforge`` the scoring inputs
are de-rotated, so no matmul is shared with this pass, and the scoring
softmax normalizes differently (non-causal, chunk keys only) — an in-kernel
fusion measured ~2x slower than the standalone single-pass kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BQ = 256
# 2048 measured marginally faster at low fill but its k/v double-buffering
# pushes the 16 MB VMEM budget over the edge at very large cache budgets
# (the naive full-cache baseline arm, ~158k tokens)
DEFAULT_BK = 1024
# compute tile width within a DMA block: bounds the [G*BQ, SUB_K] fp32
# logit/prob temporaries to ~3.5 MB of VMEM while the grid/DMA block (BK)
# stays large — fewer grid steps means less dead-step overhead at low cache
# fill levels
SUB_K = 512


def _kernel(
    scalar_ref,  # SMEM [2]: cache_len, valid_len
    q_ref,  # [1, G, BQ, D]
    k_ref,  # [1, BK, D] (bf16, or int8 in quantized-cache mode)
    v_ref,  # [1, BK, D]
    *refs,  # [ks_ref [1, BK, 1] f32, vs_ref [1, BK, 1] f32,] o_ref, scratch
    budget: int,
    bq: int,
    bk: int,
    num_kv_blocks: int,
    scale: float,
    quantized: bool = False,
):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        ks_ref = vs_ref = None
    j = pl.program_id(1)
    kb = pl.program_id(2)
    cache_len = scalar_ref[0]
    valid_len = scalar_ref[1]

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_start = kb * bk
    q_row_end = j * bq + bq - 1  # last chunk-token row in this q block
    in_cache_region = block_start < budget
    cache_live = in_cache_region & (block_start < cache_len)
    chunk_live = jnp.logical_not(in_cache_region) & (
        block_start - budget <= q_row_end
    )
    live = cache_live | chunk_live

    def _flash_update(s, v):
        m_prev = m_ref[:, :1]  # [rows, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rows, SUB] f32
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    sub_w = min(bk, SUB_K)
    nsub = bk // sub_w

    @pl.when(live)
    def _compute():
        g, _, d = q_ref.shape[1:]
        rows = g * bq
        q = q_ref[0].reshape(rows, d)
        for si in range(nsub):
            sub_start = block_start + si * sub_w
            sub_cache_live = in_cache_region & (sub_start < cache_len)
            sub_chunk_live = jnp.logical_not(in_cache_region) & (
                sub_start - budget <= q_row_end
            )
            # interior sub-tiles (fully below cache_len) skip masking: no
            # iota/compare/select on the VPU critical path
            sub_interior = in_cache_region & (
                sub_start + sub_w <= cache_len
            )

            @pl.when(sub_cache_live | sub_chunk_live)
            def _sub(si=si, sub_start=sub_start, sub_interior=sub_interior):
                k = k_ref[0, si * sub_w : (si + 1) * sub_w]  # [SUB, D]
                v = v_ref[0, si * sub_w : (si + 1) * sub_w]
                if ks_ref is not None:
                    # int8 cache: the DMA moved int8 (half the HBM traffic of
                    # the dominant cache reads); dequantize per key in VMEM —
                    # scales ride along as [1, BK, 1] sublane-aligned columns
                    sl = slice(si * sub_w, (si + 1) * sub_w)
                    k = (k.astype(jnp.float32) * ks_ref[0, sl]).astype(q.dtype)
                    v = (v.astype(jnp.float32) * vs_ref[0, sl]).astype(q.dtype)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [rows, SUB]

                @pl.when(sub_interior)
                def _unmasked():
                    _flash_update(s, v)

                @pl.when(jnp.logical_not(sub_interior))
                def _masked():
                    # mask depends only on (token row, col): compute
                    # [BQ, SUB] once, broadcast over the G grouped heads
                    col = sub_start + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, sub_w), 1
                    )
                    qi = j * bq + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, sub_w), 0
                    )
                    in_cache = (col < cache_len) & (col < budget)
                    cj = col - budget
                    in_chunk = (col >= budget) & (cj <= qi) & (
                        (cj < valid_len) | (cj == qi)
                    )
                    mask = in_cache | in_chunk  # [BQ, SUB]
                    s3 = s.reshape(g, bq, sub_w)
                    s3 = jnp.where(mask[None], s3, NEG_INF)
                    _flash_update(s3.reshape(rows, sub_w), v)

    @pl.when(kb == num_kv_blocks - 1)
    def _finish():
        g, _, d = q_ref.shape[1:]
        l = jnp.maximum(l_ref[:, :1], 1e-37)
        out = (acc_ref[:] / l).reshape(g, bq, d)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_prefill_attention(
    query: jax.Array,  # [H, S, D] RoPE'd chunk queries
    key_cache: jax.Array,  # [KV, budget, D] (bf16, or int8 + k_scale)
    value_cache: jax.Array,
    cache_len: jax.Array,  # scalar int32
    key_new: jax.Array,  # [KV, S, D]
    value_new: jax.Array,
    valid_len: jax.Array,  # scalar int32
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    k_scale=None,  # [KV, budget] f32 — int8-cache mode (kv_cache_dtype)
    v_scale=None,
    new_scales=None,  # ([KV, S], [KV, S]) f32 — key_new/value_new are
    #   ALREADY int8 with these scales (the caller's single rounding site)
) -> jax.Array:
    """Same contract as ops.attention.chunk_prefill_attention.

    int8-cache mode: k/v stream into VMEM as int8 (half the DMA traffic of
    the dominant cache reads), converting and scale-commuting in-core —
    the chunk's own keys/values are quantized so one code path covers the
    whole [cache | chunk] span. The layer passes them pre-quantized via
    ``new_scales`` and reuses the same int8 blocks for the cache append
    (single rounding site, see text._layer); quantize here only when the
    caller sent bf16.
    """
    num_heads, s, d = query.shape
    num_kv, budget, _ = key_cache.shape
    g = num_heads // num_kv
    quantized = k_scale is not None
    # shrink blocks for small shapes (tiny-model tests); production budgets
    # are multiples of 8192, so the defaults are used unchanged there
    block_k = math.gcd(budget, block_k)
    block_q = min(block_q, -(-s // 8) * 8)
    # cap the flattened GQA row count so the [G*BQ, SUB_K] fp32 logit/prob
    # temporaries fit the 16 MB VMEM budget (7B: G=7 -> BQ 128)
    while g * block_q > 1536 and block_q > 128:
        block_q //= 2
    assert budget % block_k == 0, (budget, block_k)

    # queries pad to block_q, chunk keys pad to block_k — independently, so a
    # large block_k does not inflate the query-row count
    s_pad_q = -(-s // block_q) * block_q
    s_pad_k = -(-s // block_k) * block_k
    q = query.reshape(num_kv, g, s, d)
    if s_pad_q != s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad_q - s), (0, 0)))
    if quantized:
        if new_scales is not None:  # caller already quantized (single site)
            kn_scale, vn_scale = new_scales
        else:  # quantize the fresh chunk keys/values to match the cache
            from retake_tpu.ops.quantization import quantize_kv_block

            key_new, kn_scale = quantize_kv_block(key_new)
            value_new, vn_scale = quantize_kv_block(value_new)
    if s_pad_k != s:
        key_new = jnp.pad(key_new, ((0, 0), (0, s_pad_k - s), (0, 0)))
        value_new = jnp.pad(value_new, ((0, 0), (0, s_pad_k - s), (0, 0)))
        if quantized:
            kn_scale = jnp.pad(kn_scale, ((0, 0), (0, s_pad_k - s)))
            vn_scale = jnp.pad(vn_scale, ((0, 0), (0, s_pad_k - s)))
    k_all = jnp.concatenate([key_cache, key_new], axis=1)
    v_all = jnp.concatenate([value_cache, value_new], axis=1)
    if quantized:
        ks_all = jnp.concatenate([k_scale, kn_scale], axis=1)
        vs_all = jnp.concatenate([v_scale, vn_scale], axis=1)
    total = budget + s_pad_k
    num_q_blocks = s_pad_q // block_q
    num_kv_blocks = total // block_k

    def q_index(i, j, kb, scalars):
        return (i, 0, j, 0)

    def kv_index(i, j, kb, scalars):
        cache_len = scalars[0]
        block_start = kb * block_k
        in_cache = block_start < budget
        cache_live = in_cache & (block_start < cache_len)
        chunk_live = jnp.logical_not(in_cache) & (
            block_start - budget <= j * block_q + block_q - 1
        )
        # dead blocks alias block 0: repeated index -> Pallas skips the DMA
        return (i, jnp.where(cache_live | chunk_live, kb, 0), 0)

    def o_index(i, j, kb, scalars):
        return (i, 0, j, 0)

    def kvs_index(i, j, kb, scalars):
        idx = kv_index(i, j, kb, scalars)
        # scales as [KV, total, 1]: a (1, BK, 1) block keeps the last two
        # dims Mosaic-legal (BK%8==0, trailing dim == array dim)
        return (idx[0], idx[1], 0)

    in_specs = [
        pl.BlockSpec((1, g, block_q, d), q_index),
        pl.BlockSpec((1, block_k, d), kv_index),
        pl.BlockSpec((1, block_k, d), kv_index),
    ]
    inputs = [q, k_all, v_all]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, block_k, 1), kvs_index),
            pl.BlockSpec((1, block_k, 1), kvs_index),
        ]
        inputs += [ks_all[..., None], vs_all[..., None]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_kv, num_q_blocks, num_kv_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g, block_q, d), o_index),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, d), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel,
        budget=budget,
        bq=block_q,
        bk=block_k,
        num_kv_blocks=num_kv_blocks,
        scale=float(1.0 / (d**0.5)),
        quantized=quantized,
    )
    scalars = jnp.stack(
        [cache_len.astype(jnp.int32), valid_len.astype(jnp.int32)]
    )
    kv_bytes = 1 if quantized else 2
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_kv, g, s_pad_q, d), query.dtype),
        interpret=jax.default_backend() == "cpu",  # CPU tests / dryruns
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * s_pad_q * total * d * num_heads,
            bytes_accessed=(
                total * d * kv_bytes * 2 * num_kv
                + s_pad_q * d * num_heads * 2
            ),
            transcendentals=s_pad_q * total * num_heads,
        ),
    )(scalars, *inputs)
    return out.reshape(num_heads, s_pad_q, d)[:, :s]
