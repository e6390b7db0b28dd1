"""Attention primitives for the chunked-prefill runtime (XLA path).

Replaces the reference's flash-attn / SDPA CUDA kernels
(retake/qwen2_vl.py:224-363, 125-221) with XLA-compiled GQA attention over a
*static* KV-cache buffer: key/value tensors always have the full budget shape
and validity is enforced with masks, so one compiled program serves every
cache fill level. The engine grows the budget in buckets to keep the masked
waste bounded; the Pallas kernel in ops/pallas/ further skips dead cache
blocks entirely.

Numerics: logits and softmax in float32 (matching flash-attn's fp32
accumulators), inputs/outputs in the activation dtype (bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def gqa_attention(
    query: jax.Array,  # [num_heads, S, D]
    key: jax.Array,  # [num_kv_heads, T, D]
    value: jax.Array,  # [num_kv_heads, T, D]
    mask: jax.Array,  # [S, T] bool — True = attend
) -> jax.Array:
    """Grouped-query attention with fp32 softmax. Returns [num_heads, S, D]."""
    num_heads, s, head_dim = query.shape
    num_kv_heads, t, _ = key.shape
    group = num_heads // num_kv_heads

    q = query.reshape(num_kv_heads, group, s, head_dim)
    logits = jnp.einsum(
        "kgsd,ktd->kgst", q, key, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(head_dim))
    logits = jnp.where(mask[None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "kgst,ktd->kgsd", probs.astype(value.dtype), value,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(num_heads, s, head_dim).astype(query.dtype)


def chunk_prefill_mask(
    budget: int,
    chunk_len: int,
    cache_len: jax.Array,  # scalar int32 — valid tokens in the cache buffer
    valid_len: jax.Array,  # scalar int32 — valid (non-pad) tokens in the chunk
) -> jax.Array:
    """[chunk_len, budget + chunk_len] bool mask.

    Chunk query i attends to: all cached tokens < cache_len, plus chunk keys
    j <= i that are valid. Padding queries (i >= valid_len) keep a causal row
    so no softmax row is fully masked (their outputs are discarded).
    """
    qi = jnp.arange(chunk_len)[:, None]
    cache_cols = jnp.arange(budget)[None, :] < cache_len  # [1, budget]
    cache_part = jnp.broadcast_to(cache_cols, (chunk_len, budget))
    kj = jnp.arange(chunk_len)[None, :]
    chunk_part = (kj <= qi) & ((kj < valid_len) | (kj == qi))
    return jnp.concatenate([cache_part, chunk_part], axis=1)


def dequantize_cache(cache_part: jax.Array, scale, dtype):
    """int8 cache slice [.., S, D] + scale [.., S] -> ``dtype`` (fallback
    paths; the perf paths commute the scales instead)."""
    if scale is None:
        return cache_part
    return (cache_part.astype(jnp.float32) * scale[..., None]).astype(dtype)


def chunk_prefill_attention(
    query: jax.Array,  # [H, S, D] RoPE'd chunk queries
    key_cache: jax.Array,  # [KV, budget, D]
    value_cache: jax.Array,  # [KV, budget, D]
    cache_len: jax.Array,  # scalar int32
    key_new: jax.Array,  # [KV, S, D] RoPE'd chunk keys
    value_new: jax.Array,  # [KV, S, D]
    valid_len: jax.Array,  # scalar int32
    k_scale=None,  # [KV, budget] f32 (int8 cache mode)
    v_scale=None,
) -> jax.Array:
    """Attention for one prefill chunk: cached prefix + causal self block."""
    budget = key_cache.shape[1]
    s = query.shape[1]
    key_cache = dequantize_cache(key_cache, k_scale, query.dtype)
    value_cache = dequantize_cache(value_cache, v_scale, query.dtype)
    k = jnp.concatenate([key_cache, key_new], axis=1)
    v = jnp.concatenate([value_cache, value_new], axis=1)
    mask = chunk_prefill_mask(budget, s, cache_len, valid_len)
    return gqa_attention(query, k, v, mask)


def flash_chunk_attention(
    query: jax.Array,  # [H, S, D] RoPE'd chunk queries
    key_cache: jax.Array,  # [KV, budget, D]
    value_cache: jax.Array,
    cache_len: jax.Array,  # scalar int32
    key_new: jax.Array,  # [KV, S, D]
    value_new: jax.Array,
    valid_len: jax.Array,  # scalar int32
    block_size: int = 1024,
    k_scale=None,  # [KV, budget] f32 (int8 cache mode)
    v_scale=None,
) -> jax.Array:
    """Online-softmax (flash) chunk attention scanned over KV blocks.

    Exact same masking semantics as ``chunk_prefill_attention`` but with
    O(block) memory instead of materializing the full probability matrix —
    required for large cache budgets (naive full-cache baseline holds ~150k
    keys at 2048 frames). fp32 running max / sum / accumulator.
    """
    num_heads, s, head_dim = query.shape
    num_kv_heads, budget, _ = key_cache.shape
    group = num_heads // num_kv_heads

    # keep matmul inputs in the activation dtype (bf16 on the MXU, fp32
    # accumulation via preferred_element_type) — flash-attn-equivalent
    # numerics; the online-softmax state (m, l, acc) stays fp32.
    # Blocks are dynamic-sliced out of the original buffers inside the scan:
    # concatenate/pad/transpose staging would copy the whole multi-GB cache
    # once per layer per chunk.
    q = query.reshape(num_kv_heads, group, s, head_dim)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    qi = jnp.arange(s)[:, None]  # query row index within the chunk

    def phase(k_src, v_src, block, mask_fn, carry, ks_src=None, vs_src=None):
        total = k_src.shape[1]
        block = min(block, total)
        num_blocks = -(-total // block)

        def body(carry, start):
            m, l, acc = carry
            # tail blocks clamp left; re-covered columns are masked out below
            cstart = jnp.minimum(start, total - block)
            kb = jax.lax.dynamic_slice(
                k_src, (0, cstart, 0), (num_kv_heads, block, head_dim)
            )
            vb = jax.lax.dynamic_slice(
                v_src, (0, cstart, 0), (num_kv_heads, block, head_dim)
            )
            if ks_src is not None:  # int8 cache: dequantize the block
                ks = jax.lax.dynamic_slice(
                    ks_src, (0, cstart), (num_kv_heads, block)
                )
                vs = jax.lax.dynamic_slice(
                    vs_src, (0, cstart), (num_kv_heads, block)
                )
                kb = dequantize_cache(kb, ks, query.dtype)
                vb = dequantize_cache(vb, vs, query.dtype)
            col = cstart + jnp.arange(block)[None, :]
            mask = mask_fn(col) & (col >= start)  # [S or 1, B]
            logits = (
                jnp.einsum(
                    "kgsd,kbd->kgsb", q, kb, preferred_element_type=jnp.float32
                )
                * scale
            )
            logits = jnp.where(mask[None, None], logits, NEG_INF)
            m_new = jnp.maximum(m, logits.max(axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_new = l * alpha + p.sum(axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "kgsb,kbd->kgsd", p.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc_new), None

        starts = jnp.arange(num_blocks) * block
        carry, _ = jax.lax.scan(body, carry, starts)
        return carry

    carry = (
        jnp.full((num_kv_heads, group, s), NEG_INF, jnp.float32),
        jnp.zeros((num_kv_heads, group, s), jnp.float32),
        jnp.zeros((num_kv_heads, group, s, head_dim), jnp.float32),
    )
    # phase 1: cached prefix, masked by fill level
    carry = phase(
        key_cache, value_cache, block_size,
        lambda col: col < cache_len,
        carry, k_scale, v_scale,
    )
    # phase 2: the chunk's own keys, causal
    m, l, acc = phase(
        key_new, value_new, block_size,
        lambda col: (col <= qi) & ((col < valid_len) | (col == qi)),
        carry,
    )
    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return out.reshape(num_heads, s, head_dim).astype(query.dtype)


def decode_attention(
    query: jax.Array,  # [H, 1, D]
    key_cache: jax.Array,  # [KV, budget, D] (new token already appended)
    value_cache: jax.Array,
    cache_len: jax.Array,  # scalar int32 — length INCLUDING the new token
) -> jax.Array:
    budget = key_cache.shape[1]
    mask = (jnp.arange(budget) < cache_len)[None, :]  # [1, budget]
    return gqa_attention(query, key_cache, value_cache, mask)


def decode_attention_batch_gapped(
    query: jax.Array,  # [B, H, D]
    key_cache: jax.Array,  # [B, KV, S, D]
    value_cache: jax.Array,  # [B, KV, S, D]
    final_len: jax.Array,  # [B] int32 — valid prefill tokens per request
    gap_start: jax.Array,  # scalar int32 — batch-uniform decode-region base
    gap_filled: jax.Array,  # scalar int32 — decode tokens already written
    key_new: jax.Array,  # [B, KV, D] the current token's key
    value_new: jax.Array,  # [B, KV, D]
    k_scale=None,  # [B, KV, S] f32 (int8 cache mode; scales commute)
    v_scale=None,
    dec_start=None,  # [B] int32 — per-slot decode-region start (continuous
    #   batching: a request admitted at global step t0 owns
    #   [gap_start + t0, write ptr)); None = gap_start for every slot
    layer=None,  # scalar int32 — set when the caches are the FULL stacked
    #   [L, B, KV, S, D] arrays: the pallas kernel then indexes the layer
    #   via scalar prefetch instead of consuming a per-layer slice operand
    #   (which XLA would have to MATERIALIZE — Mosaic calls can't fuse a
    #   dynamic-slice producer; ~2 x 172 MB of HBM copies per layer at
    #   serving shapes, more than the attention itself)
    impl: str = "xla",  # "pallas"/"flash": dead-block-skipping kernel
    #   (ops/pallas/decode_gapped.py) — HBM reads track the LIVE regions
    #   instead of B x bucket; "xla": full-bucket masked einsum. With a
    #   2048-aligned bucket and the kernel's row-aligned block choice
    #   (num_kb on the fp32 sublane tile for the int8 scale planes) the
    #   kernel wins IN THE SERVING SCAN (tools/serve_decode_bisect.py,
    #   on-chip 2026-08-20): bf16 B=8 9.1 vs 17.4 ms/decode-step, int8
    #   B=8 8.0 vs 11.4; ~1.0x on uniform bucket-grouped batches (the
    #   eval decode_batch path stays einsum for token-exactness). int8
    #   uses the same commuting-scale math as the einsum: scales land on
    #   the [ROWS, BK] score/prob rows, lane-major scale DMA. An earlier
    #   whole-block-dequant int8 variant was 2-4x slower — see the kernel
    #   docstring.
) -> jax.Array:
    """Batched single-token attention over gap-layout caches.

    Batched serving writes every request's decode tokens at the SAME slot
    ``gap_start + step`` (gap_start = max prefill length in the batch) so
    the per-step KV append is one shared-offset dynamic_update_slice — a
    vmapped append with per-request offsets lowers to a scatter that
    rewrites the whole multi-GB batched cache every step (measured 5.8 of
    13.2 ms/step at B=8). Valid keys are therefore two regions:
    ``[0, final_len[b])`` (prefill, compacted) and
    ``[dec_start[b], gap_start + gap_filled)`` (decode); the hole in
    between is masked. Under continuous batching a slot admitted mid-run
    starts its decode region at the then-current write pointer
    (``dec_start``), so earlier steps' tokens — which belong to whatever
    request previously held the slot — stay masked. The current token's
    contribution merges append-free exactly as in
    ``decode_attention_appendfree``.
    """
    b, num_heads, head_dim = query.shape
    num_kv, s = key_cache.shape[-3], key_cache.shape[-2]
    group = num_heads // num_kv
    q = query.reshape(b, num_kv, group, head_dim)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))

    if impl in ("pallas", "flash"):
        from retake_tpu.ops.pallas.decode_gapped import (
            decode_gapped_flash_state,
        )

        dec0 = (
            jnp.broadcast_to(gap_start, final_len.shape)
            if dec_start is None else dec_start
        )
        acc, m, l = decode_gapped_flash_state(
            q, key_cache, value_cache, final_len, dec0,
            gap_start + gap_filled, k_scale, v_scale, layer=layer,
        )  # acc [B,KV,G,D] f32 (unnormalized), m/l [B,KV,G]
        logit_s = jnp.einsum(
            "bkgd,bkd->bkg", q, key_new, preferred_element_type=jnp.float32
        ) * scale
        m2 = jnp.maximum(m, logit_s)
        w_acc = jnp.exp(m - m2)[..., None]
        w_s = jnp.exp(logit_s - m2)[..., None]
        out = (acc * w_acc + w_s * value_new[:, :, None, :].astype(
            jnp.float32)) / (l[..., None] * w_acc + w_s)
        return out.reshape(b, num_heads, head_dim).astype(query.dtype)

    if layer is not None:  # xla arm of a stacked call (parity tests)
        key_cache = key_cache[layer]
        value_cache = value_cache[layer]
        if k_scale is not None:
            k_scale, v_scale = k_scale[layer], v_scale[layer]
    idx = jnp.arange(s)[None, :]
    dec0 = (
        jnp.broadcast_to(gap_start, final_len.shape)
        if dec_start is None else dec_start
    )
    valid = (idx < final_len[:, None]) | (
        (idx >= dec0[:, None]) & (idx < gap_start + gap_filled)
    )  # [B, S]
    logits_c = jnp.einsum(
        "bkgd,bktd->bkgt", q, key_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        logits_c = logits_c * k_scale[:, :, None, :]
    logits_c = jnp.where(valid[:, None, None, :], logits_c, NEG_INF)
    logit_s = jnp.einsum(
        "bkgd,bkd->bkg", q, key_new, preferred_element_type=jnp.float32
    )[..., None] * scale

    m = jnp.maximum(logits_c.max(axis=-1, keepdims=True), logit_s)
    p_c = jnp.exp(logits_c - m)
    p_s = jnp.exp(logit_s - m)
    denom = p_c.sum(axis=-1, keepdims=True) + p_s
    if v_scale is not None:
        p_c = p_c * v_scale[:, :, None, :]
    out = (
        jnp.einsum(
            "bkgt,bktd->bkgd", p_c.astype(query.dtype),
            value_cache.astype(query.dtype),
            preferred_element_type=jnp.float32,
        )
        + p_s.astype(jnp.float32) * value_new[:, :, None, :]
    ) / denom
    return out.reshape(b, num_heads, head_dim).astype(query.dtype)


def decode_attention_appendfree(
    query: jax.Array,  # [H, 1, D]
    key_cache: jax.Array,  # [KV, budget, D] (new token NOT yet appended)
    value_cache: jax.Array,
    cache_len: jax.Array,  # scalar int32 — valid cached tokens
    key_new: jax.Array,  # [KV, 1, D] the current token's key
    value_new: jax.Array,
    k_scale=None,  # [KV, budget] f32 (int8 cache mode)
    v_scale=None,
) -> jax.Array:
    """Single-token attention without copying the cache.

    ``concatenate([cache, new])`` rewrites the whole multi-GB cache buffer
    every decode step; here the new token's logit/value contribution is
    computed separately and merged into one softmax — HBM traffic drops to a
    single read of the valid cache region. With an int8 cache the per-key
    scales COMMUTE with both contractions (``(q @ k_q) * s_k`` and
    ``(p * s_v) @ v_q``), so the int8 tensors stream straight into the dots
    — the dequantized cache is never materialized and the decode-critical
    cache reads halve.
    """
    num_heads, _, head_dim = query.shape
    num_kv, budget, _ = key_cache.shape
    group = num_heads // num_kv
    q = query.reshape(num_kv, group, head_dim)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))

    logits_c = jnp.einsum(
        "kgd,ktd->kgt", q, key_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale  # [KV, G, budget]
    if k_scale is not None:
        logits_c = logits_c * k_scale[:, None, :]
    logits_c = jnp.where(
        (jnp.arange(budget) < cache_len)[None, None, :], logits_c, NEG_INF
    )
    logit_s = jnp.einsum(
        "kgd,kd->kg", q, key_new[:, 0], preferred_element_type=jnp.float32
    )[..., None] * scale  # [KV, G, 1]

    m = jnp.maximum(logits_c.max(axis=-1, keepdims=True), logit_s)
    p_c = jnp.exp(logits_c - m)
    p_s = jnp.exp(logit_s - m)
    denom = p_c.sum(axis=-1, keepdims=True) + p_s
    if v_scale is not None:
        p_c = p_c * v_scale[:, None, :]
    out = (
        jnp.einsum(
            "kgt,ktd->kgd", p_c.astype(query.dtype),
            value_cache.astype(query.dtype),
            preferred_element_type=jnp.float32,
        )
        + p_s.astype(jnp.float32) * value_new[:, 0][:, None, :]
    ) / denom
    return out.reshape(num_heads, 1, head_dim).astype(query.dtype)
