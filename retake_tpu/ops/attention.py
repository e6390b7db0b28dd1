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


def chunk_prefill_attention(
    query: jax.Array,  # [H, S, D] RoPE'd chunk queries
    key_cache: jax.Array,  # [KV, budget, D]
    value_cache: jax.Array,  # [KV, budget, D]
    cache_len: jax.Array,  # scalar int32
    key_new: jax.Array,  # [KV, S, D] RoPE'd chunk keys
    value_new: jax.Array,  # [KV, S, D]
    valid_len: jax.Array,  # scalar int32
) -> jax.Array:
    """Attention for one prefill chunk: cached prefix + causal self block."""
    budget = key_cache.shape[1]
    s = query.shape[1]
    k = jnp.concatenate([key_cache, key_new], axis=1)
    v = jnp.concatenate([value_cache, value_new], axis=1)
    mask = chunk_prefill_mask(budget, s, cache_len, valid_len)
    return gqa_attention(query, k, v, mask)


def decode_attention(
    query: jax.Array,  # [H, 1, D]
    key_cache: jax.Array,  # [KV, budget, D] (new token already appended)
    value_cache: jax.Array,
    cache_len: jax.Array,  # scalar int32 — length INCLUDING the new token
) -> jax.Array:
    budget = key_cache.shape[1]
    mask = (jnp.arange(budget) < cache_len)[None, :]  # [1, budget]
    return gqa_attention(query, key_cache, value_cache, mask)
