"""PivotKV eviction math: attention-mass scoring and masked top-k compaction.

Behavioral spec from the reference's ``PivotKVCache.update``
(retake/longvideo_cache.py:217-323), re-designed for static XLA shapes:

The reference evicts by *shrinking* tensors (gather of ``keep_len`` rows).
On TPU we instead compute a **compaction permutation** over the fixed-size
chunk: kept token indices (ascending) first, evicted after. The caller writes
the full permuted block into the static cache buffer at the running offset and
advances the valid length by ``keep_len`` — the garbage tail is overwritten by
the next chunk and masked out of attention, so no dynamic shapes ever appear.

``keep_len`` stays a *traced scalar*: one compiled chunk step serves every
request regardless of its dynamic compression ratio.

Scoring parity notes (longvideo_cache.py:263-276):
  * scores = softmax(QK^T / sqrt(d)) in float32, non-causal, chunk-local keys
    only; summed over queries, mean over per-KV-head query-head groups, then
    mean over KV heads.
  * keypatch (DPSelect peak) tokens are force-boosted to score exactly 1.0.
  * top-k ties resolve toward lower indices (stable sort), matching torch.
  * invalid (padding) tokens get -inf and can never be kept while
    keep_len <= number of valid tokens.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def eviction_scores(
    query: jax.Array,  # [num_heads, S, D]  (RoPE'd, or de-rotated if reforge)
    key: jax.Array,  # [num_kv_heads, S, D]
    valid_mask: jax.Array,  # [S] bool — True for real (non-padding) tokens
    keypatch_mask: jax.Array | None,  # [S] bool or None
) -> jax.Array:
    """Per-key attention-mass scores, float32 [S]; padding keys get -inf."""
    num_heads, s, head_dim = query.shape
    num_kv_heads = key.shape[0]
    group = num_heads // num_kv_heads

    # [kv, group, S, S]: logits of every query against every chunk key.
    # Parity: the reference scores with a bf16 QK^T matmul (fp32 accumulation)
    # then an fp32 softmax (longvideo_cache.py:264-267). bf16 inputs map to
    # the native MXU bf16 matmul; fp32 inputs (unit tests vs torch oracles)
    # force a true fp32 matmul so tolerances stay tight.
    precision = (
        jax.lax.Precision.HIGHEST
        if query.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    logits = jnp.einsum(
        "kgsd,ktd->kgst",
        query.reshape(num_kv_heads, group, s, head_dim),
        key,
        precision=precision,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(head_dim))
    logits = jnp.where(valid_mask[None, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # zero out padding queries before summing attention mass over queries
    probs = jnp.where(valid_mask[None, None, :, None], probs, 0.0)
    scores = probs.sum(axis=2)  # [kv, group, S] — sum over queries
    scores = scores.mean(axis=1).mean(axis=0)  # [S]

    if keypatch_mask is not None:
        scores = jnp.where(keypatch_mask, 1.0, scores)
    return jnp.where(valid_mask, scores, NEG_INF)


def keep_partition(
    scores: jax.Array,  # [S] float32
    keep_len: jax.Array,  # scalar int32 (traced)
) -> Tuple[jax.Array, jax.Array]:
    """Compaction permutation for eviction.

    Returns (perm [S] int32, kept_mask [S] bool) where ``perm`` lists the
    indices of the top-``keep_len`` scoring tokens in ascending index order,
    followed by the evicted indices; ``kept_mask[i] = perm position i holds a
    kept token`` (i.e. simply ``arange(S) < keep_len``).
    """
    s = scores.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)
    order = jnp.argsort(-scores, stable=True)  # rank -> index, ties: low index
    # index -> rank via scatter (cheaper than a second sort)
    rank = jnp.zeros(s, jnp.int32).at[order].set(idx, unique_indices=True)
    kept = rank < keep_len  # [S] per original index
    # kept tokens first (by original index), then evicted (by original index)
    sort_key = jnp.where(kept, idx, idx + s)
    perm = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
    kept_mask = idx < keep_len
    return perm, kept_mask


def rescale_temporal_positions(
    temporal_pos: jax.Array,  # [S] int32 — perm-gathered temporal position ids
    kept_mask: jax.Array,  # [S] bool — first keep_len entries are kept tokens
    keep_len: jax.Array,  # scalar int32
    chunk_len: jax.Array,  # scalar int32 — number of *valid* chunk tokens (k_len)
) -> jax.Array:
    """Squash kept temporal ids to a contiguous range (pos_embed_reforge).

    Parity with longvideo_cache.py:290-295: new_t = min_t +
    trunc((t - min_t) * keep_len / k_len), computed in float32 with the exact
    keep_len/k_len ratio (NOT the configured compression ratio).
    Entries outside ``kept_mask`` are passed through unchanged (they are
    garbage slots the cache never reads).
    """
    big = jnp.int32(2**30)
    min_t = jnp.min(jnp.where(kept_mask, temporal_pos, big))
    ratio = keep_len.astype(jnp.float32) / chunk_len.astype(jnp.float32)
    scaled = (
        min_t
        + ((temporal_pos - min_t).astype(jnp.float32) * ratio).astype(jnp.int32)
    )
    return jnp.where(kept_mask, scaled, temporal_pos)


def dynamic_compression_ratio(
    input_length: int, max_input_length: int
) -> float:
    """Reference's dynamic ratio rule (qwen2_vl.py:550-557): cap the prefill
    KV footprint at ``max_input_length`` tokens."""
    if input_length <= max_input_length:
        return 1.0
    return max_input_length / input_length


def keep_len_for_chunk(ratio: float, chunk_valid_len) -> jax.Array:
    """keep_len = max(1, int(ratio * q_len)) — truncation, not rounding
    (longvideo_cache.py:263). Works on traced or concrete ``chunk_valid_len``."""
    if isinstance(chunk_valid_len, int):
        return max(1, int(ratio * chunk_valid_len))
    kl = (jnp.float32(ratio) * chunk_valid_len.astype(jnp.float32)).astype(jnp.int32)
    return jnp.maximum(1, kl)
