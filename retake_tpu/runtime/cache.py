"""Static-budget KV cache for chunked prefill with PivotKV compression.

TPU-first replacement for the reference's ``PivotKVCache(DynamicCache)``
(retake/longvideo_cache.py:119-323), which grows/shrinks python lists of
tensors per layer. Here the cache is one fixed-shape pytree:

  k, v  : [layers, kv_heads, budget, head_dim]   rotated keys / values
  pos   : [layers, 3, budget] int32              per-layer position ids of the
                                                 cached tokens (positions differ
                                                 per layer after eviction; the
                                                 reference tracks this in
                                                 ``position_cache``)
  length: int32 scalar                           valid tokens — identical for
                                                 every layer because keep_len
                                                 depends only on (ratio, q_len)

Appends write a full chunk-sized block at offset ``length`` (kept tokens
compacted to the front); the garbage tail beyond the new length is overwritten
by the next append and masked out of attention. The budget grows in host-side
buckets so attention cost tracks the actual fill level while keeping the
number of compiled chunk-step variants small.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array
    v: jax.Array
    pos: jax.Array
    length: jax.Array

    @property
    def budget(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(
    num_layers: int,
    num_kv_heads: int,
    budget: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    return KVCache(
        k=jnp.zeros((num_layers, num_kv_heads, budget, head_dim), dtype),
        v=jnp.zeros((num_layers, num_kv_heads, budget, head_dim), dtype),
        pos=jnp.zeros((num_layers, 3, budget), jnp.int32),
        length=jnp.int32(0),
    )


def append_blocks(
    cache: KVCache,
    k_blocks: jax.Array,  # [layers, kv_heads, S, head_dim]
    v_blocks: jax.Array,
    pos_blocks: jax.Array,  # [layers, 3, S]
    advance: jax.Array,  # scalar int32 — valid_len (text) or keep_len (video)
) -> KVCache:
    """Write chunk blocks at offset ``length`` for every layer, advance length."""
    off = cache.length
    k = jax.lax.dynamic_update_slice(cache.k, k_blocks, (0, 0, off, 0))
    v = jax.lax.dynamic_update_slice(cache.v, v_blocks, (0, 0, off, 0))
    pos = jax.lax.dynamic_update_slice(cache.pos, pos_blocks, (0, 0, off))
    return KVCache(k=k, v=v, pos=pos, length=off + advance)


def bucket_budget(
    needed: int, min_budget: int = 4096, multiple: int = 2048
) -> int:
    """Smallest bucket >= needed: power-of-two-ish growth keeps the set of
    compiled chunk-step shapes small across requests."""
    b = max(min_budget, multiple)
    while b < needed:
        b *= 2
    return b
