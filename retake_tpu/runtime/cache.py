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
    # int8 KV mode (config ``kv_cache_dtype: int8``): k/v are int8 and these
    # hold the per-(layer, kv_head, token) symmetric scales [L, KV, budget]
    # f32. The scales commute with the attention contractions —
    # logits = (q @ k_q^T) * s_k and out = (p * s_v) @ v_q — so attention
    # never materializes a dequantized cache; HBM at rest AND the
    # decode-critical cache reads halve. None = bf16 mode.
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @property
    def budget(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    num_layers: int,
    num_kv_heads: int,
    budget: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    shape = (num_layers, num_kv_heads, budget, head_dim)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            pos=jnp.zeros((num_layers, 3, budget), jnp.int32),
            length=jnp.int32(0),
            k_scale=jnp.zeros(shape[:3], jnp.float32),
            v_scale=jnp.zeros(shape[:3], jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        pos=jnp.zeros((num_layers, 3, budget), jnp.int32),
        length=jnp.int32(0),
    )


from retake_tpu.ops.quantization import quantize_kv_block  # noqa: E402


def append_blocks(
    cache: KVCache,
    k_blocks: jax.Array,  # [layers, kv_heads, S, head_dim] (bf16/f32; or
    v_blocks: jax.Array,  #   int8 when k_scales/v_scales are given)
    pos_blocks: jax.Array,  # [layers, 3, S]
    advance: jax.Array,  # scalar int32 — valid_len (text) or keep_len (video)
    k_scales: jax.Array | None = None,  # [layers, kv_heads, S] f32 — blocks
    v_scales: jax.Array | None = None,  #   already quantized by the caller
) -> KVCache:
    """Write chunk blocks at offset ``length`` for every layer, advance length.

    int8 mode quantizes the blocks per key on the way in, unless the caller
    passes pre-quantized blocks + scales (the Pallas prefill path quantizes
    once in the layer so attention and the append share ONE rounding site)."""
    off = cache.length
    if cache.quantized:
        if k_scales is not None:
            kq, ks, vq, vs = k_blocks, k_scales, v_blocks, v_scales
        else:
            kq, ks = quantize_kv_block(k_blocks)
            vq, vs = quantize_kv_block(v_blocks)
        return KVCache(
            k=jax.lax.dynamic_update_slice(cache.k, kq, (0, 0, off, 0)),
            v=jax.lax.dynamic_update_slice(cache.v, vq, (0, 0, off, 0)),
            pos=jax.lax.dynamic_update_slice(cache.pos, pos_blocks, (0, 0, off)),
            length=off + advance,
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks, (0, 0, off)),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs, (0, 0, off)),
        )
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
