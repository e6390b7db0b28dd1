"""Rotary position embeddings: 1-D RoPE, multimodal 3-D M-RoPE, and YaRN scaling.

Implements the exact positional math the ReTaKe reference relies on
(reference: retake/longvideo_cache.py:29-116 ``apply_multimodal_rotary_pos_emb`` /
``apply_rotary_pos_emb`` with ``reverse`` + ``attention_scaling`` semantics, and
retake/monkeypatch.py:24-34 YaRN config rewrite with beta_fast=32, beta_slow=1),
re-derived for JAX:

* Frequencies and angles are computed in float32; cos/sin are cast to the
  activation dtype before application (matches the HF rotary module numerics).
* ``reverse=True`` rotates by the negative angle and divides by
  ``attention_scaling**2``, exactly undoing a forward application whose cos/sin
  were premultiplied by ``attention_scaling`` (YaRN mscale).
* M-RoPE splits the head-dim channel halves into (temporal, height, width)
  sections given by ``mrope_section`` (Qwen2-VL: [16, 24, 24] for head_dim 128).

All functions are pure and shape-polymorphic over leading batch dims; nothing
here allocates parameters.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def default_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    """Standard RoPE inverse frequencies, float32 numpy, shape [head_dim // 2]."""
    return 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    ).astype(np.float32)


def yarn_inv_freq(
    head_dim: int,
    theta: float,
    factor: float,
    original_max_position_embeddings: int,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
) -> Tuple[np.ndarray, float]:
    """YaRN NTK-by-parts inverse frequencies + attention scaling factor.

    Mirrors the standard YaRN parameterization the reference enables through
    its config rewrite (retake/monkeypatch.py:26-31): low-frequency channels are
    position-interpolated by ``factor``, high-frequency channels extrapolate,
    with a linear ramp between correction dims derived from beta_fast/beta_slow.
    Returns (inv_freq [head_dim//2] float32, attention_scaling).
    """

    def correction_dim(num_rotations: float) -> float:
        return (
            head_dim
            * math.log(original_max_position_embeddings / (num_rotations * 2 * math.pi))
        ) / (2 * math.log(theta))

    low = max(math.floor(correction_dim(beta_fast)), 0)
    high = min(math.ceil(correction_dim(beta_slow)), head_dim - 1)
    if low == high:
        high += 0.001  # avoid singular ramp

    pos_freqs = theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    inv_extrapolation = 1.0 / pos_freqs
    inv_interpolation = 1.0 / (factor * pos_freqs)

    ramp = (np.arange(head_dim // 2, dtype=np.float32) - low) / (high - low)
    ramp = np.clip(ramp, 0.0, 1.0)
    extrapolation_factor = 1.0 - ramp

    inv_freq = (
        inv_interpolation * (1.0 - extrapolation_factor)
        + inv_extrapolation * extrapolation_factor
    ).astype(np.float32)

    attention_scaling = 1.0 if factor <= 1.0 else 0.1 * math.log(factor) + 1.0
    return inv_freq, float(attention_scaling)


def compute_cos_sin(
    inv_freq: jax.Array,
    position_ids: jax.Array,
    attention_scaling: float = 1.0,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Angle tables for given positions.

    position_ids: [..., seq] int — typically [3, B, S] (M-RoPE) or [B, S] (1-D).
    Returns cos, sin of shape [..., seq, head_dim] (the half-angles duplicated),
    premultiplied by ``attention_scaling`` and cast to ``dtype``.
    """
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq.astype(jnp.float32)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos = jnp.cos(emb) * attention_scaling
    sin = jnp.sin(emb) * attention_scaling
    return cos.astype(dtype), sin.astype(dtype)


def select_mrope(table: jax.Array, mrope_section: Sequence[int]) -> jax.Array:
    """Combine a [3, ..., S, D] per-axis angle table into [..., S, D].

    Channel block i (of the 2x-repeated section list) is taken from axis
    ``i % 3`` — i.e. both rotary halves use the (t, h, w) section split.
    """
    sections = list(mrope_section) * 2
    pieces = []
    offset = 0
    for i, sec in enumerate(sections):
        pieces.append(table[i % 3, ..., offset : offset + sec])
        offset += sec
    return jnp.concatenate(pieces, axis=-1)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    reverse: bool = False,
    attention_scaling: float = 1.0,
) -> jax.Array:
    """Rotate ``x`` ([B, H, S, D]) by cos/sin ([B, S, D], broadcast over heads).

    ``reverse=True`` applies the inverse rotation and removes a squared
    attention-scaling factor, matching the reference's de-rotation used before
    PivotKV eviction scoring (longvideo_cache.py:76-78, 109-111).
    """
    cos = cos[..., None, :, :] if cos.ndim == x.ndim - 1 else cos
    sin = sin[..., None, :, :] if sin.ndim == x.ndim - 1 else sin
    if reverse:
        return ((x * cos) - (rotate_half(x) * sin)) / (attention_scaling**2)
    return (x * cos) + (rotate_half(x) * sin)


def mrope_cos_sin(
    inv_freq: jax.Array,
    position_ids: jax.Array,  # [3, B, S]
    mrope_section: Sequence[int],
    attention_scaling: float = 1.0,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin [B, S, D] with the M-RoPE section mix applied."""
    cos3, sin3 = compute_cos_sin(inv_freq, position_ids, attention_scaling, dtype)
    return select_mrope(cos3, mrope_section), select_mrope(sin3, mrope_section)


@partial(jax.jit, static_argnames=("mrope_section", "reverse", "attention_scaling"))
def apply_multimodal_rope(
    q: jax.Array | None,
    k: jax.Array | None,
    cos3: jax.Array,
    sin3: jax.Array,
    mrope_section: Tuple[int, ...],
    reverse: bool = False,
    attention_scaling: float = 1.0,
) -> Tuple[jax.Array | None, jax.Array | None]:
    """M-RoPE application to q/k [B, H, S, D] given per-axis tables [3, B, S, D]."""
    cos = select_mrope(cos3, mrope_section)
    sin = select_mrope(sin3, mrope_section)
    q_out = None if q is None else apply_rope(q, cos, sin, reverse, attention_scaling)
    k_out = None if k is None else apply_rope(k, cos, sin, reverse, attention_scaling)
    return q_out, k_out
