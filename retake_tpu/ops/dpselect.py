"""DPSelect keyframe selection and memory-bank compression baselines.

Re-implements, TPU-first, the frame-level visual compression family of the
ReTaKe reference (behavioral spec: retake/visual_compression.py:5-176):

* ``dpselect``      — "Keyframe" method: 1 - cosine similarity between adjacent
                      frames -> dissimilarity curve -> local peaks (argrelmax
                      with window 3) -> peaks boosted by +2 -> top-k frames.
                      Returns the kept frame indices (sorted ascending) and a
                      boolean mask of which kept frames are true peaks
                      ("keypatches", force-retained later by PivotKV).
* ``malm_compress``  — MA-LLM: iteratively merge the most-similar adjacent
                      frame pair by running weighted average until the target
                      length is reached.
* ``malm_hard_compress`` — MA-LLM-hard: same pair selection, but the source
                      frame overwrites the destination instead of averaging.

TPU notes: peak detection is pure elementwise/shift compares (VPU) instead of
the reference's max_pool1d argrelmax (which needed a CPU fallback on NPUs);
everything is static-shape given (T, N, C) and a static target length, so the
whole selection jit-compiles into the vision-tower program.

Tie-breaking parity: a frame i is a peak iff dis[i-1] < dis[i] and
dis[i] >= dis[i+1] (first-index argmax semantics of max_pool1d_with_indices);
top-k breaks ties toward lower frame indices, matching torch.topk.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8  # torch F.cosine_similarity default eps


def _adjacent_dissimilarity(memory_bank: jax.Array) -> jax.Array:
    """dis[t, n] = 1 - cos(bank[t-1, n], bank[t, n]); dis[0, :] = 1.

    memory_bank: [T, N, C]; returns float32 [T, N].
    """
    x = memory_bank[:-1].astype(jnp.float32)
    y = memory_bank[1:].astype(jnp.float32)
    dot = jnp.sum(x * y, axis=-1)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=-1), _EPS)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=-1), _EPS)
    sim = dot / (nx * ny)
    dis = 1.0 - sim
    return jnp.concatenate([jnp.ones_like(dis[:1]), dis], axis=0)


def _local_peaks(dis: jax.Array, window_size: int = 3) -> jax.Array:
    """Boolean peak mask along axis 0 with first-index-argmax tie-breaking.

    Position i is a peak iff it is the argmax of the window centered on it,
    where earlier positions win ties: all window elements left of i must be
    strictly smaller, all right of i at most equal.
    """
    half = window_size // 2
    t = dis.shape[0]
    idx = jnp.arange(t)
    peak = jnp.ones(dis.shape, dtype=bool)
    for off in range(1, half + 1):
        # left neighbor at i-off must be strictly smaller (or out of range)
        left = jnp.roll(dis, off, axis=0)
        left_valid = idx >= off
        lv = left_valid.reshape((-1,) + (1,) * (dis.ndim - 1))
        peak &= jnp.where(lv, left < dis, True)
        # right neighbor at i+off must be <= (or out of range)
        right = jnp.roll(dis, -off, axis=0)
        right_valid = idx < t - off
        rv = right_valid.reshape((-1,) + (1,) * (dis.ndim - 1))
        peak &= jnp.where(rv, right <= dis, True)
    return peak


@partial(jax.jit, static_argnames=("tgt_mem_len", "window_size", "sync"))
def dpselect(
    memory_bank: jax.Array,
    tgt_mem_len: int,
    window_size: int = 3,
    sync: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """DPSelect keyframe selection.

    Args:
      memory_bank: [T, N, C] per-frame patch embeddings (any float dtype).
      tgt_mem_len: number of frames to keep (static).
      window_size: odd peak-detection window (reference uses 3).
      sync: True -> pool dissimilarity over patches and select whole frames;
            False -> select independently per spatial patch.

    Returns (sync=True):
      keep_indices: [tgt_mem_len] int32, sorted ascending frame indices.
      keypatch_mask: [tgt_mem_len] bool, True where the kept frame is a peak.
    Returns (sync=False):
      keep_indices: [tgt_mem_len, N] per-patch frame indices (sorted per patch).
      keypatch_mask: [tgt_mem_len, N] bool.
    """
    dis = _adjacent_dissimilarity(memory_bank)  # [T, N] f32
    if sync:
        dis = dis.mean(axis=1)  # [T]
    peaks = _local_peaks(dis, window_size)
    boosted = dis + jnp.where(peaks, 2.0, 0.0)
    # top-k over frames (axis 0), ties -> lower index, then sort ascending
    _, top_idx = jax.lax.top_k(
        jnp.moveaxis(boosted, 0, -1), tgt_mem_len
    )  # [..., k] — [k] if sync else [N, k]
    keep = jnp.sort(top_idx, axis=-1).astype(jnp.int32)
    if sync:
        return keep, peaks[keep]
    keep = keep.T  # [k, N]
    mask = jnp.take_along_axis(peaks, keep, axis=0)  # [k, N]
    return keep, mask


def gather_keyframes(
    memory_bank: jax.Array, keep_indices: jax.Array
) -> jax.Array:
    """Gather kept frames: [T, N, C] x [k] -> [k, N, C], or per-patch
    [T, N, C] x [k, N] -> [k, N, C]."""
    if keep_indices.ndim == 1:
        return memory_bank[keep_indices]
    return jnp.take_along_axis(memory_bank, keep_indices[..., None], axis=0)


def _merge_once(bank: jax.Array, sizes: jax.Array, sync: bool, hard: bool):
    """One MA-LLM merge step over a fixed-size buffer with an alive mask.

    bank: [T, N, C] running (weighted-sum-normalized) frame features.
    sizes: [T, N] float; 0 marks a dead (already-merged-away) frame.
    Finds the most-similar *adjacent-alive* pair (i, next_alive(i)) and merges
    the later frame into the earlier one (average weighted by sizes, or
    overwrite for hard mode), then kills the later frame.
    """
    t = bank.shape[0]
    alive = sizes[:, 0] > 0  # [T]
    idx = jnp.arange(t)
    # next alive index after i (t if none): suffix-min of alive positions
    pos = jnp.where(alive, idx, t)
    rev_cummin = jnp.flip(jax.lax.cummin(jnp.flip(pos)))  # min alive >= i
    nxt = jnp.concatenate([rev_cummin[1:], jnp.full((1,), t)])  # strict successor
    has_next = (nxt < t) & alive

    nxt_safe = jnp.minimum(nxt, t - 1)
    x = bank.astype(jnp.float32)
    y = bank[nxt_safe].astype(jnp.float32)
    dot = jnp.sum(x * y, axis=-1)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=-1), _EPS)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=-1), _EPS)
    sim = dot / (nx * ny)  # [T, N]
    if sync:
        sim = sim.mean(axis=1, keepdims=True) * jnp.ones_like(sim)
    sim = jnp.where(has_next[:, None], sim, -jnp.inf)
    if sync:
        i = jnp.argmax(sim[:, 0])
        j = nxt_safe[i]
        if hard:
            new_row = bank[j]
            new_sizes_row = sizes[i]
        else:
            tot = sizes[i] + sizes[j]
            new_row = (
                bank[i] * sizes[i][..., None] + bank[j] * sizes[j][..., None]
            ) / tot[..., None]
            new_sizes_row = tot
        bank = bank.at[i].set(new_row.astype(bank.dtype))
        sizes = sizes.at[i].set(new_sizes_row)
        sizes = sizes.at[j].set(jnp.zeros_like(sizes[j]))
        return bank, sizes
    # per-patch (sync=False): merge independently for every patch column
    i = jnp.argmax(sim, axis=0)  # [N]
    j = nxt_safe[i]  # [N]
    cols = jnp.arange(bank.shape[1])
    bi, bj = bank[i, cols], bank[j, cols]  # [N, C]
    si, sj = sizes[i, cols], sizes[j, cols]  # [N]
    if hard:
        new_row, new_size = bj, si
    else:
        tot = si + sj
        new_row = (bi * si[:, None] + bj * sj[:, None]) / tot[:, None]
        new_size = tot
    bank = bank.at[i, cols].set(new_row.astype(bank.dtype))
    sizes = sizes.at[i, cols].set(new_size)
    sizes = sizes.at[j, cols].set(0.0)
    return bank, sizes


@partial(jax.jit, static_argnames=("tgt_mem_len", "sync", "hard"))
def malm_compress(
    memory_bank: jax.Array,
    tgt_mem_len: int,
    sync: bool = False,
    hard: bool = False,
) -> jax.Array:
    """MA-LLM / MA-LLM-hard adjacent-pair merging to ``tgt_mem_len`` frames.

    Functional re-derivation of the reference's shrinking-tensor loop
    (visual_compression.py:5-83) over a fixed-size buffer with an alive mask,
    so the whole compression is one compiled program. With sync=True the kept
    frames are compacted in temporal order; with sync=False each patch column
    is compacted independently.
    Returns [tgt_mem_len, N, C].
    """
    t, n, _ = memory_bank.shape
    sizes = jnp.ones((t, n), dtype=jnp.float32)
    bank = memory_bank

    def body(_, carry):
        return _merge_once(carry[0], carry[1], sync, hard)

    bank, sizes = jax.lax.fori_loop(0, t - tgt_mem_len, body, (bank, sizes))
    # compact alive frames to the front, preserving temporal order (per patch)
    alive_rank = jnp.argsort(
        jnp.where(sizes > 0, jnp.arange(t)[:, None], t + jnp.arange(t)[:, None]),
        axis=0,
        stable=True,
    )  # [T, N]
    keep = alive_rank[:tgt_mem_len]  # [tgt, N]
    return jnp.take_along_axis(bank, keep[..., None], axis=0)


def malm_hard_compress(memory_bank, tgt_mem_len, sync=False):
    return malm_compress(memory_bank, tgt_mem_len, sync=sync, hard=True)
