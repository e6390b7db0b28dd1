"""Pallas TPU kernel: batched gap-layout decode attention with per-slot
dead-block skipping.

The batched/continuous-serving decode step (ops/attention.
decode_attention_batch_gapped) is pure HBM-bound cache reading: one query
token per slot against a [B, KV, S_attn, D] gap-layout cache. The XLA
einsum reads the ENTIRE bucket every step — at a 41k-column serving bucket
that is ~2.4 GB/step even when a short request's live region is 8k columns
and the gap region is nearly empty. This kernel skips dead cache blocks
PER SLOT, exactly like the prefill kernel's fill-level skipping
(flash_prefill.py): a slot's live columns are

    [0, final_len[b])  u  [dec_start[b], write_end)

(prefill prefix + its own decode region; the hole in between belongs to
other slots' history and masked garbage — see runtime/serve.py). Dead
blocks alias block 0 in the index_map (Pallas elides the repeated DMA) and
``pl.when`` skips their compute, so each step's HBM traffic tracks the sum
of live regions, not B x bucket.

At decode shapes the kernel is GRID-OVERHEAD-bound, not HBM-bound: a live
[BK, D] block is ~1 us of DMA, so every grid step (dead ones included —
Mosaic grids are dense) costs about as much as the data it moves. All KV
heads are therefore folded INTO the block (grid (b, kb), block
[KV, BK, D], the head loop unrolled in-kernel): same HBM traffic, KVx
fewer grid steps. Measured per-call on-chip (tools/decode_gapped_bench.py,
n=100 amortized, 2026-08-19, 41k serving bucket): 2B bf16 B=8 mixed
0.44 ms vs 0.86 XLA (1.95x; was ~1.0x pre-merge), 7B bf16 B=8 0.61 vs
1.35 (2.2x); uniform full-bucket batches ~1.0x (worst 0.77x, int8 32k
uniform — but uniform batches take the einsum path by default anyway).

The current token's key/value contribution is merged OUTSIDE the kernel
(ops/attention.decode_attention_batch_gapped): the kernel returns the
unnormalized flash state (acc, m, l) per (slot, kv-head) and the caller
finishes the online-softmax merge with the single new key — identical
numerics to the append-free merge, one fewer special case in-kernel.

Serving calls pass the FULL stacked [L, B, KV, S, D] cache plus a
``layer`` index (scalar-prefetched into the index maps): a per-layer
4-D slice operand would force XLA to MATERIALIZE ~2 x [B, KV, S, D]
HBM copies per layer, because a Mosaic custom call cannot fuse a
dynamic-slice producer (measured ~17 ms/step at 28 layers x B=4 x 41k
bucket — more than the whole XLA-einsum decode step).

int8-cache mode streams int8 + LANE-MAJOR scale planes and COMMUTES the
scales out of the dequant: scores = (q @ k_int8_as_bf16) * ks_row and
acc += (p * vs_row) @ v_int8_as_bf16, so the per-block elementwise scale
work is [ROWS, BK] (8 x BK) instead of dequantizing [BK, D] (BK x 128) —
16x less VPU work. The scale block is the full [num_kb, BK] plane per
(b, kv) (a [1, BK] row block is rejected by Mosaic: sublane block dim 1
is neither 8-divisible nor the array dim); its DMA is elided across the
kb sweep (constant block index) and the block's row is selected in VMEM.

Grid (b, kb): kb innermost/sequential carries the online-softmax
scratch; b is parallel. Q rows per (b, kv-head) step are G (grouped query
heads, 6-7) padded to the 8-row sublane tile; logits [8, BK] fp32 stay far
under VMEM limits, so no SUB_K tiling is needed at decode shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Default DMA block target, both dtypes. int8 mode additionally
# constrains the choice so num_kb = S/BK is a multiple of 8: the fp32
# scale planes are reshaped [..., S] -> [..., num_kb, BK] and that
# operand's last-2-dim tiling is (8, 128) — an unaligned num_kb forces a
# padded/strided layout whose per-step cost dwarfs everything else.
# Measured on-chip (tools/serve_decode_bisect.py, int8 B=8, 2026-08-20):
#   S=43008: BK=1792 (nk=24 ok) 8.0 ms/step, BK=896 (nk=48 ok) 9.3,
#            BK=1024 (nk=42 BAD) 33.2, BK=512 (nk=84 BAD) 33.6
#   S=40960: BK=1024 (nk=40 ok) 8.5, BK=2048 (nk=20 BAD) 32.2,
#            BK=4096 (nk=10 BAD) 39.2      (XLA einsum arm: 11.4)
# The earlier "int8 VMEM supralinearity in BK" reading of this data was a
# misattribution — aligned BK=1792 beats aligned BK=896, so bigger blocks
# help int8 exactly as they do bf16 once num_kb is tile-aligned. bf16 has
# no scale planes and is insensitive (BK=2048, nk=21: 9.1 ms vs 17.4).
# RETAKE_GAPPED_BLOCK_K: experiment override (read once at import) for
# the attribution sweeps in tools/serve_decode_bisect.py — it requests
# the EXACT block target with no row-alignment preference.
_BK_ENV = os.environ.get("RETAKE_GAPPED_BLOCK_K")
DEFAULT_BK = int(_BK_ENV) if _BK_ENV else 2048
# RETAKE_GAPPED_INT8_DIRECT=1: feed the int8 blocks straight into
# dot_general (mixed bf16 x int8) instead of casting them to the compute
# dtype first — attribution experiment for the int8-mode in-scan cost.
INT8_DIRECT = os.environ.get("RETAKE_GAPPED_INT8_DIRECT", "0") == "1"
ROWS = 8  # query rows per (b, kv) step: G padded to the sublane tile


def _pick_block_k(s: int, block_k: int, row_align: int = 1) -> int:
    """Largest divisor of ``s`` that is <= ``block_k``, a multiple of
    128 (the lane tile), and — when ``row_align`` is set — leaves
    ``s // bk`` a multiple of ``row_align``. NOT just power-of-two
    halvings: the grid is DENSE (every (slot, kv head) sweeps s/block_k
    steps per layer whether blocks are live or dead), so a collapsed
    block size multiplies grid overhead directly — the old halving chain
    turned the serving bucket 41088 (= 321 x 128, 321 odd) into
    block_k=128 -> 321 grid steps per (b, kv): measured 43 vs ~14 ms per
    decode step at int8 B=8 serving shapes.

    ``row_align=8`` is the int8 mode's constraint: the reshaped scale
    planes [..., num_kb, bk] need num_kb on the fp32 sublane tile or the
    operand layout goes padded/strided (4x decode-step regressions — see
    the module header's measurements). Any 2048-aligned bucket admits
    bk=256 with num_kb%8==0, so production serving (ContinuousServer pads
    its bucket to 2048) always has an aligned choice; arbitrary caller
    buckets degrade gracefully by dropping the row constraint, then to
    the best plain 128-multiple divisor. Sub-128 test shapes keep
    halving."""
    block_k = min(block_k, s)
    for align in ((row_align, 1) if row_align > 1 else (1,)):
        # a tiny aligned block is NOT worth the dense-grid collapse (128
        # -> 321 steps measured 43 ms vs ~33 for the padded-scale mode):
        # only honor the row constraint down to 512, then fall back to
        # the plain largest-divisor rule
        floor = 512 if align > 1 else 128
        if s % block_k == 0 and (s // block_k) % align == 0:
            return block_k
        for cand in range(block_k - block_k % 128, floor - 1, -128):
            if s % cand == 0 and (s // cand) % align == 0:
                return cand
    while s % block_k:
        block_k //= 2
    return block_k


def _kernel(
    scalar_ref,  # SMEM [2B+1(+1)]: final_len[B] | dec_start[B] | write_end
    #   (| layer in stacked mode — consumed by the index maps only)
    q_ref,  # [1, KV, ROWS, D]
    k_ref,  # [1, KV, BK, D] (bf16 | int8); stacked: [1, 1, KV, BK, D]
    v_ref,  # [1, KV, BK, D]
    *refs,  # [ks_ref [1,KV,NKB,BK], vs_ref,] acc_ref, m_ref, l_ref (outputs)
    b_total: int,
    bk: int,
    num_kb: int,
    num_kv: int,
    scale: float,
    quantized: bool,
    stacked: bool,
):
    if quantized:
        ks_ref, vs_ref, acc_ref, m_ref, l_ref = refs
    else:
        acc_ref, m_ref, l_ref = refs
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    kb = pl.program_id(1)
    final_len = scalar_ref[b]
    dec_start = scalar_ref[b_total + b]
    write_end = scalar_ref[2 * b_total]

    @pl.when(kb == 0)
    def _init():
        m_ref[0] = jnp.full_like(m_ref[0], NEG_INF)
        l_ref[0] = jnp.zeros_like(l_ref[0])
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    start = kb * bk
    live = (start < final_len) | (
        (start + bk > dec_start) & (start < write_end)
    )

    @pl.when(live)
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (ROWS, bk), 1)
        valid = (col < final_len) | ((col >= dec_start) & (col < write_end))
        # all KV heads of this (slot, block) in one grid step: the head
        # loop is a static unroll — same HBM traffic, KVx fewer grid steps
        # (each step costs ~1 us of overhead, comparable to a live block's
        # whole DMA at decode shapes)
        for kvi in range(num_kv):
            q = q_ref[0, kvi]  # [ROWS, D]
            k = k_ref[0, 0, kvi] if stacked else k_ref[0, kvi]  # [BK, D]
            v = v_ref[0, 0, kvi] if stacked else v_ref[0, kvi]
            if ks_ref is not None and not INT8_DIRECT:
                # commuting scales: cast int8 -> compute dtype WITHOUT the
                # scale; the per-key scale lands on the [ROWS, BK] score /
                # probability rows below (16x less elementwise work than
                # dequantizing the [BK, D] blocks)
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [ROWS, BK]
            if ks_ref is not None:
                ks_row = (ks_ref[0, 0, kvi, pl.ds(kb, 1), :] if stacked
                          else ks_ref[0, kvi, pl.ds(kb, 1), :])
                s = s * ks_row  # [1, BK] row broadcast
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[0, kvi][:, :1]  # [ROWS, 1]
            l_prev = l_ref[0, kvi][:, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if vs_ref is not None:
                vs_row = (vs_ref[0, 0, kvi, pl.ds(kb, 1), :] if stacked
                          else vs_ref[0, kvi, pl.ds(kb, 1), :])
                p = p * vs_row  # fold the value scale into the probs
            acc_ref[0, kvi] = acc_ref[0, kvi] * alpha + jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[0, kvi] = jnp.broadcast_to(m_new, m_ref.shape[2:])
            l_ref[0, kvi] = jnp.broadcast_to(l_new, l_ref.shape[2:])


@functools.partial(jax.jit, static_argnames=("block_k",))
def decode_gapped_flash_state(
    query: jax.Array,  # [B, KV, G, D] current-token queries (RoPE'd)
    key_cache: jax.Array,  # [B, KV, S, D] (bf16 | int8 + k_scale), or the
    #   FULL stacked cache [L, B, KV, S, D] with ``layer`` set
    value_cache: jax.Array,
    final_len: jax.Array,  # [B] int32
    dec_start: jax.Array,  # [B] int32 per-slot decode-region start
    write_end: jax.Array,  # scalar int32 — gap_start + gap_filled
    k_scale=None,  # [B, KV, S] f32 (int8-cache mode; [L, B, KV, S] stacked)
    v_scale=None,
    layer=None,  # scalar int32 — stacked mode: which layer of the 5-D cache
    #   to attend over (see module docstring: avoids materialized per-layer
    #   slice operands in the serving decode loop)
    block_k: int | None = None,  # None = DEFAULT_BK target; int8 mode
    #   additionally keeps num_kb 8-row-aligned (see module header)
):
    """Unnormalized flash state over the cache's live regions.

    Returns (acc [B, KV, G, D] f32, m [B, KV, G] f32, l [B, KV, G] f32);
    the caller merges the current token's key/value append-free and
    normalizes (ops/attention.decode_attention_batch_gapped)."""
    b, num_kv, g, d = query.shape
    assert g <= ROWS, (
        f"GQA group size {g} exceeds the kernel's ROWS={ROWS} query-row "
        f"tile (num_heads/num_kv_heads must be <= {ROWS}; use the xla "
        f"decode impl for wider groups)"
    )
    stacked = key_cache.ndim == 5
    assert stacked == (layer is not None), (
        "pass `layer` iff the caches are stacked [L, B, KV, S, D]"
    )
    s = key_cache.shape[-2]
    quantized = k_scale is not None
    if block_k is None:
        block_k = DEFAULT_BK
    # int8 scale planes constrain num_kb to the sublane tile unless an
    # explicit/env block size asks for an exact sweep point
    row_align = 8 if (quantized and not _BK_ENV) else 1
    block_k = _pick_block_k(s, block_k, row_align)
    num_kb = s // block_k

    q = query
    if g < ROWS:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, ROWS - g), (0, 0)))

    scalar_list = [
        final_len.astype(jnp.int32),
        dec_start.astype(jnp.int32),
        write_end.astype(jnp.int32)[None],
    ]
    if stacked:
        scalar_list.append(jnp.asarray(layer, jnp.int32)[None])
    scalars = jnp.concatenate(scalar_list)

    def q_index(bi, kb, sc):
        return (bi, 0, 0, 0)

    def _live_kb(bi, kb, sc):
        start = kb * block_k
        final = sc[bi]
        dstart = sc[q.shape[0] + bi]
        wend = sc[2 * q.shape[0]]
        live = (start < final) | ((start + block_k > dstart) & (start < wend))
        return jnp.where(live, kb, 0)

    if stacked:
        def kv_index(bi, kb, sc):
            return (sc[2 * q.shape[0] + 1], bi, 0, _live_kb(bi, kb, sc), 0)

        def sc_index(bi, kb, sc):
            return (sc[2 * q.shape[0] + 1], bi, 0, 0, 0)

        kv_block = (1, 1, num_kv, block_k, d)
        sc_block = (1, 1, num_kv, num_kb, block_k)
        sc_shape = (-1, b, num_kv, num_kb, block_k)
    else:
        def kv_index(bi, kb, sc):
            return (bi, 0, _live_kb(bi, kb, sc), 0)

        def sc_index(bi, kb, sc):
            return (bi, 0, 0, 0)

        kv_block = (1, num_kv, block_k, d)
        sc_block = (1, num_kv, num_kb, block_k)
        sc_shape = (b, num_kv, num_kb, block_k)

    def out_index(bi, kb, sc):
        return (bi, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, num_kv, ROWS, d), q_index),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
    ]
    inputs = [q, key_cache, value_cache]
    if quantized:
        # lane-major scale planes: [..., S] -> [..., num_kb, BK] (free
        # reshape, S = num_kb * BK); see module docstring for why the
        # block is the full plane
        in_specs += [
            pl.BlockSpec(sc_block, sc_index),
            pl.BlockSpec(sc_block, sc_index),
        ]
        inputs += [
            k_scale.reshape(sc_shape),
            v_scale.reshape(sc_shape),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_kb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, num_kv, ROWS, d), out_index),
            pl.BlockSpec((1, num_kv, ROWS, 128), out_index),
            pl.BlockSpec((1, num_kv, ROWS, 128), out_index),
        ],
    )

    kernel = functools.partial(
        _kernel,
        b_total=b,
        bk=block_k,
        num_kb=num_kb,
        num_kv=num_kv,
        scale=float(1.0 / (d**0.5)),
        quantized=quantized,
        stacked=stacked,
    )
    kv_bytes = 1 if quantized else 2
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, num_kv, ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct((b, num_kv, ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, num_kv, ROWS, 128), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",  # CPU tests / dryruns
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_kv * ROWS * s * d,
            bytes_accessed=b * num_kv * s * d * kv_bytes * 2,
            transcendentals=b * num_kv * ROWS * s,
        ),
    )(scalars, *inputs)
    return acc[:, :, :g], m[:, :, :g, 0], l[:, :, :g, 0]
