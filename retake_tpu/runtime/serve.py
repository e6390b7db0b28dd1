"""Continuous batching: admit new requests mid-decode (serving extension).

The reference serves eval-style — prefill everything, then decode the whole
batch to completion (HF ``generate``; retake/infer_eval.py:184-201). This
module adds the serving capability the gap-layout batched cache
(engine._decode_loop_batch) was built for: decode runs in fixed-size
scanned SEGMENTS, and between segments the host admits newly arrived
requests into free batch slots and harvests finished ones. A late request
no longer waits for the whole previous batch to finish; a single v5e core
serializes compute anyway, so pausing decode for an admission's prefill
costs exactly the prefill — the same price a dedicated prefill worker
would pay.

Invariants that keep the hot path fast (no scatter, no recompiles):

* Writes stay batch-uniform. Every live slot's step token lands at column
  ``gap_start + F`` (F = global step counter), so the per-step KV append
  stays ONE aliasable dynamic_update_slice. A slot admitted at F = t0 owns
  decode columns [gap_start + t0, ...); older columns belong to previous
  tenants of the slot and are masked per-slot via ``dec_start``
  (ops/attention.decode_attention_batch_gapped).
* Positions continue analytically. The loop computes temporal row
  ``base_t + F``; a request needs ``base_t_own + c`` (c = its own decoded
  count), so admission stores ``base_t_own - t0`` and compaction (F -> 0)
  adds the consumed F back. Same for the M-RoPE text rows (pos_rest).
* Shapes never change. The batched cache is [L, B, KV, P + G, D] for the
  whole server lifetime (P = prefill bucket, G = gap capacity): one
  compiled segment program serves every admission pattern.
* When the gap region would overflow (F + segment > G), each live slot's
  decoded K/V — contiguous at [dec_start_b, gap_start + F) — is folded
  down onto its prefill tail [final_len_b, final_len_b + c_b) with one
  batched gather, final_len grows, dec_start resets, F -> 0. This always
  fits: a slot's lifetime decode count is <= max_new and its admission
  bucket guarantees final_len + max_new <= P <= gap_start. The gather
  rewrites the cache once per ~G steps (amortized), which is exactly the
  cost the uniform-write layout avoids paying EVERY step.

Sampling is reproducible: draw keys derive from (seed, request-own step)
— the sequential loop's exact key schedule — so sampled serving produces
the same tokens as per-request ``generate`` regardless of arrival order,
slot packing, or compaction timing (up to the same fp-reduction caveats
as greedy parity).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


import os as _os

from retake_tpu.runtime.engine import (
    PrefillState,
    PrefixBudgetOverflow,
    PrefixMismatch,
    PrefixUnsupported,
    _attn_bucket,
    _decode_loop_batch,
    _insert_batch_slot,
)


_SYNC = _os.environ.get("RETAKE_SERVE_SYNC", "")


def _sync(tag, *arrs):
    if tag in _SYNC or "all" in _SYNC:
        for a in arrs:
            if a is not None:
                jax.block_until_ready(a)


def _sdbg(*a):
    """Env-gated schedule trace (RETAKE_SERVE_DEBUG=1): segment dispatches,
    compactions, and harvests with the host-mirrored per-slot state — the
    tool that located the zero-copy aliasing race below. Timestamped
    (monotonic seconds) so the trace doubles as a per-phase wall profile
    of the serving loop."""
    if _os.environ.get("RETAKE_SERVE_DEBUG"):
        print(f"[serve {time.perf_counter():9.3f}]", *a, flush=True)


def _dev(x) -> jax.Array:
    """Copying host->device transfer for the server's mutable numpy
    mirrors (final_len, dec_start, base_t, done, ...).

    The serving loop mutates these mirrors in place right after dispatch
    (``_compact`` resets ``dec_start[:]``, ``_finish``/``_admit`` restamp
    freed slots) while the dispatched computation may still be in flight.
    Probing shows ``jnp.asarray(numpy)`` snapshots the values at dispatch
    on today's CPU backend, but that is not contractual; ``jnp.array``
    copies unconditionally and these are [B]-sized vectors, so the
    explicit copy is free insurance against transfer/aliasing semantics
    changing underneath the mutation pattern."""
    return jnp.array(x)


@partial(
    jax.jit,
    donate_argnames=("k_all", "v_all", "ks_all", "vs_all"),
)
def _compact_gap(
    k_all, v_all, ks_all, vs_all,
    final_len,  # [B] int32
    dec_start,  # [B] int32
    counts,  # [B] int32 — decoded tokens per slot (0 for free slots)
    gap_start,  # scalar int32
):
    """Fold every slot's gap-region decode K/V down onto its prefill tail.

    One batched gather over the token axis: column j of slot b reads from
    ``dec_start_b + (j - final_len_b)`` inside the fold window
    [final_len_b, final_len_b + c_b) and from itself elsewhere. Runs once
    per ~G decode steps."""
    s = k_all.shape[3]
    j = jnp.arange(s)[None, :]  # [1, S]
    fold = (j >= final_len[:, None]) & (j < (final_len + counts)[:, None])
    src = jnp.where(j < final_len[:, None], j,
                    dec_start[:, None] + (j - final_len[:, None]))
    src = jnp.where(fold | (j < final_len[:, None]), src, j)
    src = jnp.clip(src, 0, s - 1)
    idx5 = src[None, :, None, :, None]  # [1, B, 1, S, 1]
    k_all = jnp.take_along_axis(k_all, idx5, axis=3)
    v_all = jnp.take_along_axis(v_all, idx5, axis=3)
    if ks_all is not None:
        idx4 = src[None, :, None, :]
        ks_all = jnp.take_along_axis(ks_all, idx4, axis=3)
        vs_all = jnp.take_along_axis(vs_all, idx4, axis=3)
    return k_all, v_all, ks_all, vs_all


@dataclasses.dataclass
class ServeResult:
    request_id: int
    tokens: np.ndarray  # generated ids (incl. the prefill's first token)
    arrival_s: float  # arrival time (relative to server start)
    prefill_start_s: float
    first_token_s: float  # prefill done = first token ready
    finish_s: float  # last token ready (end of its final segment)
    cancelled: bool = False  # client disconnect (on_tokens returned False)
    error: str = ""  # online mode: admission failure message (request never
    #   ran; cancelled is also True)

    @property
    def ttft_s(self) -> float:  # queue wait + prefill
        return self.first_token_s - self.arrival_s

    @property
    def latency_s(self) -> float:
        return self.finish_s - self.arrival_s


class ContinuousServer:
    """Continuous-batching server over one engine (greedy decoding).

    ``batch_slots`` concurrent decode lanes; ``segment_steps`` decode steps
    between admission points; ``prefill_bucket`` is the uniform decode-base
    column (defaults to the engine's attention bucket for
    ``max_prefill_tokens + max_new_tokens``) — a request whose own bucket
    exceeds it is rejected at admission. ``max_new_tokens`` is the server
    DEFAULT token budget; a request dict may carry its own
    ``max_new_tokens`` (per-slot budgets — harvest finishes each slot at
    its own limit).
    """

    def __init__(
        self,
        engine,
        batch_slots: int = 4,
        segment_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        prefill_bucket: Optional[int] = None,
        gap_capacity: Optional[int] = None,
        interleave_prefill: bool = True,
        interleave_segments_per_hook: int = 1,
        decode_attn_impl: str = "auto",
        vision_cache_slots: int = 0,
        prefix_cache_slots: int = 0,
        prefix_reserve_tokens: int = 512,
    ):
        self.engine = engine
        self.cfg = getattr(engine.cfg, "text", engine.cfg)
        # vision-feature LRU (engine.encode_video artifacts): a request may
        # carry a ``video_key`` — same key + cached entry = the admission
        # skips the whole ViT/DPSelect stage (the reference recomputes it
        # per question; multiple questions about one live video are the
        # serving analogue of the eval reuse_video_features grouping).
        # Pixels stay in the request as the miss fallback, so eviction can
        # never strand a request. 0 = off; each cached video costs its
        # LLM-space embeddings in HBM (~1 GB at 2B/2048f).
        self.vision_cache_slots = int(vision_cache_slots)
        self._vision_cache: Dict[str, object] = {}
        # VideoPrefix LRU (engine.encode_prefix artifacts): extends the
        # vision cache to the FULL question-independent prefill — a keyed
        # re-ask of the same video pays only the trailing text segment
        # (on-chip at 2B/256f: 0.13 s suffix vs 1.6 s inline, token-exact;
        # tools/onchip/verify_r4_prefix.py). The engine re-validates every
        # reuse (prefix ids + plan signature + budget) and the admission
        # falls back to the inline path on PrefixMismatch, so a stale or
        # mismatched entry can never produce wrong tokens. Each cached
        # prefix pins its compressed KV cache in HBM (~0.7 GB at 2B/32k
        # budget bf16; half that with kv_cache_dtype int8) PLUS its
        # features' embeddings (the mismatch fallback) — budget slots
        # accordingly. Captures cost one extra suffix re-plan vs a plain
        # prefill; requires prompt_guided_compression off (else disabled
        # on first attempt, loudly in stats).
        self.prefix_cache_slots = int(prefix_cache_slots)
        self.prefix_reserve = int(prefix_reserve_tokens)
        self._prefix_cache: Dict[str, object] = {}
        self._prefix_disabled = False  # set on config-level ValueError
        # observability counters (served by the HTTP layer's /metrics);
        # only the serving-loop thread writes them
        self.stats: Dict[str, int] = {
            "requests_admitted": 0, "requests_finished": 0,
            "requests_cancelled": 0, "requests_rejected_deadline": 0,
            "tokens_emitted": 0, "segments_dispatched": 0,
            "compactions": 0, "vision_cache_hits": 0,
            "vision_cache_misses": 0, "prefix_cache_hits": 0,
            "prefix_cache_misses": 0, "prefix_mismatch_fallbacks": 0,
            "prefix_capture_failures": 0, "prefix_budget_recaptures": 0,
        }
        self.b = int(batch_slots)
        self.seg = int(segment_steps)
        self.max_new = int(max_new_tokens or engine.retake.max_new_tokens)
        self.p_bucket = prefill_bucket  # resolved at first admission
        self.gap_cap = int(gap_capacity or max(4 * self.seg, 128))
        # interleaved chunked prefill: during an admission's prefill, dispatch
        # BLIND decode segments between prefill-chunk dispatches (engine
        # on_dispatch hook). Blind = no host read: the carry token rides as a
        # device array (tokens[-1] of the previous segment) and EOS detection
        # waits until the staged segments are harvested after the prefill —
        # post-EOS slots decode garbage that harvest trims (same waste the
        # plain batched decode pays after a request finishes). In-flight
        # requests' TPOT during a long admission is then bounded by one
        # prefill dispatch + a segment instead of the whole prefill.
        # ``interleave_segments_per_hook`` is the sharing policy on the
        # SERIAL device: 1 = proportional sharing (decode progresses
        # steadily but in-flight completions still land near the prefill's
        # end); >1 front-loads decode so nearly-finished requests complete
        # early in the admission window at the cost of admitted-request
        # TTFT. The device executes the same total work either way — the
        # knob trades latency BETWEEN tenants, it cannot create overlap
        # (tools/overlap_ablation.py).
        self.interleave = bool(interleave_prefill)
        self.per_hook = max(1, int(interleave_segments_per_hook))
        # decode attention over the shared serving bucket.
        #   "pallas": dead-block-skipping kernel (ops/pallas/
        #     decode_gapped.py) — HBM reads track each slot's LIVE regions
        #     instead of B x bucket. With the 2048-aligned bucket and the
        #     kernel's row-aligned block choice this WINS end-to-end on
        #     the chip (tools/serve_decode_bisect.py + serve_bench
        #     --mixed_impl, 2026-08-20): bf16 B=4 serving 423.9 vs 302.7
        #     tok/s (1.40x); int8 B=8 serving 736.9 vs 573.4 tok/s
        #     (1.29x); isolated decode loop bf16 B=8 9.1 vs 17.4 ms/step,
        #     int8 B=8 8.0 vs 11.4. Flash-order reduction: tokens may
        #     diverge from per-request generate within ulps.
        #   "xla": full-bucket masked einsum — same fp reduction order as
        #     the sequential decode path; bit-exact tokens vs generate.
        #   "auto" (default): "pallas" on an accelerator when the model's
        #     GQA group fits the kernel's 8-row query tile; "xla" on the
        #     CPU backend (interpret-mode pallas is orders slower) and for
        #     wider GQA groups. Pass "xla" explicitly when bit-exact parity
        #     with generate matters more than throughput.
        assert decode_attn_impl in ("auto", "xla", "pallas", "flash"), (
            f"decode_attn_impl must be 'auto', 'xla', 'pallas' or 'flash',"
            f" got {decode_attn_impl!r}"
        )
        if decode_attn_impl == "auto":
            group = (self.cfg.num_attention_heads
                     // self.cfg.num_key_value_heads)
            decode_attn_impl = (
                "pallas"
                if jax.default_backend() != "cpu" and group <= 8
                else "xla"
            )
        self.decode_attn_impl = str(decode_attn_impl)
        # set for real at _init_buffers (first admission); the pre-buffer
        # _gap_cols callers only need the bf16 default
        self._quantized = False
        self.staged = []  # un-harvested segment token arrays (device)
        self.emitted = np.zeros(self.b, np.int32)
        self._slot_req = None
        self._drain = None
        # sampling: keys derive from (seed, request-own step) — the
        # sequential loop's exact schedule — so sampled serving is
        # token-exact vs per-request generate and independent of arrival
        # order / slot packing (engine._decode_loop_batch)
        rt = engine.retake
        self.sampling = None
        self.rng_loop = None
        if rt.do_sample:
            self.sampling = (
                float(getattr(rt, "temperature", 1.0)),
                float(getattr(rt, "top_p", 1.0)),
                int(getattr(rt, "top_k", 0)),
            )
            self.rng_loop = jax.random.fold_in(
                jax.random.key(int(getattr(rt, "seed", 0))), 1
            )

    # ---------- internal device/host state ----------

    def _gap_cols(self) -> int:
        """Physical gap columns: ``gap_cap`` plus the padding that makes
        the shared bucket (p_bucket + gap columns) 2048-aligned. The
        gapped decode kernel's block size must DIVIDE the bucket, and its
        grid is dense (S/block_k steps per (slot, kv head) per layer), so
        an unaligned bucket collapses the block size and multiplies grid
        overhead: the old p_bucket + gap_cap = 40960 + 128 = 41088
        (= 321 x 128) forced block_k=128 — measured 45 vs ~15 ms per
        decode step at int8 B=8 serving shapes
        (tools/serve_decode_bisect.py). Only the BUFFER grows (a few
        hundred MB at most at production shapes); the compaction trigger
        keeps the caller's ``gap_capacity`` semantics, and the write
        pointer never enters the padding (f_global <= gap_cap at every
        dispatch). With an int8 cache on the pallas impl the padding
        additionally guarantees a num_kb-row-aligned block choice >= 512
        exists (the scale-plane tiling constraint, decode_gapped.py
        module header): a 2048-aligned bucket whose S/2048 multiplier is
        an odd prime (e.g. S = 2048 x 17) admits none and would silently
        fall into the 4x-slower padded-scale mode — one extra 2048 bump
        makes S 4096-aligned, where bk=512 always qualifies."""
        s = self.p_bucket + self.gap_cap
        pad = (-s) % 2048
        if (self._quantized and s + pad >= 4096
                and self.decode_attn_impl in ("pallas", "flash")):
            from retake_tpu.ops.pallas.decode_gapped import _pick_block_k

            while ((s + pad) // _pick_block_k(s + pad, 2048, 8)) % 8:
                pad += 2048  # one bump makes S 4096-aligned: bk=512 fits
        return self.gap_cap + pad

    def _init_buffers(self, st: PrefillState):
        cache = st.cache
        l, kv, _, d = cache.k.shape
        self._quantized = cache.quantized
        s_attn = self.p_bucket + self._gap_cols()
        quant = cache.quantized
        self.k_all = jnp.zeros((l, self.b, kv, s_attn, d), cache.k.dtype)
        self.v_all = jnp.zeros_like(self.k_all)
        self.ks_all = self.vs_all = None
        if quant:
            self.ks_all = jnp.zeros((l, self.b, kv, s_attn), jnp.float32)
            self.vs_all = jnp.zeros_like(self.ks_all)
        # host-mirrored per-slot state (tiny vectors; re-uploaded per call)
        self.base_t = np.zeros((l, self.b), np.int32)  # admission-adjusted
        self.pos_rest = np.zeros(self.b, np.int32)  # admission-adjusted
        self.final_len = np.zeros(self.b, np.int32)
        self.dec_start = np.full(self.b, self.p_bucket, np.int32)
        # the scan-carry token lives ON DEVICE (tokens[-1] of the previous
        # segment) so blind segments need no host read between dispatches
        self.cur_dev = jnp.zeros(self.b, jnp.int32)
        self.done = np.ones(self.b, bool)  # free slots decode as done
        self.f_global = 0  # decode steps since last compaction
        self.emitted = np.zeros(self.b, np.int32)  # segment steps per tenant
        self.staged: list = []  # un-harvested segment token arrays [seg, B]
        # sampling-key offset: request-own step = global i - step_off[slot]
        self.step_off = np.zeros(self.b, np.int32)
        # per-slot token budget: a request dict may carry its own
        # max_new_tokens (<= self.max_new is NOT required — its admission
        # bucket check covers final_len + max_new <= p_bucket, the
        # compaction-fold invariant)
        self.slot_max = np.full(self.b, self.max_new, np.int32)

    def _admit(self, slot: int, st: PrefillState, req_id: int):
        cache = st.cache
        assert st.attn_need <= self.p_bucket, (
            f"request bucket {st.attn_need} exceeds server prefill bucket "
            f"{self.p_bucket}"
        )
        s_attn = self.p_bucket + self._gap_cols()
        pad = s_attn - cache.k.shape[2]
        k = jnp.pad(cache.k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(cache.v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        self.k_all = _insert_batch_slot(self.k_all, k, jnp.int32(slot))
        self.v_all = _insert_batch_slot(self.v_all, v, jnp.int32(slot))
        _sync("insert", self.k_all, self.v_all)
        if cache.quantized:
            ks = jnp.pad(cache.k_scale, ((0, 0), (0, 0), (0, pad)))
            vs = jnp.pad(cache.v_scale, ((0, 0), (0, 0), (0, pad)))
            self.ks_all = _insert_batch_slot(self.ks_all, ks, jnp.int32(slot))
            self.vs_all = _insert_batch_slot(self.vs_all, vs, jnp.int32(slot))
        fl = st.final_len
        if st.reforge:
            base_col = np.asarray(cache.pos[:, 0, fl - 1]) + 1  # [L]
        else:
            base_col = np.full(self.base_t.shape[0], st.decode_pos_base)
        st.cache = None  # consumed
        # invariant: loop computes base + (t0 + steps); subtract t0 now
        self.base_t[:, slot] = base_col - self.f_global
        self.pos_rest[slot] = st.decode_pos_base - self.f_global
        self.final_len[slot] = fl
        self.dec_start[slot] = self.p_bucket + self.f_global
        self.cur_dev = self.cur_dev.at[slot].set(st.first_token_host)
        self.emitted[slot] = 0
        self.step_off[slot] = self.f_global
        self.done[slot] = st.first_token_host == self.cfg.eos_token_id

    def _segment(self) -> None:
        """Dispatch ``seg`` decode steps and STAGE the token array (a device
        array — no host read here; run()'s drain harvests). The scan carry
        for the next segment is ``tokens[-1]`` on device."""
        tokens, (self.k_all, self.v_all, self.ks_all, self.vs_all) = (
            _decode_loop_batch(
                self.engine.params, self.cfg,
                self.k_all, self.v_all,
                _dev(self.base_t), _dev(self.pos_rest),
                _dev(self.final_len), jnp.int32(self.p_bucket),
                self.cur_dev, self.seg,
                self.sampling, self.rng_loop, self.ks_all, self.vs_all,
                dec_start=_dev(self.dec_start),
                i0=jnp.int32(self.f_global),
                done0=_dev(self.done),
                step_off=_dev(self.step_off),
                attn_impl=self.decode_attn_impl,
            )
        )
        _sdbg("segment f=", self.f_global, "fl=", self.final_len.tolist(),
              "ds=", self.dec_start.tolist(), "done=", self.done.tolist(),
              "em=", self.emitted.tolist())
        _sync("segment", tokens, self.k_all)
        self.f_global += self.seg
        self.cur_dev = tokens[-1]
        self.emitted = self.emitted + np.int32(self.seg)
        self.staged.append(tokens)
        self.stats["segments_dispatched"] += 1

    def _counts(self) -> np.ndarray:
        """Gap-region token count per slot = write-pointer distance since
        its dec_start (includes post-EOS garbage of not-yet-harvested
        slots — those columns are part of the slot's contiguous written
        region and must move with it at compaction)."""
        counts = np.zeros(self.b, np.int32)
        for s in getattr(self, "_slot_req", {}):
            counts[s] = self.p_bucket + self.f_global - self.dec_start[s]
        return counts

    def _on_prefill_dispatch(self):
        """Engine hook (interleaved chunked prefill): one BLIND decode
        segment per prefill-chunk dispatch, so in-flight requests keep
        decoding while a long admission prefills. Skipped when any tenant
        could exceed its token budget within the segment."""
        slot_req = getattr(self, "_slot_req", None)
        if not slot_req or not hasattr(self, "k_all"):
            return
        for _ in range(self.per_hook):
            if not slot_req:
                break
            need = [self.slot_max[s] - 1 - self.emitted[s]
                    for s in slot_req]
            if max(need) <= 0:
                break  # every tenant's full stream is already dispatched
            if any(n <= 0 for n in need):
                # some tenant's stream is ALREADY fully dispatched while
                # others still need segments: drain everything now so the
                # finished tenant stamps/frees BEFORE the next dispatch —
                # otherwise further segments keep writing junk KV for it
                # and a same-hook compaction would fold those writes past
                # the bound final_len + max_new <= P (with per_hook >= 2
                # the old code could hit exactly that)
                if self._drain is None:
                    break
                self._drain(keep_last=0)
                continue  # recompute need against the surviving tenants
            if max(need) > self.seg and any(0 < n < self.seg for n in need):
                # a tenant's FINAL partial segment would overshoot its
                # budget (junk KV writes past max_new break the
                # compaction-fold bound final_len + max_new <= P) while
                # other tenants still need full segments — stall the
                # partial tenant until the prefill ends (rare mixed case)
                break
            # when max(need) <= seg this segment COMPLETES every tenant:
            # overshoot junk is bounded within it, and the drain at the
            # next iteration (or the full drain below) frees the slots
            # before any later compaction sees the overshoot
            if self.f_global + self.seg > self.gap_cap:
                self._compact(self._counts())
            self._segment()
        # harvest: lag-1 normally (read everything but the segment just
        # dispatched — the host blocks only on work already deep in the
        # device queue, so dispatch never starves). FULL drain whenever
        # some tenant's stream is completely dispatched: it frees/stamps
        # at its completion segment instead of the prefill's end, and
        # keeps overshoot junk out of any later compaction fold.
        if self._drain is not None:
            fin_any = any(self.slot_max[s] - 1 - self.emitted[s] <= 0
                          for s in slot_req)
            self._drain(keep_last=0 if fin_any else 1)

    def _compact(self, counts: np.ndarray):
        self.stats["compactions"] += 1
        _sdbg("compact f=", self.f_global, "counts=", counts.tolist(),
              "fl=", self.final_len.tolist(), "ds=", self.dec_start.tolist())
        self.k_all, self.v_all, self.ks_all, self.vs_all = _compact_gap(
            self.k_all, self.v_all, self.ks_all, self.vs_all,
            _dev(self.final_len), _dev(self.dec_start),
            _dev(counts), jnp.int32(self.p_bucket),
        )
        # FENCE (correctness, do not remove): block until the fold lands.
        # Without it, the donated-cache chain segment -> compact -> segment
        # re-enters the SAME decode executable while its previous
        # invocation is still in flight, and on the CPU backend the
        # post-compact segment intermittently reads pre-fold cache contents
        # (tokens deterministically wrong for the folded slot; reproduced
        # ~50% under warm jit caches, schedule and host mirrors verified
        # identical pass-vs-fail via RETAKE_SERVE_DEBUG traces; any
        # host-sync point removes it). Compaction runs once per ~G decode
        # steps, so the pipeline bubble is amortized to noise.
        # block_until_ready is enough on CPU but is a no-op through the
        # axon TPU tunnel (CLAUDE.md) — the host read of a fresh scalar
        # depending on the fold is the reliable fence on every backend.
        jax.block_until_ready(self.k_all)
        float(jnp.sum(self.k_all[0, 0, 0, 0, :1].astype(jnp.float32)))
        self.final_len = self.final_len + counts.astype(np.int32)
        self.dec_start[:] = self.p_bucket
        # row0 = base + F: F resets, fold the consumed F into the bases
        self.base_t = self.base_t + np.int32(self.f_global)
        self.pos_rest = self.pos_rest + np.int32(self.f_global)
        # own_step = i - step_off: i rebases by -F, so step_off follows
        self.step_off = self.step_off - np.int32(self.f_global)
        self.f_global = 0

    # ---------- the serving loop ----------

    def run(
        self,
        requests: List[dict],
        arrival_times: Optional[List[float]] = None,
        on_tokens=None,
    ) -> List[ServeResult]:
        """Serve ``requests`` (engine.generate kwargs) arriving at
        ``arrival_times`` (seconds from start; None = all at t=0). Runs in
        real time: a request is only visible to the server once the wall
        clock passes its arrival time. Returns per-request results with
        queueing/TTFT/latency breakdowns, in request order.

        ``on_tokens(request_id, token_ids)`` streams tokens as the host
        harvests them: once at admission (the prefill's first token) and
        once per harvested decode segment (<= segment_steps tokens, EOS/
        budget-trimmed). The concatenation over calls equals the returned
        ``ServeResult.tokens``. Granularity is the segment, not the token
        — that is the server's host-sync cadence (one device round-trip
        per segment is what keeps decode at device speed).

        CANCELLATION (client disconnect): an ``on_tokens`` call returning
        ``False`` (exactly — ``None``, the usual no-return, streams on)
        cancels that request: the slot frees at that harvest point, its
        ``ServeResult`` carries the tokens delivered so far with
        ``cancelled=True``, and the lane is immediately available to the
        next admission. Tokens the slot decoded past the cancel point are
        dropped on the host; the device pipeline is untouched (a decode
        lane costs the same whether its tokens are kept or not, so there
        is nothing to claw back mid-segment)."""
        n = len(requests)
        arrivals = list(arrival_times or [0.0] * n)
        assert len(arrivals) == n and sorted(arrivals) == arrivals, (
            "arrival_times must be sorted"
        )
        results: List[Optional[ServeResult]] = [None] * n
        state = {"next": 0}

        def source(now, idle):
            i = state["next"]
            if i >= n:
                return "end", None
            # block for the next arrival only when the server is idle
            if arrivals[i] > now():
                if not idle:
                    return "wait", None
                time.sleep(arrivals[i] - now())
            state["next"] = i + 1
            return "req", (requests[i], i, on_tokens, arrivals[i])

        self._serve_loop(source, lambda res: results.__setitem__(
            res.request_id, res))
        assert all(r is not None for r in results)
        return results

    def _maybe_reuse_vision(self, req: dict) -> dict:
        """Swap a keyed request's pixels for its cached VideoFeatures (see
        vision_cache_slots). Runs on the serving-loop thread, which owns
        all jax dispatch — the encode lands in the same device queue as
        the admission's prefill."""
        req = dict(req)
        key = req.pop("video_key", None)
        if key is None or self.vision_cache_slots <= 0:
            return req
        if req.get("video_features") is not None:
            # caller pinned the features itself (eviction-proof strong ref,
            # e.g. the HTTP layer's cache peek) — just bump the LRU
            self.stats["vision_cache_hits"] += 1
            feats = req["video_features"]
            self._vision_cache.pop(key, None)
            self._vision_cache[key] = feats
            while len(self._vision_cache) > self.vision_cache_slots:
                self._vision_cache.pop(next(iter(self._vision_cache)))
            return req
        feats = self._vision_cache.pop(key, None)  # pop+reinsert = LRU bump
        self.stats["vision_cache_hits" if feats is not None
                   else "vision_cache_misses"] += 1
        if feats is None and req.get("pixel_values_videos") is not None:
            feats = self.engine.encode_video(
                req["pixel_values_videos"], req.get("video_grid_thw"),
                # keep in-flight lanes decoding during the encode, exactly
                # as the inline vision path inside generate() would
                on_dispatch=(self._on_prefill_dispatch
                             if self.interleave else None),
            )
        if feats is None:
            return req
        self._vision_cache[key] = feats
        while len(self._vision_cache) > self.vision_cache_slots:
            self._vision_cache.pop(next(iter(self._vision_cache)))
        req.pop("pixel_values_videos", None)
        req.pop("video_grid_thw", None)
        req["video_features"] = feats
        return req

    def _maybe_reuse_prefix(self, key, req: dict, req_max: int):
        """Return a cached (or freshly captured) VideoPrefix for ``key``,
        or None to take the inline path. Runs on the serving-loop thread.

        Miss + video content in the request => capture via encode_prefix
        (vision + the question-independent video prefill, once) and cache
        it; the admission then pays only the trailing text segment — and so
        does every later request with the same key. Token-exact: the engine
        re-validates the plan per question (PrefixMismatch on divergence,
        handled by the admission's inline fallback)."""
        if key is None or self.prefix_cache_slots <= 0 or self._prefix_disabled:
            return None
        if req.get("pixel_values") is not None:
            # mixed image+video prompts: image embeds ride OUTSIDE the
            # prefix artifact; take the inline path rather than reason about
            # image-segment placement relative to the captured video span
            return None
        vp = self._prefix_cache.pop(key, None)
        if vp is not None:
            self._prefix_cache[key] = vp  # pop+reinsert = LRU bump
            self.stats["prefix_cache_hits"] += 1
            return vp
        self.stats["prefix_cache_misses"] += 1
        if (req.get("pixel_values_videos") is None
                and req.get("video_features") is None):
            return None  # nothing to capture from (e.g. text-only request)
        try:
            vp = self.engine.encode_prefix(
                req["input_ids"], req.get("pixel_values_videos"),
                req.get("video_grid_thw"),
                video_features=req.get("video_features"),
                # size the captured budget for the server's LARGEST
                # per-request token allowance, so later requests with a
                # bigger max_new_tokens than this one still fit
                max_new_tokens=max(self.max_new, req_max),
                reserve_tokens=self.prefix_reserve,
                on_dispatch=(self._on_prefill_dispatch
                             if self.interleave else None),
            )
        except PrefixUnsupported:
            # config-level: prompt-guided compression folds the question
            # into every video chunk — no question-independent prefill
            # exists, so disable the cache for the server's lifetime.
            self.stats["prefix_capture_failures"] += 1
            self._prefix_disabled = True
            return None
        except ValueError:
            # prompt-shape-level (no video span / video span at the prompt
            # end): fails only THIS capture; later keys may still work.
            self.stats["prefix_capture_failures"] += 1
            return None
        self._prefix_cache[key] = vp
        while len(self._prefix_cache) > self.prefix_cache_slots:
            self._prefix_cache.pop(next(iter(self._prefix_cache)))
        return vp

    def start_online(self, max_queue: Optional[int] = None) -> "OnlineHandle":
        """Online mode: a worker thread runs the serving loop; callers
        ``submit()`` requests from any thread and get a Future[ServeResult]
        back (optionally with a per-request ``on_tokens`` streaming
        callback — same contract as ``run``, including cancel-on-False).
        ``close()`` stops admission, drains in-flight requests, and joins
        the worker. All device work stays on the worker thread.

        ``max_queue`` bounds the not-yet-admitted backlog: submit() raises
        queue.Full beyond it (backpressure; the HTTP layer maps it to 503).
        A request dict may carry ``deadline_s`` (seconds from submission):
        expired-in-queue requests are rejected without a prefill, and an
        in-flight request past its deadline is cancelled at the next
        harvest."""
        return OnlineHandle(self, max_queue=max_queue)

    def _serve_loop(self, source, emit_result, isolate_errors=False):
        """Shared serving loop. ``source(now, idle)`` returns
        ("req", (req_dict, request_id, on_tokens, arrival_s)) to admit,
        ("wait", None) when nothing is available right now, or
        ("end", None) once closed and empty (the loop then exits when the
        last in-flight request drains). ``emit_result(ServeResult)`` is
        called exactly once per admitted request.

        ``isolate_errors`` (online mode): an exception while admitting ONE
        request — a bad request dict, an over-budget video, an engine
        RESOURCE_EXHAUSTED — fails only that request (its ServeResult
        carries ``error``) and the loop keeps serving; the offline run()
        keeps fail-fast semantics (the bench protocol wants the traceback)."""
        slot_req: Dict[int, int] = {}  # slot -> request id
        slot_tokens: Dict[int, list] = {}
        slot_meta: Dict[int, dict] = {}
        ended = False
        t0 = time.perf_counter()
        now = lambda: time.perf_counter() - t0  # noqa: E731

        def free_slots():
            return [s for s in range(self.b) if s not in slot_req]

        def admit_ready():
            nonlocal ended
            while not ended:
                drain_staged()  # may free slots finished in blind segments
                if not free_slots():
                    return
                kind, payload = source(now, idle=not slot_req)
                if kind == "end":
                    ended = True
                    return
                if kind == "wait":
                    return
                req, rid, cb, arrival = payload
                req = dict(req)
                # per-request deadline (seconds from arrival): a request
                # whose deadline passed while QUEUED is rejected without
                # spending a prefill on it; in-flight expiry is enforced at
                # harvest (drain_staged) — the device pipeline itself is
                # never interrupted (a decode lane costs the same either way)
                deadline = req.pop("deadline_s", None)
                deadline = None if deadline is None else (
                    arrival + float(deadline))
                if deadline is not None and now() > deadline:
                    self.stats["requests_rejected_deadline"] += 1
                    emit_result(ServeResult(
                        request_id=rid, tokens=np.zeros(0, np.int32),
                        arrival_s=arrival, prefill_start_s=now(),
                        first_token_s=now(), finish_s=now(), cancelled=True,
                    ))
                    continue
                t_pf = now()
                try:
                    video_key = req.get("video_key")  # popped by the next call
                    req = self._maybe_reuse_vision(req)
                    # per-request token budget: a request may carry its own
                    # max_new_tokens (server default otherwise). The engine
                    # sizes the request's attention bucket from it, and the
                    # _admit assertion (attn_need <= p_bucket) re-checks the
                    # compaction-fold invariant final_len + max_new <= P.
                    req_max = int(req.get("max_new_tokens") or self.max_new)
                    hook = (self._on_prefill_dispatch
                            if self.interleave else None)
                    vp = self._maybe_reuse_prefix(video_key, req, req_max)
                    st = None
                    if vp is not None:
                        try:
                            st = self.engine.generate(
                                req["input_ids"], prefix=vp,
                                max_new_tokens=req_max, _prefill_only=True,
                                on_dispatch=hook,
                            )
                        except PrefixMismatch as pm:
                            # diverging plan (longer question, bigger token
                            # budget, ...): pay the inline prefill instead —
                            # correctness never depends on the cache. A
                            # pixel-less keyed request still has the video:
                            # the prefix's own features are the fallback.
                            self.stats["prefix_mismatch_fallbacks"] += 1
                            if (req.get("pixel_values_videos") is None
                                    and req.get("video_features") is None):
                                req["video_features"] = vp.features
                            if isinstance(pm, PrefixBudgetOverflow):
                                # the cached capture's budget was outgrown
                                # (this req_max exceeds every allowance seen
                                # at capture time): without eviction every
                                # later keyed request would fall back inline
                                # forever while the stale entry pins HBM.
                                # Evict + recapture NOW (same prefill cost as
                                # the inline fallback we were about to pay;
                                # _maybe_reuse_prefix sizes the new budget
                                # from max(self.max_new, req_max)).
                                self._prefix_cache.pop(video_key, None)
                                vp = self._maybe_reuse_prefix(
                                    video_key, req, req_max)
                                if vp is not None:
                                    self.stats[
                                        "prefix_budget_recaptures"] += 1
                                    try:
                                        st = self.engine.generate(
                                            req["input_ids"], prefix=vp,
                                            max_new_tokens=req_max,
                                            _prefill_only=True,
                                            on_dispatch=hook,
                                        )
                                    except PrefixMismatch:
                                        # still diverging: inline fallback
                                        # below (req has the features)
                                        self.stats[
                                            "prefix_mismatch_fallbacks"] += 1
                    if st is None:
                        st = self.engine.generate(
                            **{k: v for k, v in req.items()
                               if k != "max_new_tokens"},
                            max_new_tokens=req_max, _prefill_only=True,
                            on_dispatch=hook,
                        )
                    if (self.p_bucket is not None
                            and st.attn_need > self.p_bucket):
                        # the server's slot buffers were sized at the first
                        # admission; a request needing a bigger attention
                        # bucket (huge max_new_tokens / longer video than
                        # anything seen) can never fit THIS server instance.
                        # Raise here — inside the isolation try — so online
                        # mode fails one request instead of tripping the
                        # _admit assert and killing the worker thread.
                        raise ValueError(
                            f"request bucket {st.attn_need} exceeds server "
                            f"prefill bucket {self.p_bucket} (max_new_tokens"
                            " or video length too large for this server)"
                        )
                except Exception as e:
                    if not isolate_errors:
                        raise
                    # online mode: fail THIS request, keep the loop alive
                    self.stats["requests_failed"] = (
                        self.stats.get("requests_failed", 0) + 1)
                    emit_result(ServeResult(
                        request_id=rid, tokens=np.zeros(0, np.int32),
                        arrival_s=arrival, prefill_start_s=t_pf,
                        first_token_s=now(), finish_s=now(),
                        cancelled=True, error=f"{type(e).__name__}: {e}",
                    ))
                    continue
                # blind segments staged during THIS prefill predate the
                # admission — harvest them before the new tenant takes a slot
                drain_staged()
                if self.p_bucket is None:
                    self.p_bucket = st.attn_need
                if not hasattr(self, "k_all"):
                    self._init_buffers(st)
                slot = free_slots()[0]
                _sdbg("admit req", rid, "slot", slot, "f=", self.f_global)
                self._admit(slot, st, rid)
                self.slot_max[slot] = req_max
                slot_req[slot] = rid
                self.stats["requests_admitted"] += 1
                slot_tokens[slot] = [st.first_token_host]
                slot_meta[slot] = dict(
                    arrival=arrival, prefill_start=t_pf,
                    first_token=now(), on_tokens=cb, deadline=deadline,
                )
                ret = None
                if cb is not None:
                    ret = cb(rid, [int(st.first_token_host)])
                if self.done[slot]:  # EOS at first token: finish immediately
                    _finish(slot)  # (completion wins over a same-call cancel)
                elif ret is False:  # cancelled at first token
                    _finish(slot, cancelled=True)

        def _finish(slot, cancelled=False):
            i = slot_req.pop(slot)
            m = slot_meta.pop(slot)
            toks = slot_tokens.pop(slot)
            self.stats["requests_cancelled" if cancelled
                       else "requests_finished"] += 1
            self.stats["tokens_emitted"] += len(toks)
            emit_result(ServeResult(
                request_id=i,
                tokens=np.asarray(toks),
                arrival_s=m["arrival"], prefill_start_s=m["prefill_start"],
                first_token_s=m["first_token"], finish_s=now(),
                cancelled=cancelled,
            ))
            self.done[slot] = True
            self.final_len[slot] = 0
            self.dec_start[slot] = self.p_bucket + self.f_global

        def drain_staged(keep_last: int = 0):
            """Harvest staged segment tokens in dispatch order: extend each
            live slot's buffer, finish at EOS / token budget. During a
            prefill the hook drains with ``keep_last=1`` (lag-1 pipeline),
            so mid-admission completions stamp/free promptly."""
            _sdbg("drain keep", keep_last, "staged", len(self.staged),
                  "live", dict(slot_req))
            while len(self.staged) > keep_last:
                toks = np.asarray(self.staged.pop(0))  # [seg, B]
                _sdbg("harvest", toks.T.tolist())
                for slot in list(slot_req):
                    col = toks[:, slot]
                    buf = slot_tokens[slot]
                    req_id = slot_req[slot]
                    cb = slot_meta[slot]["on_tokens"]
                    dl = slot_meta[slot]["deadline"]
                    room = int(self.slot_max[slot]) - len(buf)
                    if room <= 0:
                        _finish(slot)
                        continue
                    col = col[:room]
                    eos = np.flatnonzero(col == self.cfg.eos_token_id)
                    if len(eos):
                        col = col[: eos[0] + 1]
                    buf.extend(col.tolist())
                    finished = bool(len(eos)) or (
                        len(buf) >= int(self.slot_max[slot])
                    )
                    ret = None
                    if cb is not None and len(col):
                        ret = cb(req_id, col.tolist())
                    if finished:
                        # completion wins over a same-chunk disconnect OR a
                        # same-segment deadline: the full stream was already
                        # decoded, so the result is a normal finish
                        _finish(slot)
                    elif dl is not None and now() > dl:
                        # deadline expired mid-stream: cancel, keeping the
                        # tokens decoded before the cutoff (just delivered)
                        _finish(slot, cancelled=True)
                    elif ret is False:  # client disconnected: free the lane
                        _finish(slot, cancelled=True)

        self._slot_req = slot_req  # the prefill-dispatch hook reads these
        self._drain = drain_staged
        try:
            while not ended or slot_req:
                admit_ready()
                if not slot_req:
                    continue
                if self.f_global + self.seg > self.gap_cap:
                    self._compact(self._counts())
                self._segment()
                drain_staged()
        finally:
            self._slot_req = None
            self._drain = None


class OnlineHandle:
    """Dynamic-submission front of a ContinuousServer (start_online).

    ``submit(request, on_tokens=None) -> Future[ServeResult]`` from any
    thread; the serving loop runs on ONE worker thread (all jax dispatch
    stays there). ``close()`` stops admission, waits for in-flight
    requests to drain, and joins the worker. Context-manager friendly.
    """

    def __init__(self, server: ContinuousServer,
                 max_queue: Optional[int] = None):
        import queue as _queue
        import threading

        self.server = server
        self.max_queue = max_queue
        self._q: "_queue.Queue" = _queue.Queue()
        self._futures: Dict[int, object] = {}
        self._next_id = 0
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def submit(self, request: dict, on_tokens=None):
        from concurrent.futures import Future

        with self._lock:
            if self._closed:
                raise RuntimeError("OnlineHandle is closed")
            if self.max_queue is not None and self._q.qsize() >= self.max_queue:
                import queue as _queue

                raise _queue.Full(
                    f"serving backlog at max_queue={self.max_queue}"
                )
            rid = self._next_id
            self._next_id += 1
            fut = Future()
            self._futures[rid] = fut
            # the put stays UNDER the lock: it orders every submission
            # before close()'s sentinel (a post-sentinel item would leave
            # its Future unresolved forever) and makes the qsize check
            # above atomic with the insertion (two concurrent submits
            # cannot both pass a max_queue bound with one free slot)
            self._q.put((request, rid, on_tokens, time.perf_counter()))
        return fut

    def close(self):
        with self._lock:
            if self._closed:
                self._thread.join()
                return
            self._closed = True
            self._q.put(None)  # wake the worker's blocking get; under the
            #   lock so no submission can slip in after the sentinel
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _work(self):
        import queue as _queue

        def source(now, idle):
            try:
                # busy: poll; idle: block until a request or the close
                # sentinel arrives (no device work is pending either way)
                item = self._q.get(block=idle)
            except _queue.Empty:
                return "wait", None
            if item is None:  # close(): stop admitting, drain in-flight
                return "end", None
            req, rid, cb, t_submit = item
            # submit wall-time on the loop's clock (t0 = perf_counter - now)
            arrival = t_submit - time.perf_counter() + now()
            return "req", (req, rid, cb, arrival)

        def emit(res: ServeResult):
            self._futures.pop(res.request_id).set_result(res)

        try:
            self.server._serve_loop(source, emit, isolate_errors=True)
            exc = RuntimeError("server closed before the request ran")
        except BaseException as e:  # worker died: fail pending futures
            exc = e
            raise
        finally:
            # no future may be left unresolved, and no submit() may target
            # a dead worker: close the handle (later submits raise instead
            # of hanging) and fail whatever futures remain
            with self._lock:
                self._closed = True
                futs, self._futures = self._futures, {}
            for f in futs.values():
                if not f.done():
                    f.set_exception(exc)
