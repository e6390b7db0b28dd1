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

Greedy only: sampled draws depend on batch-slot history, which continuous
admission makes arrival-order-dependent — refuse rather than silently
produce irreproducible draws.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from retake_tpu.runtime.engine import (
    PrefillState,
    _attn_bucket,
    _decode_loop_batch,
    _insert_batch_slot,
)


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
    exceeds it is rejected at admission.
    """

    def __init__(
        self,
        engine,
        batch_slots: int = 4,
        segment_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        prefill_bucket: Optional[int] = None,
        gap_capacity: Optional[int] = None,
    ):
        if engine.retake.do_sample:
            raise NotImplementedError(
                "continuous batching is greedy-only: sampled draws would "
                "depend on arrival order / slot packing"
            )
        self.engine = engine
        self.cfg = getattr(engine.cfg, "text", engine.cfg)
        self.b = int(batch_slots)
        self.seg = int(segment_steps)
        self.max_new = int(max_new_tokens or engine.retake.max_new_tokens)
        self.p_bucket = prefill_bucket  # resolved at first admission
        self.gap_cap = int(gap_capacity or max(4 * self.seg, 128))

    # ---------- internal device/host state ----------

    def _init_buffers(self, st: PrefillState):
        cache = st.cache
        l, kv, _, d = cache.k.shape
        s_attn = self.p_bucket + self.gap_cap
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
        self.cur_tok = np.zeros(self.b, np.int32)
        self.done = np.ones(self.b, bool)  # free slots decode as done
        self.f_global = 0  # decode steps since last compaction

    def _admit(self, slot: int, st: PrefillState, req_id: int):
        cache = st.cache
        assert st.attn_need <= self.p_bucket, (
            f"request bucket {st.attn_need} exceeds server prefill bucket "
            f"{self.p_bucket}"
        )
        s_attn = self.p_bucket + self.gap_cap
        pad = s_attn - cache.k.shape[2]
        k = jnp.pad(cache.k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(cache.v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        self.k_all = _insert_batch_slot(self.k_all, k, jnp.int32(slot))
        self.v_all = _insert_batch_slot(self.v_all, v, jnp.int32(slot))
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
        self.cur_tok[slot] = st.first_token_host
        self.done[slot] = st.first_token_host == self.cfg.eos_token_id

    def _segment(self) -> np.ndarray:
        """Run ``seg`` decode steps; returns tokens [seg, B]."""
        tokens, (self.k_all, self.v_all, self.ks_all, self.vs_all) = (
            _decode_loop_batch(
                self.engine.params, self.cfg,
                self.k_all, self.v_all,
                jnp.asarray(self.base_t), jnp.asarray(self.pos_rest),
                jnp.asarray(self.final_len), jnp.int32(self.p_bucket),
                jnp.asarray(self.cur_tok), self.seg,
                None, None, self.ks_all, self.vs_all,
                dec_start=jnp.asarray(self.dec_start),
                i0=jnp.int32(self.f_global),
                done0=jnp.asarray(self.done),
            )
        )
        self.f_global += self.seg
        return np.asarray(tokens)

    def _compact(self, counts: np.ndarray):
        self.k_all, self.v_all, self.ks_all, self.vs_all = _compact_gap(
            self.k_all, self.v_all, self.ks_all, self.vs_all,
            jnp.asarray(self.final_len), jnp.asarray(self.dec_start),
            jnp.asarray(counts), jnp.int32(self.p_bucket),
        )
        self.final_len = self.final_len + counts.astype(np.int32)
        self.dec_start[:] = self.p_bucket
        # row0 = base + F: F resets, fold the consumed F into the bases
        self.base_t = self.base_t + np.int32(self.f_global)
        self.pos_rest = self.pos_rest + np.int32(self.f_global)
        self.f_global = 0

    # ---------- the serving loop ----------

    def run(
        self,
        requests: List[dict],
        arrival_times: Optional[List[float]] = None,
    ) -> List[ServeResult]:
        """Serve ``requests`` (engine.generate kwargs) arriving at
        ``arrival_times`` (seconds from start; None = all at t=0). Runs in
        real time: a request is only visible to the server once the wall
        clock passes its arrival time. Returns per-request results with
        queueing/TTFT/latency breakdowns, in request order."""
        n = len(requests)
        arrivals = list(arrival_times or [0.0] * n)
        assert len(arrivals) == n and sorted(arrivals) == arrivals, (
            "arrival_times must be sorted"
        )
        results: List[Optional[ServeResult]] = [None] * n
        slot_req: Dict[int, int] = {}  # slot -> request index
        slot_tokens: Dict[int, list] = {}
        slot_meta: Dict[int, dict] = {}
        next_req = 0
        t0 = time.perf_counter()
        now = lambda: time.perf_counter() - t0  # noqa: E731

        def free_slots():
            return [s for s in range(self.b) if s not in slot_req]

        def admit_ready():
            nonlocal next_req
            while next_req < n and free_slots():
                # block for the next arrival only when the server is idle
                if arrivals[next_req] > now():
                    if slot_req:
                        return
                    time.sleep(arrivals[next_req] - now())
                t_pf = now()
                req = requests[next_req]
                st = self.engine.generate(
                    **{k: v for k, v in req.items() if k != "max_new_tokens"},
                    max_new_tokens=self.max_new, _prefill_only=True,
                )
                if self.p_bucket is None:
                    self.p_bucket = st.attn_need
                if not hasattr(self, "k_all"):
                    self._init_buffers(st)
                slot = free_slots()[0]
                self._admit(slot, st, next_req)
                slot_req[slot] = next_req
                slot_tokens[slot] = [st.first_token_host]
                slot_meta[slot] = dict(
                    arrival=arrivals[next_req], prefill_start=t_pf,
                    first_token=now(),
                )
                if self.done[slot]:  # EOS at first token: finish immediately
                    _finish(slot)
                next_req += 1

        def _finish(slot):
            i = slot_req.pop(slot)
            m = slot_meta.pop(slot)
            results[i] = ServeResult(
                request_id=i,
                tokens=np.asarray(slot_tokens.pop(slot)),
                arrival_s=m["arrival"], prefill_start_s=m["prefill_start"],
                first_token_s=m["first_token"], finish_s=now(),
            )
            self.done[slot] = True
            self.final_len[slot] = 0
            self.dec_start[slot] = self.p_bucket + self.f_global

        while next_req < n or slot_req:
            admit_ready()
            if not slot_req:
                continue
            if self.f_global + self.seg > self.gap_cap:
                counts = np.zeros(self.b, np.int32)
                for s, _ in slot_req.items():
                    counts[s] = len(slot_tokens[s]) - 1
                self._compact(counts)
            toks = self._segment()  # [seg, B]
            t_seg = now()
            for slot in list(slot_req):
                col = toks[:, slot]
                buf = slot_tokens[slot]
                room = self.max_new - len(buf)
                col = col[:room]
                eos = np.flatnonzero(col == self.cfg.eos_token_id)
                if len(eos):
                    buf.extend(col[: eos[0] + 1].tolist())
                    _finish(slot)
                    continue
                buf.extend(col.tolist())
                self.cur_tok[slot] = buf[-1]
                if len(buf) >= self.max_new:
                    _finish(slot)
            del t_seg
        assert all(r is not None for r in results)
        return results
