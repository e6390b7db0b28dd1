"""Bisect the gapped-decode serving gap: OP-level the pallas kernel beats
the full-bucket einsum on mixed-length B=8 buckets (1.2-3.2x,
tools/decode_gapped_bench.py) yet LOSES ~2-3x inside the real serving
segment loop (tools/serve_bench.py --mixed_impl: bf16 B=4 311 vs 171
tok/s; int8 B=8 589 vs 177 — and the pallas arm is dtype-independent,
i.e. the extra cost is not HBM reads of the cache).

Hypothesis under test: engine._decode_loop_batch carries the full stacked
caches through the step scan and DUS-appends the new token each step.
The einsum path fuses the cache reads, so XLA proves the append can run
in place; a Mosaic custom call is opaque, so XLA's copy-insertion may be
materializing full-cache copies inside the loop body (write-after-read
on a buffer an opaque op consumes).

Arms, at real serving shapes (2B geometry, 40960+128 bucket):
  1. xla / pallas on the REAL engine._decode_loop_batch (cache carried,
     DUS append per step, donated like serve._segment);
  2. the same loop with the appends ABLATED (read-only caches) — if the
     pallas arm gets fast here, the copies come from the read+write
     aliasing, not from the kernel;
  3. compiled-HLO census: count `copy` ops on the full-cache shape in
     each program (printed per arm when the backend exposes HLO).

Run on the chip:  python tools/serve_decode_bisect.py [--batch 4]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse
import re
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
from retake_tpu.models.qwen2_vl import text
from retake_tpu.runtime.engine import _decode_loop_batch


@partial(
    jax.jit,
    donate_argnames=("k_all", "v_all"),
    static_argnames=("cfg", "num_steps", "attn_impl"),
)
def _decode_loop_nodus(
    params, cfg, k_all, v_all, base_t, pos_bases, final_len, gap_start,
    first_tokens, num_steps, dec_start, attn_impl,
):
    """engine._decode_loop_batch's scan body minus the KV appends —
    isolates the read+write aliasing from the kernel's own cost. Tokens
    are garbage after step 0 (the cache never sees the new tokens); only
    the per-step time is meaningful."""

    def body(carry, i):
        tokens, k_all, v_all = carry
        emb = text.embed(params, tokens)
        hidden, _kb, _vb = text.decode_step_batch(
            params, cfg, k_all, v_all, emb, base_t, pos_bases + i,
            final_len, gap_start, i, None, None, dec_start,
            attn_impl=attn_impl,
        )
        logits = text.final_logits_batch(params, cfg, hidden)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, k_all, v_all), nxt

    (_, k_all, v_all), tokens = jax.lax.scan(
        body, (first_tokens.astype(jnp.int32), k_all, v_all),
        jnp.arange(num_steps),
    )
    return tokens, (k_all, v_all)


def _cache_copies(compiled_text: str, dims: tuple) -> int:
    """Count copy ops on the full-cache shape in compiled HLO."""
    shape = ",".join(str(d) for d in dims)
    return len(re.findall(r"copy[^\n]*\[" + shape + r"\]", compiled_text)) \
        + len(re.findall(r"\[" + shape + r"\][^\n]*copy\(", compiled_text))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seg", type=int, default=16)
    p.add_argument("--reps", type=int, default=6, help="chained segment "
                   "calls per timing (donated caches feed forward)")
    p.add_argument("--bucket", type=int, default=40960 + 128)
    args = p.parse_args()

    print("devices:", jax.devices(), flush=True)
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()

    L = cfg.num_hidden_layers
    KV = cfg.num_key_value_heads
    D = cfg.hidden_size // cfg.num_attention_heads
    B, S = args.batch, args.bucket
    gap_start = S - 128

    def fresh_caches(key):
        kk, kv = jax.random.split(key)
        mk = jax.jit(lambda k: (jax.random.normal(
            k, (L, B, KV, S, D), jnp.bfloat16) * 0.05))
        return mk(kk), mk(kv)

    # serve-mixed tenant mix: three short, one long (like serve_bench)
    fl = [5056] * B
    fl[min(2, B - 1)] = 32768
    final_len = jnp.asarray(fl, jnp.int32)
    dec_start = jnp.full((B,), gap_start, jnp.int32)
    base_t = jnp.tile(final_len[None, :], (L, 1))
    pos_bases = final_len
    first = jnp.full((B,), 17, jnp.int32)

    dims = (L, B, KV, S, D)
    print(f"cache shape {dims} bf16 x2 = "
          f"{2 * np.prod(dims) * 2 / 2**30:.2f} GiB", flush=True)

    def run(tag, fn, impl, sync_each=False):
        k_all, v_all = fresh_caches(jax.random.key(0))
        # warm/compile
        toks, (k_all, v_all) = fn(k_all, v_all, impl)
        float(jnp.sum(toks[-1]))  # fence (tunnel-safe host read)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            toks, (k_all, v_all) = fn(k_all, v_all, impl)
            if sync_each:
                # serve-style: the harvest host-reads every segment's
                # tokens, serializing dispatch with the device — exposes
                # any per-dispatch executable overhead the async chain
                # hides
                np.asarray(toks)
        float(jnp.sum(toks[-1]))
        dt = time.perf_counter() - t0
        ms = dt / (args.reps * args.seg) * 1e3
        print(f"{tag:34s} {ms:7.2f} ms/step", flush=True)
        del k_all, v_all
        return ms

    def real_loop(k_all, v_all, impl):
        toks, (k_all, v_all, _, _) = _decode_loop_batch(
            params, cfg, k_all, v_all, base_t, pos_bases, final_len,
            jnp.int32(gap_start), first, args.seg,
            None, None, None, None,
            dec_start=dec_start, i0=jnp.int32(0),
            done0=jnp.zeros((B,), bool),
            step_off=jnp.zeros((B,), jnp.int32), attn_impl=impl,
        )
        return toks, (k_all, v_all)

    # serve._segment transfers FRESH host mirrors every call (numpy ->
    # jnp.array x6 [B]-vectors, [L,B] base_t, plus i0/gap scalars) and the
    # next segment's first token is the previous segment's device
    # tokens[-1]; mimic that exactly to expose any dispatch/transfer
    # interleaving cost the reused-arrays arms hide
    base_t_np = np.asarray(base_t)
    pos_np = np.asarray(pos_bases)
    fl_np = np.asarray(final_len)
    ds_np = np.asarray(dec_start)
    state = {"cur": first, "i0": 0}

    def faithful_loop(k_all, v_all, impl):
        toks, (k_all, v_all, _, _) = _decode_loop_batch(
            params, cfg, k_all, v_all,
            jnp.array(base_t_np), jnp.array(pos_np), jnp.array(fl_np),
            jnp.int32(gap_start), state["cur"], args.seg,
            None, None, None, None,
            dec_start=jnp.array(ds_np), i0=jnp.int32(state["i0"]),
            done0=jnp.array(np.zeros((B,), bool)),
            step_off=jnp.array(np.zeros((B,), np.int32)), attn_impl=impl,
        )
        state["cur"] = toks[-1]
        state["i0"] = 0  # keep the write window static across reps
        return toks, (k_all, v_all)

    def nodus_loop(k_all, v_all, impl):
        return _decode_loop_nodus(
            params, cfg, k_all, v_all, base_t, pos_bases, final_len,
            jnp.int32(gap_start), first, args.seg, dec_start, impl,
        )

    out = {}
    for impl in ("xla", "pallas"):
        out[f"{impl}_real"] = run(f"{impl} real loop (DUS append)",
                                  real_loop, impl)
        out[f"{impl}_nodus"] = run(f"{impl} append-ablated", nodus_loop,
                                   impl)
        out[f"{impl}_sync"] = run(f"{impl} real loop, host-synced",
                                  real_loop, impl, sync_each=True)
        state["cur"], state["i0"] = first, 0
        out[f"{impl}_faithful"] = run(
            f"{impl} serve-faithful (sync+xfers)", faithful_loop, impl,
            sync_each=True)

    # HLO copy census on the real loop (may be unavailable via tunnel)
    for impl in ("xla", "pallas"):
        try:
            k_all, v_all = fresh_caches(jax.random.key(1))
            lowered = _decode_loop_batch.lower(
                params, cfg, k_all, v_all, base_t, pos_bases, final_len,
                jnp.int32(gap_start), first, args.seg,
                None, None, None, None,
                dec_start=dec_start, i0=jnp.int32(0),
                done0=jnp.zeros((B,), bool),
                step_off=jnp.zeros((B,), jnp.int32), attn_impl=impl,
            )
            txt = lowered.compile().as_text()
            n = _cache_copies(txt, dims)
            print(f"{impl}: full-cache copy ops in compiled HLO: {n}",
                  flush=True)
            del k_all, v_all
        except Exception as e:  # noqa: BLE001
            print(f"{impl}: HLO census unavailable: {e}", flush=True)

    print(out, flush=True)


if __name__ == "__main__":
    main()
