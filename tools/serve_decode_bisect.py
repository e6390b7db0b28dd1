"""Bisect the gapped-decode serving behavior: isolated decode-loop arms
(async / append-ablated / host-synced / serve-faithful) plus an HLO
full-cache-copy census, at any bucket / batch / kv dtype / block size
(RETAKE_GAPPED_BLOCK_K). History of findings this tool produced — the
two geometry traps that had masked the kernel's serving win:

  * Round 4 (41088 bucket): the "pallas loses 2-3x" serving numbers were
    the unaligned bucket collapsing block_k to 128 (321 dense grid steps
    per (b, kv)); the bf16 23.4 ms TPOT reading was tunnel variance
    (timestamped serve trace: 14.7 ms steady).
  * Round 5 (43008, the server's real 2048-aligned bucket): int8 mode is
    violently sensitive to num_kb = S/block_k sitting on the fp32
    sublane tile — the scale planes reshape [...,S] -> [...,num_kb,BK]
    and an unaligned num_kb pads/strides that operand's (8,128) tiling:
    33-39 ms/step at nk 42/84/20/10 vs 8.0-9.3 at nk 24/48/40 (bf16 has
    no scale planes and is insensitive). An intermediate "VMEM
    supralinearity in BK" reading was a misattribution. Fix:
    decode_gapped._pick_block_k keeps nk % 8 == 0 in int8 mode.

Resolved end-to-end (serve_bench --mixed_impl, 2026-08-20): pallas wins
bf16 B=4 423.9 vs 302.7 tok/s and int8 B=8 736.9 vs 573.4.

Run on the chip:  python tools/serve_decode_bisect.py [--batch 8
--kv_dtype int8 --bucket 43008] [--impls pallas --arms real]
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
    donate_argnames=("k_all", "v_all", "ks_all", "vs_all"),
    static_argnames=("cfg", "num_steps", "attn_impl"),
)
def _decode_loop_nodus(
    params, cfg, k_all, v_all, ks_all, vs_all, base_t, pos_bases,
    final_len, gap_start, first_tokens, num_steps, dec_start, attn_impl,
):
    """engine._decode_loop_batch's scan body minus the KV appends —
    isolates the read+write aliasing from the kernel's own cost. Tokens
    are garbage after step 0 (the cache never sees the new tokens); only
    the per-step time is meaningful."""

    def body(carry, i):
        tokens, k_all, v_all, ks_all, vs_all = carry
        emb = text.embed(params, tokens)
        hidden, _kb, _vb = text.decode_step_batch(
            params, cfg, k_all, v_all, emb, base_t, pos_bases + i,
            final_len, gap_start, i, ks_all, vs_all, dec_start,
            attn_impl=attn_impl,
        )
        logits = text.final_logits_batch(params, cfg, hidden)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, k_all, v_all, ks_all, vs_all), nxt

    (_, k_all, v_all, ks_all, vs_all), tokens = jax.lax.scan(
        body,
        (first_tokens.astype(jnp.int32), k_all, v_all, ks_all, vs_all),
        jnp.arange(num_steps),
    )
    return tokens, (k_all, v_all, ks_all, vs_all)


def _cache_copies(compiled_text: str, dims: tuple, show=False) -> int:
    """Count copy ops on the full-cache shape in compiled HLO."""
    shape = ",".join(str(d) for d in dims)
    pat = (r"copy[^\n]*\[" + shape + r"\]",
           r"\[" + shape + r"\][^\n]*copy\(")
    n = 0
    for p in pat:
        for mm in re.finditer(p, compiled_text):
            n += 1
            if show:
                # locate the enclosing HLO computation for attribution
                head = compiled_text[: mm.start()]
                comp = re.findall(r"^(?:ENTRY )?%?([\w.\-]+) [^\n]*\{",
                                  head, re.M)
                line = compiled_text[
                    compiled_text.rfind("\n", 0, mm.start()) + 1:
                    compiled_text.find("\n", mm.end())].strip()
                print(f"    in {comp[-1] if comp else '?'}: {line[:200]}",
                      flush=True)
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seg", type=int, default=32)
    p.add_argument("--reps", type=int, default=6, help="chained segment "
                   "calls per timing (donated caches feed forward)")
    p.add_argument("--bucket", type=int, default=40960 + 128)
    p.add_argument("--kv_dtype", choices=["bf16", "int8"], default="bf16")
    p.add_argument("--census", action="store_true",
                   help="also compile-and-grep HLO for full-cache copies")
    p.add_argument("--census_only", action="store_true",
                   help="skip the timing arms (census implies compiles "
                        "only — cheap attribution rerun)")
    p.add_argument("--model", choices=["2b", "7b"], default="2b",
                   help="7b: Qwen2-VL-7B geometry (28q/4kv heads, int8 "
                        "weights — bf16 7B does not fit 16 GB; pair with "
                        "--kv_dtype int8 --batch 4: the 4-kv-head cache "
                        "at B=8/43008 alone is 9.2 GB int8)")
    p.add_argument("--impls", default="xla,pallas",
                   help="comma list — run a subset (block_k sweeps only "
                        "need the pallas arms)")
    p.add_argument("--arms", default="real,nodus,sync,faithful",
                   help="comma list of timing arms — 'real' alone halves "
                        "the compile count for block_k sweeps (tunnel "
                        "compiles vary 20 s - 5 min per program)")
    args = p.parse_args()

    print("devices:", jax.devices(), flush=True)
    bench._wait_for_hbm(8)
    if args.model == "7b":
        from retake_tpu.models.qwen2_vl import params as params_lib
        from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig

        cfg = Qwen2VLConfig()  # 7B defaults
        params = params_lib.init_params(
            cfg, seed=0, quantize_int8=True, quantize_vit_int8=True
        )
    else:
        cfg, params = bench.build_model()

    L = cfg.num_hidden_layers
    KV = cfg.num_key_value_heads
    D = cfg.hidden_size // cfg.num_attention_heads
    B, S = args.batch, args.bucket
    gap_start = S - 128
    quant = args.kv_dtype == "int8"

    def fresh_caches(key):
        kk, kv = jax.random.split(key)
        if quant:
            mk = jax.jit(lambda k: jax.random.randint(
                k, (L, B, KV, S, D), -127, 128, jnp.int8))
            ms = jax.jit(lambda k: jax.random.uniform(
                k, (L, B, KV, S), jnp.float32, 0.01, 0.05))
            sk, sv = jax.random.split(jax.random.fold_in(key, 7))
            return mk(kk), mk(kv), ms(sk), ms(sv)
        mk = jax.jit(lambda k: (jax.random.normal(
            k, (L, B, KV, S, D), jnp.bfloat16) * 0.05))
        return mk(kk), mk(kv), None, None

    # serve-mixed tenant mix: one long, the rest short (like serve_bench)
    fl = [5056] * B
    fl[min(2, B - 1)] = 32768
    final_len = jnp.asarray(fl, jnp.int32)
    dec_start = jnp.full((B,), gap_start, jnp.int32)
    base_t = jnp.tile(final_len[None, :], (L, 1))
    pos_bases = final_len
    first = jnp.full((B,), 17, jnp.int32)

    dims = (L, B, KV, S, D)
    bytes_el = 1 if quant else 2
    print(f"cache shape {dims} {args.kv_dtype} x2 = "
          f"{2 * np.prod(dims) * bytes_el / 2**30:.2f} GiB", flush=True)

    def run(tag, fn, impl, sync_each=False):
        caches = fresh_caches(jax.random.key(0))
        # warm/compile
        toks, caches = fn(caches, impl)
        float(jnp.sum(toks[-1]))  # fence (tunnel-safe host read)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            toks, caches = fn(caches, impl)
            if sync_each:
                # serve-style: the harvest host-reads every segment's
                # tokens, serializing dispatch with the device
                np.asarray(toks)
        float(jnp.sum(toks[-1]))
        dt = time.perf_counter() - t0
        ms = dt / (args.reps * args.seg) * 1e3
        print(f"{tag:34s} {ms:7.2f} ms/step", flush=True)
        del caches
        return ms

    def real_loop(caches, impl):
        k_all, v_all, ks_all, vs_all = caches
        toks, caches = _decode_loop_batch(
            params, cfg, k_all, v_all, base_t, pos_bases, final_len,
            jnp.int32(gap_start), first, args.seg,
            None, None, ks_all, vs_all,
            dec_start=dec_start, i0=jnp.int32(0),
            done0=jnp.zeros((B,), bool),
            step_off=jnp.zeros((B,), jnp.int32), attn_impl=impl,
        )
        return toks, caches

    def nodus_loop(caches, impl):
        k_all, v_all, ks_all, vs_all = caches
        return _decode_loop_nodus(
            params, cfg, k_all, v_all, ks_all, vs_all, base_t, pos_bases,
            final_len, jnp.int32(gap_start), first, args.seg, dec_start,
            impl,
        )

    # serve._segment transfers FRESH host mirrors every call (numpy ->
    # jnp.array x6 [B]-vectors, [L,B] base_t, plus i0/gap scalars) and the
    # next segment's first token is the previous segment's device
    # tokens[-1]; mimic that exactly to expose any dispatch/transfer
    # interleaving cost the reused-arrays arms hide
    base_t_np = np.asarray(base_t)
    pos_np = np.asarray(pos_bases)
    fl_np = np.asarray(final_len)
    ds_np = np.asarray(dec_start)
    state = {"cur": first}

    def faithful_loop(caches, impl):
        k_all, v_all, ks_all, vs_all = caches
        toks, caches = _decode_loop_batch(
            params, cfg, k_all, v_all,
            jnp.array(base_t_np), jnp.array(pos_np), jnp.array(fl_np),
            jnp.int32(gap_start), state["cur"], args.seg,
            None, None, ks_all, vs_all,
            dec_start=jnp.array(ds_np), i0=jnp.int32(0),
            done0=jnp.array(np.zeros((B,), bool)),
            step_off=jnp.array(np.zeros((B,), np.int32)), attn_impl=impl,
        )
        state["cur"] = toks[-1]
        return toks, caches

    arms = args.arms.split(",")
    out = {}
    for impl in ([] if args.census_only else args.impls.split(",")):
        if "real" in arms:
            out[f"{impl}_real"] = run(f"{impl} real loop (DUS append)",
                                      real_loop, impl)
        if "nodus" in arms:
            out[f"{impl}_nodus"] = run(f"{impl} append-ablated", nodus_loop,
                                       impl)
        if "sync" in arms:
            out[f"{impl}_sync"] = run(f"{impl} real loop, host-synced",
                                      real_loop, impl, sync_each=True)
        if "faithful" in arms:
            state["cur"] = first
            out[f"{impl}_faithful"] = run(
                f"{impl} serve-faithful (sync+xfers)", faithful_loop, impl,
                sync_each=True)

    if args.census or args.census_only:
        for impl in args.impls.split(","):
            for tag, low in (
                ("real", lambda c: _decode_loop_batch.lower(
                    params, cfg, c[0], c[1], base_t, pos_bases,
                    final_len, jnp.int32(gap_start), first, args.seg,
                    None, None, c[2], c[3],
                    dec_start=dec_start, i0=jnp.int32(0),
                    done0=jnp.zeros((B,), bool),
                    step_off=jnp.zeros((B,), jnp.int32), attn_impl=impl)),
                ("nodus", lambda c: _decode_loop_nodus.lower(
                    params, cfg, c[0], c[1], c[2], c[3], base_t, pos_bases,
                    final_len, jnp.int32(gap_start), first, args.seg,
                    dec_start, impl)),
            ):
                try:
                    caches = fresh_caches(jax.random.key(1))
                    txt = low(caches).compile().as_text()
                    n = _cache_copies(txt, dims, show=True)
                    print(f"{impl} [{tag}]: full-cache copy ops in "
                          f"compiled HLO: {n}", flush=True)
                    del caches
                except Exception as e:  # noqa: BLE001
                    print(f"{impl} [{tag}]: HLO census unavailable: {e}",
                          flush=True)

    print(out, flush=True)


if __name__ == "__main__":
    main()
