"""Serving benchmarks on the real chip.

1. Batched decode throughput curve (generate_batch) at B=1/2/4/8 with
   64-frame 2B requests. Reference point (v5e, gap-layout caches):
   185 / 340 / 569 / 923 tok/s. Decode is HBM-bound on weight reads at
   batch 1; batching amortizes the weight stream until the batch's
   combined KV reads take over.
2. ``--poisson``: continuous batching (runtime/serve.ContinuousServer) vs
   static accumulate-then-decode batching on the SAME seeded Poisson
   arrival trace — per-request latency percentiles + aggregate tok/s.
   Static batching makes a late arrival wait for the current batch to
   decode to completion; continuous admission bounds that wait at one
   decode segment + its own prefill.
"""
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse
import json
import time

import numpy as np

import jax

import bench
from retake_tpu.runtime.engine import Qwen2VLEngine, decode_batch
from retake_tpu.runtime.serve import ContinuousServer
from retake_tpu.utils.config import RetakeConfig


def throughput_curve(eng, reqs):
    r = eng.generate(**reqs[0], max_new_tokens=64)  # compile
    r = eng.generate(**reqs[0], max_new_tokens=64)
    tok = len(r.tokens) - 1
    print(f"B=1: {tok / r.decode_seconds:7.1f} tok/s "
          f"({r.decode_seconds / tok * 1e3:.2f} ms/tok)", flush=True)
    for b in (2, 4, 8):
        eng.generate_batch(reqs[:b], max_new_tokens=64)  # compile
        out = eng.generate_batch(reqs[:b], max_new_tokens=64)
        n = sum(len(x.tokens) - 1 for x in out)
        dt = out[0].decode_seconds
        print(f"B={b}: {n / dt:7.1f} tok/s "
              f"({dt / (n / b) * 1e3:.2f} ms/step)", flush=True)


def _trace(n, mean_interval_s, seed=0):
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(mean_interval_s, size=n)
    gaps[0] = 0.0
    return np.cumsum(gaps).tolist()


def _stats(name, lat, ttft, n_tokens, wall):
    rec = {
        "mode": name,
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "ttft_p50_s": round(float(np.percentile(ttft, 50)), 3),
        "ttft_p95_s": round(float(np.percentile(ttft, 95)), 3),
        "decode_tok_s": round(n_tokens / wall, 1),
        "wall_s": round(wall, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_static(eng, reqs, arrivals, bs, max_new):
    """Accumulate-then-decode (the eval-harness batching): prefill each
    request as it arrives; decode when ``bs`` states are pending (or at
    trace end). A late arrival waits for the in-flight decode."""
    t0 = time.perf_counter()
    now = lambda: time.perf_counter() - t0  # noqa: E731
    lat, ttft, finished = [], [], 0
    pending = []  # (idx, state)

    def flush():
        nonlocal finished
        if not pending:
            return
        idxs, states = zip(*pending)
        res = decode_batch(
            eng.params, eng.cfg, eng.retake, list(states), max_new,
        )
        t = now()
        for i, r in zip(idxs, res):
            lat.append(t - arrivals[i])
            finished += len(r.tokens)
        pending.clear()

    for i, req in enumerate(reqs):
        while arrivals[i] > now():
            time.sleep(min(0.01, arrivals[i] - now()))
        st = eng.generate(**req, max_new_tokens=max_new, _prefill_only=True)
        ttft.append(now() - arrivals[i])
        pending.append((i, st))
        if len(pending) >= bs:
            flush()
    flush()
    return _stats("static_batch", lat, ttft, finished, now())


def run_continuous(eng, reqs, arrivals, bs, max_new):
    server = ContinuousServer(
        eng, batch_slots=bs, segment_steps=16, max_new_tokens=max_new,
    )
    t0 = time.perf_counter()
    results = server.run(reqs, arrival_times=arrivals)
    wall = time.perf_counter() - t0
    lat = [r.latency_s for r in results]
    ttft = [r.ttft_s for r in results]
    n_tok = sum(len(r.tokens) for r in results)
    return _stats("continuous", lat, ttft, n_tok, wall)


def run_long_admission(eng, max_new=192):
    """Interleaved-chunked-prefill A/B: a short request is mid-decode when
    a 2048-frame request (~14 s prefill) gets admitted. With interleave
    off, the short request's remaining decode stalls for the whole long
    prefill; with front-loaded interleaving (4 segments per prefill-chunk
    dispatch) its remaining segments execute early in the admission
    window. NOTE the device is serial (tools/overlap_ablation.py): the
    knob redistributes latency between tenants — the long request's TTFT
    grows by roughly what the short request's latency saves."""
    import bench as b

    short = dict(zip(
        ("input_ids", "pixel_values_videos", "video_grid_thw"),
        b.build_request(eng.cfg, num_frames=64),
    ))
    long_req = dict(zip(
        ("input_ids", "pixel_values_videos", "video_grid_thw"),
        b.build_request(eng.cfg, num_frames=2048),
    ))
    out = {}
    # prefill_bucket must cover the LONG request's decode bucket (the
    # default resolves from the first admission — the short request)
    kw = dict(batch_slots=2, segment_steps=16, max_new_tokens=max_new,
              prefill_bucket=32768 + 8192)
    for label, inter, ph in (("interleave_off", False, 1),
                             ("interleave_on_x4", True, 4)):
        server = ContinuousServer(
            eng, interleave_prefill=inter,
            interleave_segments_per_hook=ph, **kw,
        )
        server.run([dict(short), dict(long_req)])  # compile both paths
        server = ContinuousServer(
            eng, interleave_prefill=inter,
            interleave_segments_per_hook=ph, **kw,
        )
        res = server.run([dict(short), dict(long_req)],
                         arrival_times=[0.0, 0.3])
        out[label] = {
            "short_latency_s": round(res[0].latency_s, 3),
            "long_ttft_s": round(res[1].ttft_s, 3),
            "long_latency_s": round(res[1].latency_s, 3),
        }
        print(json.dumps({label: out[label]}), flush=True)
    stall_off = out["interleave_off"]["short_latency_s"]
    stall_on = out["interleave_on_x4"]["short_latency_s"]
    print(json.dumps({
        "short_request_speedup_under_long_admission":
            round(stall_off / stall_on, 2),
    }), flush=True)


def run_mixed_decode_impl(eng, max_new=256, impls=("xla", "pallas"),
                          batch_slots=4):
    """End-to-end serving TPOT A/B for the dead-block-skipping decode
    kernel: mixed-length tenants (64-frame and 1024-frame requests) under
    ONE long shared bucket, steady-state decode, decode_attn_impl xla vs
    pallas. The kernel's HBM reads track each slot's live regions instead
    of B x bucket (tools/decode_gapped_bench.py measures the op alone;
    this measures the whole serving step). ``batch_slots`` scales the
    tenant mix (one 1024-frame long tenant, the rest 64-frame): larger B
    raises the dead fraction — the kernel's win case per the op-level
    bench — while the XLA arm's reads grow with B x bucket."""
    import bench as b

    names = ("input_ids", "pixel_values_videos", "video_grid_thw")
    frames = [64] * batch_slots
    frames[min(2, batch_slots - 1)] = 1024
    reqs = [dict(zip(names, b.build_request(eng.cfg, num_frames=f)))
            for f in frames]
    kw = dict(batch_slots=batch_slots, segment_steps=32,
              max_new_tokens=max_new,
              prefill_bucket=32768 + 8192, interleave_prefill=False)
    out = {}
    for impl in impls:
        ContinuousServer(eng, decode_attn_impl=impl, **kw).run(
            [dict(r) for r in reqs])  # compile
        server = ContinuousServer(eng, decode_attn_impl=impl, **kw)
        t0 = time.perf_counter()
        res = server.run([dict(r) for r in reqs])
        wall = time.perf_counter() - t0
        n_tok = sum(len(r.tokens) for r in res)
        # steady-state decode time = wall minus the serial prefill span
        # (last first_token_s); segments dominate afterwards
        t_prefill = max(r.first_token_s for r in res)
        dec_s = wall - t_prefill
        out[impl] = {
            "decode_tok_s": round(n_tok / dec_s, 1),
            "tpot_ms": round(dec_s / (n_tok / len(res)) * 1e3, 2),
            "wall_s": round(wall, 2),
        }
        print(json.dumps({impl: out[impl]}), flush=True)
    if "xla" in out and "pallas" in out:
        print(json.dumps({
            "pallas_decode_speedup":
                round(out["pallas"]["decode_tok_s"]
                      / out["xla"]["decode_tok_s"], 3),
        }), flush=True)


def _vp_bytes(vp):
    """Hand-accounted HBM pinned by one cached VideoPrefix (cache +
    features): memory_stats() is unavailable through the axon tunnel, so
    leak checks must count bytes themselves."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves((vp.cache, vp.features)):
        if hasattr(leaf, "dtype") and hasattr(leaf, "size"):
            total += int(leaf.size) * leaf.dtype.itemsize
    return total


def run_prefix_ab(eng, n_videos=8, q_per_video=3, slots=4, batch_slots=4,
                  mean_interval_s=0.5, max_new=32, seed=0):
    """Serving prefix-cache load test (round-4 VERDICT #3): the eval
    workload shape — q_per_video consecutive questions per video (VideoMME
    asks 3; reference recomputes the whole video prefill per question,
    reference qwen2_vl.py:670-720) — under Poisson arrivals, with
    ``prefix_cache_slots`` on vs off on the SAME trace.

    Per arm: throughput, latency/TTFT percentiles, the server's prefix
    stats, and hand-accounted pinned HBM (entries x cache+embeds bytes —
    memory_stats() is tunnel-unavailable). Asserts the stats invariants:
    every keyed admission is a hit or a miss, one miss (capture) per video
    while its entry is resident, and the cache never exceeds its slots.
    Run with --n_videos 60+ for a soak (hundreds of requests, LRU churn
    when slots < n_videos exercises entry create/release)."""
    rng = np.random.default_rng(seed)
    ids0, patches, grid = bench.build_request(eng.cfg, num_frames=64)
    reqs = []
    for v in range(n_videos):
        for _ in range(q_per_video):
            ids = ids0.copy()
            ids[-48:] = rng.integers(10, 1000, size=48)  # fresh question
            reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                             video_grid_thw=grid, video_key=f"vid{v}"))
    arrivals = _trace(len(reqs), mean_interval_s, seed)

    kw = dict(batch_slots=batch_slots, segment_steps=16,
              max_new_tokens=max_new)
    # warm every jit off-trace: inline prefill + decode (off arm), capture +
    # suffix-only prefill (on arm). Same engine => shared compile caches.
    warm = [dict(r) for r in reqs[: max(2, q_per_video)]]
    ContinuousServer(eng, prefix_cache_slots=1, **kw).run(warm)
    ContinuousServer(eng, prefix_cache_slots=0, **kw).run(warm[:1])

    out = {}
    for label, s in (("prefix_off", 0), ("prefix_on", slots)):
        server = ContinuousServer(eng, prefix_cache_slots=s, **kw)
        t0 = time.perf_counter()
        res = server.run([dict(r) for r in reqs], arrival_times=arrivals)
        wall = time.perf_counter() - t0
        errs = [r.error for r in res if r.error]
        assert not errs, errs[:3]
        n_tok = sum(len(r.tokens) for r in res)
        rec = _stats(label, [r.latency_s for r in res],
                     [r.ttft_s for r in res], n_tok, wall)
        st = server.stats
        rec["prefix_stats"] = {k: v for k, v in st.items()
                               if k.startswith("prefix")}
        # ---- invariants (VERDICT #3) ----
        assert st["requests_admitted"] == len(reqs)
        if s > 0:
            keyed = st["prefix_cache_hits"] + st["prefix_cache_misses"]
            assert keyed >= len(reqs), (keyed, len(reqs))  # recaptures add
            assert st["prefix_capture_failures"] == 0, st
            # grouped arrivals: one capture per video while resident; LRU
            # churn (slots < n_videos) only ever RE-captures on a new group
            assert st["prefix_cache_misses"] == n_videos, st
            assert len(server._prefix_cache) <= s
            pinned = sum(_vp_bytes(vp)
                         for vp in server._prefix_cache.values())
            rec["pinned_hbm_mb"] = round(pinned / 2**20, 1)
            rec["pinned_entries"] = len(server._prefix_cache)
            print(json.dumps({"pinned_hbm_mb": rec["pinned_hbm_mb"],
                              "pinned_entries": rec["pinned_entries"]}),
                  flush=True)
        else:
            assert st["prefix_cache_hits"] == st["prefix_cache_misses"] == 0
        out[label] = rec
    print(json.dumps({
        "prefix_throughput_speedup": round(
            out["prefix_on"]["decode_tok_s"]
            / out["prefix_off"]["decode_tok_s"], 2),
        "prefix_ttft_p50_speedup": round(
            out["prefix_off"]["ttft_p50_s"]
            / out["prefix_on"]["ttft_p50_s"], 2),
        "prefix_latency_p95_speedup": round(
            out["prefix_off"]["latency_p95_s"]
            / out["prefix_on"]["latency_p95_s"], 2),
    }), flush=True)
    return out


def run_soak(eng, n=200, n_videos=5, batch_slots=4, max_new=32, seed=0):
    """On-chip serving soak (round-4 VERDICT #4): n online requests through
    one start_online worker with cancels (every 13th), queued-expired
    deadlines (every 17th), keyed prefix + vision caches, compaction, and
    early-stop decode, then the invariant sweep the CPU soak test pins
    (tests/test_serve.py::test_online_soak_invariants): every future
    resolves, stats balance, caches stay bounded, pinned HBM is
    hand-accounted (memory_stats() is tunnel-unavailable)."""
    rng = np.random.default_rng(seed)
    ids0, patches, grid = bench.build_request(eng.cfg, num_frames=64)
    server = ContinuousServer(
        eng, batch_slots=batch_slots, segment_steps=16,
        max_new_tokens=max_new, prefix_cache_slots=2, vision_cache_slots=2,
    )
    futures, kinds = [], []
    t0 = time.perf_counter()
    with server.start_online() as handle:
        for i in range(n):
            ids = ids0.copy()
            ids[-48:] = rng.integers(10, 1000, size=48)
            req = dict(input_ids=ids, pixel_values_videos=patches,
                       video_grid_thw=grid,
                       video_key=f"v{(i // 3) % n_videos}")
            if i % 17 == 5:
                futures.append(handle.submit(dict(req, deadline_s=0.0)))
                kinds.append("deadline")
            elif i % 13 == 7:
                futures.append(handle.submit(
                    req, on_tokens=lambda rid, toks: False))
                kinds.append("cancel")
            else:
                futures.append(handle.submit(req))
                kinds.append("normal")
        results = [f.result(timeout=3600) for f in futures]
        tail = handle.submit(dict(input_ids=ids0,
                                  pixel_values_videos=patches,
                                  video_grid_thw=grid,
                                  video_key="v0")).result(timeout=600)
    wall = time.perf_counter() - t0
    assert not tail.cancelled and not tail.error
    st = server.stats
    n_kind = {k: kinds.count(k) for k in set(kinds)}
    assert len(results) == n
    assert st["requests_rejected_deadline"] == n_kind["deadline"]
    assert st["requests_admitted"] == n + 1 - n_kind["deadline"]
    assert (st["requests_finished"] + st["requests_cancelled"]
            == st["requests_admitted"])
    assert st["tokens_emitted"] == (
        sum(len(r.tokens) for r in results) + len(tail.tokens))
    for r, k in zip(results, kinds):
        if k == "deadline":
            assert r.cancelled and len(r.tokens) == 0
        elif k == "cancel":
            assert r.cancelled or len(r.tokens) == 1  # EOS-at-first wins
        else:
            assert not r.cancelled and not r.error and len(r.tokens) >= 1
    assert len(server._prefix_cache) <= 2
    assert st["prefix_capture_failures"] == 0
    assert (st["prefix_cache_hits"] + st["prefix_cache_misses"]
            == st["requests_admitted"])
    pinned = sum(_vp_bytes(vp) for vp in server._prefix_cache.values())
    normal = [r for r, k in zip(results, kinds) if k == "normal"]
    print(json.dumps({
        "soak": {
            "requests": n, "wall_s": round(wall, 1),
            "decode_tok_s": round(st["tokens_emitted"] / wall, 1),
            "latency_p95_s": round(float(np.percentile(
                [r.latency_s for r in normal], 95)), 3),
            "stats": st,
            "pinned_hbm_mb": round(pinned / 2**20, 1),
            "invariants": "ok",
        },
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--poisson", action="store_true",
                   help="continuous-vs-static A/B on a Poisson trace")
    p.add_argument("--mixed_impl", action="store_true",
                   help="mixed-length tenants: decode_attn_impl xla vs "
                        "pallas end-to-end serving TPOT")
    p.add_argument("--impl", choices=["xla", "pallas", "both"],
                   default="both",
                   help="mixed_impl arm selection: run ONE impl per process "
                        "(the two arms' servers pin too much HBM to share "
                        "a 16 GB client — OOM observed 2026-08-19)")
    p.add_argument("--prefix", action="store_true",
                   help="serving prefix-cache A/B + soak: q_per_video "
                        "questions per video under Poisson arrivals, "
                        "prefix_cache_slots on vs off, stats invariants + "
                        "hand-accounted pinned HBM")
    p.add_argument("--n_videos", type=int, default=8)
    p.add_argument("--q_per_video", type=int, default=3)
    p.add_argument("--prefix_slots", type=int, default=4)
    p.add_argument("--soak", action="store_true",
                   help="online serving soak: n_requests through "
                        "start_online with cancels/deadlines/caches, "
                        "invariant sweep at the end")
    p.add_argument("--long_admission", action="store_true",
                   help="interleaved-prefill A/B: short request decoding "
                        "while a 512-frame request is admitted")
    p.add_argument("--n_requests", type=int, default=12)
    p.add_argument("--mean_interval_s", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max_new", type=int, default=64)
    p.add_argument("--kv_dtype", choices=["bf16", "int8"], default="bf16",
                   help="kv_cache_dtype for the engine: int8 halves cache "
                        "HBM (bf16 mixed_impl OOMs past --batch 4 at the "
                        "41k shared bucket) and is the gapped kernel's "
                        "best op-level case")
    args = p.parse_args()

    print("devices:", jax.devices(), flush=True)
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    retake_cfg = dict(bench.RETAKE_CONFIG)
    if args.kv_dtype == "int8":
        retake_cfg["kv_cache_dtype"] = "int8"
    eng = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(retake_cfg))

    reqs = []
    for _ in range(max(8, args.n_requests)):
        ids, patches, grid = bench.build_request(cfg, num_frames=64)
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))

    if args.soak:
        run_soak(eng, n=max(args.n_requests, 50), batch_slots=args.batch,
                 max_new=args.max_new)
        return
    if args.prefix:
        run_prefix_ab(
            eng, n_videos=args.n_videos, q_per_video=args.q_per_video,
            slots=args.prefix_slots, batch_slots=args.batch,
            mean_interval_s=args.mean_interval_s, max_new=args.max_new,
        )
        return
    if args.long_admission:
        run_long_admission(eng)
        return
    if args.mixed_impl:
        impls = ("xla", "pallas") if args.impl == "both" else (args.impl,)
        run_mixed_decode_impl(eng, impls=impls, batch_slots=args.batch)
        return
    if not args.poisson:
        throughput_curve(eng, reqs)
        return

    reqs = reqs[: args.n_requests]
    arrivals = _trace(args.n_requests, args.mean_interval_s)
    # warm both paths' compiles off-trace (prefill, batched decode, segment)
    warm = [dict(r) for r in reqs[: args.batch]]
    eng.generate_batch(warm, max_new_tokens=args.max_new)
    ContinuousServer(
        eng, batch_slots=args.batch, segment_steps=16,
        max_new_tokens=args.max_new,
    ).run(warm)
    static = run_static(eng, reqs, arrivals, args.batch, args.max_new)
    cont = run_continuous(eng, reqs, arrivals, args.batch, args.max_new)
    print(json.dumps({
        "latency_p50_speedup": round(
            static["latency_p50_s"] / cont["latency_p50_s"], 2),
        "latency_p95_speedup": round(
            static["latency_p95_s"] / cont["latency_p95_s"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
