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
