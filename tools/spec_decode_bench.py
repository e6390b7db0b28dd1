"""TPU A/B: prompt-lookup speculative decoding (config spec_decode) vs the
s=1 scan, 2B geometry, 64-frame requests.

Two questions only the chip can answer:
  1. verify-step cost: the s=draft+1 chunk should price like one s=1 step
     (decode is HBM-bound on weight reads) — measured as ms/VERIFY-STEP on
     a no-acceptance stream (tok/step 1.0 worst case).
  2. end-to-end tok/s with acceptance: random-weight greedy streams that
     enter cycles (seeds chosen to accept in tests) give a conservative
     acceptance floor; real checkpoints (answers quoting the prompt)
     accept far more.

Decision rule: if the no-acceptance overhead is <15%, spec_decode is safe
to recommend for long-form generation configs (MLVU summarization).
"""
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import dataclasses
import json
import time

import jax

import bench
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.utils.config import RetakeConfig

print("devices:", jax.devices(), flush=True)


def run(engine, req, max_new, n=3):
    engine.generate(**req, max_new_tokens=max_new)  # compile
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = engine.generate(**req, max_new_tokens=max_new)
        dt = time.perf_counter() - t0
        if best is None or out.decode_seconds < best[0].decode_seconds:
            best = (out, dt)
    return best[0]


def main():
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    rt = RetakeConfig.from_dict(bench.RETAKE_CONFIG)
    rt_spec = dataclasses.replace(rt, spec_decode=True)
    eng = Qwen2VLEngine(cfg, params, rt)
    eng_s = Qwen2VLEngine(cfg, params, rt_spec)
    max_new = 128
    ids, patches, grid = bench.build_request(cfg, num_frames=64)
    req = dict(input_ids=ids, pixel_values_videos=patches,
               video_grid_thw=grid)
    a = run(eng, req, max_new)
    b = run(eng_s, req, max_new)
    # Parity proper is tools/onchip/smoke_spec.py (fp32-pinned, seeds with
    # verified acceptance). Random 2B-geometry bf16 weights sit on argmax
    # near-ties, and the s=draft+1 verify chunk has a different fp
    # reduction order than the s=1 step, so a single ulp flip mid-stream
    # is expected here (observed on-chip 2026-08-19 at position ~93) and
    # each stream stays self-consistent greedy. Timing is what this bench
    # measures; require only a sane common prefix.
    ta, tb = list(a.tokens), list(b.tokens)
    prefix = next((i for i, (x, y) in enumerate(zip(ta, tb)) if x != y),
                  min(len(ta), len(tb)))
    # Full agreement of a short pair (both hit EOS early) is fine; only a
    # genuine early divergence is suspicious.
    assert prefix >= min(16, min(len(ta), len(tb))), (prefix, ta[:24], tb[:24])
    tps = (b.stages or {}).get("spec_tokens_per_step", 1.0)
    # After divergence the streams can EOS at different lengths; normalize
    # each arm by ITS OWN token count.
    n_tok_a = max(len(ta) - 1, 1)
    n_tok = max(len(tb) - 1, 1)
    rec = {
        "scan_ms_tok": round(a.decode_seconds / n_tok_a * 1e3, 2),
        "spec_ms_tok": round(b.decode_seconds / n_tok * 1e3, 2),
        "tok_per_verify_step": tps,  # 1.0 = pure overhead measurement
        "spec_ms_verify_step": round(
            b.decode_seconds / max(n_tok / tps, 1) * 1e3, 2),
        "speedup": round((a.decode_seconds / n_tok_a)
                         / (b.decode_seconds / n_tok), 2),
        "prefix_agree": prefix,
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
