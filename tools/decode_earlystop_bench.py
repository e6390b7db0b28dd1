"""TPU A/B: while_loop early-exit decode (config decode_early_stop) vs the
static scan.

Two operating points at 2B geometry, B=4, 64-frame requests, max_new=128:
  * no EOS (random weights): worst case — measures the while_loop's
    per-step overhead vs lax.scan at the full trip count.
  * forced EOS at ~8 tokens (eos rebound to an emitted token): best case —
    the loop should cut decode time ~max_new/answer_len while the scan
    pays all 127 steps.

MEASURED on-chip 2026-08-19: no-EOS while_loop overhead -1.5% (i.e. the
while_loop was marginally FASTER than the scan at the full trip count),
forced-EOS case cut decode as expected. decode_early_stop therefore
defaults to TRUE (utils/config.py cites this measurement). This bench
remains for re-validation after decode-path changes.
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
from retake_tpu.runtime.engine import Qwen2VLEngine, decode_batch
from retake_tpu.utils.config import RetakeConfig

print("devices:", jax.devices(), flush=True)


def time_decode(cfg, params, rt, reqs, max_new, early, n=3):
    eng = Qwen2VLEngine(cfg, params, rt)
    states = [eng.generate(**r, max_new_tokens=max_new, _prefill_only=True)
              for r in reqs]
    # compile
    decode_batch(eng.params, cfg, rt, list(states), max_new,
                 early_stop=early)
    best = float("inf")
    for _ in range(n):
        states = [eng.generate(**r, max_new_tokens=max_new,
                               _prefill_only=True) for r in reqs]
        t0 = time.perf_counter()
        out = decode_batch(eng.params, cfg, rt, list(states), max_new,
                           early_stop=early)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    rt = RetakeConfig.from_dict(bench.RETAKE_CONFIG)
    reqs = []
    for _ in range(4):
        ids, patches, grid = bench.build_request(cfg, num_frames=64)
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    max_new = 128

    t_scan, out = time_decode(cfg, params, rt, reqs, max_new, False)
    t_while, out_w = time_decode(cfg, params, rt, reqs, max_new, True)
    assert all(list(a.tokens) == list(b.tokens)
               for a, b in zip(out, out_w))
    rec = {
        "no_eos": {
            "scan_s": round(t_scan, 3), "while_s": round(t_while, 3),
            "while_overhead_pct":
                round((t_while / t_scan - 1.0) * 100, 1),
        }
    }
    print(json.dumps(rec), flush=True)

    # rebind EOS to a token the model emits early (simulates real-weight
    # short answers)
    eos2 = int(out[0].tokens[6])
    cfg2 = dataclasses.replace(cfg, eos_token_id=eos2)
    t_scan2, o2 = time_decode(cfg2, params, rt, reqs, max_new, False)
    t_while2, o2w = time_decode(cfg2, params, rt, reqs, max_new, True)
    assert all(list(a.tokens) == list(b.tokens) for a, b in zip(o2, o2w))
    rec["forced_eos"] = {
        "answer_lens": [len(r.tokens) for r in o2],
        "scan_s": round(t_scan2, 3), "while_s": round(t_while2, 3),
        "speedup": round(t_scan2 / t_while2, 2),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
