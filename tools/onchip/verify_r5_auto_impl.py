"""On-chip verify: ContinuousServer's decode_attn_impl="auto" default
resolves to the gapped pallas kernel on the TPU backend and serves
correctly end-to-end.

Checks (2B random weights, 64-frame requests):
  1. auto resolves to "pallas" on the chip (and the server runs with it);
  2. 8 requests serve to completion with no errors;
  3. token agreement vs an explicit decode_attn_impl="xla" server on the
     SAME requests — flash-order reduction may diverge within ulps, so
     this reports the agreement fraction instead of asserting equality
     (report: expect ~1.0 at random-weight logit gaps).

NB the decode_tok_s fields here are a ~400-token toy workload and NOT a
perf A/B — a 2026-08-21 run read pallas 43 vs xla 60 tok/s while the
amortized decode loop at the same 10240 bucket measured them dead even
(7.82 vs 7.92 ms/step, serve_decode_bisect --bucket 10240 --arms real).
Small-batch wall clock through the tunnel flips run-to-run (CLAUDE.md
round-3 facts); use serve_bench/serve_decode_bisect for perf claims.

Run: python tools/onchip/verify_r5_auto_impl.py
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import json
import time

import numpy as np

import bench
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.serve import ContinuousServer
from retake_tpu.utils.config import RetakeConfig


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    eng = Qwen2VLEngine(cfg, params,
                        RetakeConfig.from_dict(dict(bench.RETAKE_CONFIG)))

    rng = np.random.default_rng(0)
    ids0, patches, grid = bench.build_request(cfg, num_frames=64)
    reqs = []
    for i in range(8):
        ids = ids0.copy()
        ids[-32:] = rng.integers(10, 1000, size=32)
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))

    out = {}
    toks = {}
    for label, kw in (("auto", {}), ("xla", {"decode_attn_impl": "xla"})):
        server = ContinuousServer(eng, batch_slots=4, segment_steps=16,
                                  max_new_tokens=48, **kw)
        if label == "auto":
            assert server.decode_attn_impl == "pallas", (
                f"auto resolved to {server.decode_attn_impl!r} on "
                f"{jax.default_backend()!r}"
            )
        server.run([dict(r) for r in reqs[:2]])  # warm compiles
        t0 = time.perf_counter()
        res = server.run([dict(r) for r in reqs])
        wall = time.perf_counter() - t0
        assert all(not r.error for r in res)
        assert all(len(r.tokens) > 0 for r in res)
        n_tok = sum(len(r.tokens) for r in res)
        out[label] = {"resolved_impl": server.decode_attn_impl,
                      "decode_tok_s": round(n_tok / wall, 1),
                      "wall_s": round(wall, 2)}
        toks[label] = [np.asarray(r.tokens) for r in res]

    agree = [
        float(np.mean(a[: min(len(a), len(b))]
                      == b[: min(len(a), len(b))]))
        for a, b in zip(toks["auto"], toks["xla"])
    ]
    out["token_agreement"] = round(float(np.mean(agree)), 4)
    print("VERIFY_R5_AUTO_IMPL", json.dumps(out), flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
