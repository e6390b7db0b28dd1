"""Verify on the real TPU: ContinuousServer prefix_cache_slots.

2B geometry, 64-frame keyed requests: the first admission captures a
VideoPrefix, later same-key requests skip vision AND the video prefill.
Checks token parity vs solo generate and reports the admission-side TTFT
drop (request wall time from arrival, single tenant at a time).
"""
from __future__ import annotations

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import json

import numpy as np

import jax

print("devices:", jax.devices(), flush=True)

import bench
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.serve import ContinuousServer
from retake_tpu.utils.config import RetakeConfig


def main():
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    eng = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(bench.RETAKE_CONFIG))
    ids, patches, grid = bench.build_request(cfg, num_frames=64)
    vid_end = int(np.where(ids == cfg.vision_end_token_id)[0][0])
    rng = np.random.default_rng(7)

    def q_ids():
        q = rng.integers(10, 1000, size=48).astype(np.int64)
        return np.concatenate([ids[: vid_end + 1], q])

    prompts = [ids, q_ids(), q_ids(), q_ids()]
    solo = [eng.generate(p, patches, grid, max_new_tokens=8).tokens
            for p in prompts]

    server = ContinuousServer(
        eng, batch_slots=2, segment_steps=8, max_new_tokens=8,
        prefix_cache_slots=1,
    )
    reqs = [dict(input_ids=p, pixel_values_videos=patches,
                 video_grid_thw=grid, video_key="vid0") for p in prompts]
    # pixel-less re-ask: the hot prefix carries the video
    reqs.append(dict(input_ids=prompts[1], video_key="vid0"))
    results = server.run(reqs)
    for i, res in enumerate(results):
        want = solo[i] if i < 4 else solo[1]
        assert np.array_equal(res.tokens, want), (i, res.tokens, want)
    st = server.stats
    assert st["prefix_cache_misses"] == 1 and st["prefix_cache_hits"] == 4, st
    assert st["prefix_mismatch_fallbacks"] == 0, st
    ttfts = [round(r.ttft_s, 3) for r in results]
    print(json.dumps({
        "ttft_capture_s": ttfts[0],
        "ttft_reuse_s": ttfts[1:],
        "parity": "exact", "stats": {k: v for k, v in st.items()
                                     if k.startswith("prefix")},
    }), flush=True)
    print("PASS serve prefix cache on TPU", flush=True)


if __name__ == "__main__":
    main()
