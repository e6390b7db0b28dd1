"""Batched-serving decode throughput curve (generate_batch) on the real chip.

Measures aggregate decode tokens/s at B=1/2/4/8 with 64-frame 2B requests.
Reference point (v5e, gap-layout caches): 185 / 340 / 569 / 923 tok/s.
Decode is HBM-bound on weight reads at batch 1; batching amortizes the
weight stream until the batch's combined KV reads take over.
"""

import numpy as np

import jax

import bench
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.utils.config import RetakeConfig


def main():
    print("devices:", jax.devices(), flush=True)
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    eng = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(bench.RETAKE_CONFIG))

    reqs = []
    for _ in range(8):
        ids, patches, grid = bench.build_request(cfg, num_frames=64)
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))

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


if __name__ == "__main__":
    main()
