"""TTFT / TPOT measurement, mirroring the reference protocol.

Reference (scripts/utils/cal_ttft.py:211-239): TTFT = average wall time of
``generate(max_new_tokens=1)`` over 5 runs with the first discarded; TPOT =
(time for 512 new tokens - TTFT) / 511. Runs on the local TPU chip against a
checkpoint (or random weights with --random-weights for infrastructure
timing).

Usage:
  python tools/cal_ttft.py --config configs/retake_demo.yaml \
      [--hf_path /path/to/ckpt | --random-weights] [--frames 256]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", type=str, default=None)
    p.add_argument("--config", type=str, default="configs/retake_demo.yaml")
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--tpot_tokens", type=int, default=512)
    p.add_argument("--random-weights", action="store_true")
    args = p.parse_args()

    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    rt = RetakeConfig.from_yaml(args.config)
    if args.random_weights or not args.hf_path:
        import bench as b

        cfg, params = b.build_model()
        ids, patches, grid = b.build_request(cfg, num_frames=args.frames)
    else:
        from retake_tpu.data.processor import Qwen2VLProcessor
        from retake_tpu.models.qwen2_vl import params as params_lib
        from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig

        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params = params_lib.load_safetensors(args.hf_path, cfg)
        # reference protocol (scripts/utils/cal_ttft.py:182-188): a synthetic
        # 448px-long-side video goes through the real processor (resize /
        # normalize / patchify on host), and the tokenizer builds the prompt
        # — NOT the bench's pre-patchified token stream
        processor = Qwen2VLProcessor.from_pretrained(args.hf_path)
        rng = np.random.default_rng(0)
        video = rng.integers(
            0, 256, size=(args.frames, 252, 448, 3), dtype=np.uint8
        )
        inputs = processor("Describe the video.", video)
        ids = inputs["input_ids"]
        patches = inputs["pixel_values_videos"]
        grid = inputs["video_grid_thw"]

    engine = Qwen2VLEngine(cfg, params, rt)

    # TTFT: first run warms the compile caches and is discarded
    times = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        engine.generate(ids, patches, grid, max_new_tokens=1)
        times.append(time.perf_counter() - t0)
    ttft = float(np.mean(times[1:]))
    print(f"TTFT @ {args.frames} frames: {ttft:.3f}s "
          f"(runs: {[round(t, 2) for t in times]})")

    # TPOT from one long generation
    t0 = time.perf_counter()
    r = engine.generate(ids, patches, grid, max_new_tokens=args.tpot_tokens)
    total = time.perf_counter() - t0
    n = len(r.tokens)
    tpot = (total - ttft) / max(n - 1, 1)
    print(f"TPOT: {tpot*1000:.1f} ms/token ({n} tokens in {total:.2f}s)")


if __name__ == "__main__":
    main()
