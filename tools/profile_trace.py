"""Capture an XLA/XProf trace of one generate() for TensorBoard analysis.

The always-on layer is utils/profiling.StageTimer (RETAKE_PROFILE=1); this
tool adds kernel-level traces: view with
``tensorboard --logdir <out>`` -> Profile tab, or xprof.

Usage:
  python tools/profile_trace.py --frames 256 --out /tmp/retake_trace
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--out", type=str, default="/tmp/retake_trace")
    p.add_argument("--max_new_tokens", type=int, default=16)
    args = p.parse_args()

    import jax

    import bench as b
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg, params = b.build_model()
    ids, patches, grid = b.build_request(cfg, num_frames=args.frames)
    engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(b.RETAKE_CONFIG))

    # warm all compiles outside the trace
    engine.generate(ids, patches, grid, max_new_tokens=args.max_new_tokens)

    with jax.profiler.trace(args.out):
        r = engine.generate(
            ids, patches, grid, max_new_tokens=args.max_new_tokens
        )
    print(
        f"trace written to {args.out} | prefill {r.prefill_seconds:.2f}s "
        f"decode {r.decode_seconds:.2f}s"
    )


if __name__ == "__main__":
    main()
