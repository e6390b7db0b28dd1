"""Engine-level A/B on real TPU: attn_implementation flash vs pallas.

2B geometry, 2048 frames, full retake config (the bench.py headline path).
Prints TTFT per impl (run 1 compiles, run 2 measures) + stage decomposition.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from retake_tpu.runtime.engine import Qwen2VLEngine  # noqa: E402
from retake_tpu.utils.config import RetakeConfig  # noqa: E402


def main():
    bench._wait_for_hbm(8)
    cfg, params = bench.build_model()
    ids, patches, grid = bench.build_request(cfg)
    for impl in sys.argv[1:] or ("flash", "pallas"):
        rc = json.loads(json.dumps(bench.RETAKE_CONFIG))
        rc["attn_implementation"] = impl
        engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(rc))
        t = bench.time_prefill(engine, ids, patches, grid)
        stages, cache_len = bench.profile_prefill(engine, ids, patches, grid)
        print(f"{impl}: ttft={t:.3f}s stages={stages} cache={cache_len}",
              flush=True)
        del engine


if __name__ == "__main__":
    main()
