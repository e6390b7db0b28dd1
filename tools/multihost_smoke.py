"""Two-process multi-host eval smoke: executes the REAL distributed path.

The reference runs its eval as one NCCL process per GPU
(/root/reference/retake/infer_eval.py:149-157,199-201: init_process_group,
rank round-robin, all_gather merge). The TPU rework's equivalent —
``eval/infer_eval._init_distributed`` (jax.distributed.initialize with a
coordinator), ``run_eval`` round-robin sharding, the
``multihost_utils.sync_global_devices`` barrier, and rank-0
``merge_and_score`` — cannot run multi-host in this one-chip image, but it
CAN run as two OS processes on the CPU backend (4 virtual devices each,
8 global). This script does exactly that:

  parent: writes a 4-sample synthetic VideoMME benchmark, picks a free
          port, spawns two workers, checks the merged artifacts.
  worker: ``--process_id k``: jax.distributed.initialize(localhost:port,
          num_processes=2) through the real ``_init_distributed`` branch,
          evaluates its round-robin shard with a tiny random-weight engine,
          barriers, and (rank 0) merges + scores.

Run:  python tools/multihost_smoke.py            (wired into tests/ too)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


def _write_benchmark(root: str) -> str:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    annos = []
    for v in range(4):
        vdir = os.path.join(root, f"vid{v}")
        os.makedirs(vdir, exist_ok=True)
        base = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
        for i in range(12):
            Image.fromarray(np.roll(base, i * 3, axis=1)).save(
                os.path.join(vdir, f"{i:06d}.jpg")
            )
        annos.append({
            "messages": [
                {"role": "user", "content": f"<video>Question {v}? A. x B. y"},
                {"role": "assistant", "content": "AB"[v % 2]},
            ],
            "videos": [vdir],
            "meta": json.dumps({
                "task_type": "t1", "domain": "d",
                "duration": ["short", "medium", "long", "short"][v],
                "question": f"Question {v}?",
            }),
        })
    anno_file = os.path.join(root, "anno.json")
    with open(anno_file, "w") as f:
        json.dump(annos, f)
    return anno_file


def _worker(args) -> None:
    # CPU backend with 4 virtual devices per process (8 global) — must be
    # set before the first backend touch; the axon plugin pins jax_platforms
    # so the config update (not the env var) is required (CLAUDE.md)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from retake_tpu.data.datasets import BaseDataset
    from retake_tpu.data.processor import Qwen2VLProcessor
    from retake_tpu.eval import infer_eval
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    # the REAL branch under test
    rank, world = infer_eval._init_distributed(args)
    assert world == args.num_processes, (rank, world)
    assert jax.device_count() == 4 * args.num_processes, jax.device_count()
    print(f"[worker {rank}] jax.distributed up: "
          f"{jax.process_count()} processes, {jax.device_count()} devices",
          flush=True)

    class StubTokenizer:
        def encode(self, s):
            return [20 + (b % 400) for b in s.encode()][:64]

        def decode(self, ids, **kw):
            return "ABCD"[int(sum(ids)) % 4]

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    rt = RetakeConfig.from_dict({
        "dataset_name": "videomme",
        "max_new_tokens": 4,
        "output_dir": os.path.join(args.dir, "results"),
        "longvideo_kwargs": {"chunked_prefill_frames": 4,
                             "frame_chunk_size": 4},
    })
    engine = Qwen2VLEngine(cfg, params, rt)
    processor = Qwen2VLProcessor(
        StubTokenizer(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        min_pixels=1,
    )
    dataset = BaseDataset(
        os.path.join(args.dir, "anno.json"),
        processor_kwargs=dict(
            video_fps=4, video_maxlen=8, image_resolution=84,
            video_frame_extraction_fps=2,
        ),
    )
    done = infer_eval.run_eval(
        engine, processor, dataset, rt, rank, world, resume=True
    )
    assert sorted(done) == [i for i in range(4) if i % world == rank]
    infer_eval._barrier(args)  # the real sync_global_devices barrier
    if rank == 0:
        eval_df, infer_df = infer_eval.merge_and_score(rt, world)
        assert len(infer_df) == 4, len(infer_df)
    print(f"[worker {rank}] OK", flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--dir", type=str, default=None)
    args = p.parse_args()

    if args.worker:
        _worker(args)
        return 0

    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    with tempfile.TemporaryDirectory() as tmp:
        _write_benchmark(tmp)
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--coordinator", f"localhost:{port}",
                 "--num_processes", "2", "--process_id", str(k),
                 "--dir", tmp],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for k in range(2)
        ]
        outs = [pr.communicate(timeout=600)[0] for pr in procs]
        for k, (pr, out) in enumerate(zip(procs, outs)):
            if pr.returncode != 0:
                print(f"--- worker {k} output ---\n{out}")
                print(json.dumps({"multihost_smoke": "FAIL", "worker": k}))
                return 1
        out_dir = os.path.join(tmp, "results")
        arts = ["anno_id2result.json", "infer_results.csv",
                "eval_results.csv", "shard_000.jsonl", "shard_001.jsonl"]
        missing = [a for a in arts if not os.path.exists(
            os.path.join(out_dir, a))]
        if missing:
            print(json.dumps(
                {"multihost_smoke": "FAIL", "missing": missing}))
            return 1
        with open(os.path.join(out_dir, "anno_id2result.json")) as f:
            merged = json.load(f)
    print(json.dumps({
        "multihost_smoke": "PASS",
        "processes": 2, "devices_per_process": 4,
        "samples_merged": len(merged),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
