"""Checkpoint-gate stage: ONE golden question through the ONLINE serving
path (runtime/http_server over a real socket).

The demo/eval stages validate the engine; serving adds its own moving
parts (continuous batching, segment harvest, vision cache, worker thread).
This stage proves the question a user would actually POST returns the
golden answer through that whole stack.

With --hf_path: loads the checkpoint + real processor, requires the first
demo golden answer ("A"). With --tiny: tiny random geometry + stub
tokenizer — a CPU-fast dry-run that only requires the request to round-trip
(tokens non-empty, HTTP 200, /metrics sane); used by the gate's own tests.
"""
from __future__ import annotations

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse
import json
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", default=None)
    p.add_argument("--config", default="configs/retake_demo.yaml")
    p.add_argument("--video", default=None,
                   help="server-local video file or frame dir; synthesized "
                        "frames when omitted (tiny mode only)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.tiny:
        # CPU dry-run: the axon plugin pins jax_platforms="axon,cpu" —
        # force CPU before first backend use (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from demo import DEMO_QUESTIONS, EXPECTED_ANSWERS, _StubTokenizer
    from retake_tpu.data.processor import Qwen2VLProcessor
    from retake_tpu.data.scorers import trim_answer
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.runtime.http_server import RetakeHTTPServer
    from retake_tpu.utils.config import RetakeConfig

    rt = RetakeConfig.from_yaml(args.config)

    video_path = args.video
    if args.tiny:
        import jax.numpy as jnp

        from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG

        cfg = TINY_TEST_CONFIG
        params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
        processor = Qwen2VLProcessor(
            _StubTokenizer(),
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
            video_token_id=cfg.video_token_id,
            patch_size=cfg.vision.patch_size,
            merge_size=cfg.vision.spatial_merge_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            min_pixels=1,
        )
        if video_path is None:
            # synthesize a frame dir (the HTTP API loads server-local paths)
            import tempfile

            from PIL import Image

            d = tempfile.mkdtemp(prefix="gate_http_")
            rng = np.random.default_rng(0)
            for i in range(8):
                Image.fromarray(
                    rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
                ).save(_os.path.join(d, f"{i:06d}.jpg"))
            video_path = d
    else:
        assert args.hf_path and args.video, "--hf_path and --video required"
        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params = params_lib.load_safetensors(args.hf_path, cfg)
        processor = Qwen2VLProcessor.from_pretrained(args.hf_path)

    engine = Qwen2VLEngine(cfg, params, rt)
    srv = RetakeHTTPServer(
        engine, processor, rt, port=0, batch_slots=2, segment_steps=4,
        max_new_tokens=rt.max_new_tokens, vision_cache_slots=1,
    )
    srv.start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        body = json.dumps({
            "question": DEMO_QUESTIONS[0],
            "video_path": video_path,
            "extraction_fps": 2 if args.tiny else 25,
        }).encode()
        req = urllib.request.Request(
            base + "/v1/generate", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=3600).read())
        metrics = json.loads(
            urllib.request.urlopen(base + "/metrics", timeout=60).read()
        )
    finally:
        srv.shutdown()

    answer = trim_answer(resp.get("text", ""))
    rec = {
        "answer": answer,
        "expected": EXPECTED_ANSWERS[0],
        "n_tokens": len(resp.get("tokens", [])),
        "ttft_s": resp.get("ttft_s"),
        "served_total": metrics.get("requests_finished"),
        "ok": (
            bool(resp.get("tokens")) and not resp.get("cancelled")
            if args.tiny
            else answer == EXPECTED_ANSWERS[0]
        ),
    }
    print(json.dumps(rec), flush=True)
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
