"""Checkpoint-gate stage: decode-kernel serving parity (xla vs pallas).

``decode_attn_impl="auto"`` resolves to the gapped-decode Pallas kernel on
accelerators (serving A/B 2026-08-20: pallas 423.9 vs xla 302.7 tok/s at
bf16 B=4 — tools/serve_decode_bisect.py / serve_bench --mixed_impl). The
kernel's flash-order reduction is NOT bit-exact vs the einsum path, so a
quantized-argmax flip is possible in principle; this stage proves it does
not change ANSWERS. All three demo questions are served through
ContinuousServer twice — once per impl — with batch_slots=2 so admissions
overlap and the gapped (mixed-fill) decode path is actually exercised.

With --hf_path: both impls must produce the golden letters A, B, C — the
reference's acceptance granularity (/root/reference/demo.py:158-164,220).
With --tiny: tiny random geometry on the CPU backend (interpret-mode
pallas); random weights sit at ulp knife edges where the flash-order
reduction flips argmaxes, so the criterion is both impls running to
completion with aggregate token agreement >= 0.7 — the same tolerance the
serving pallas wiring tests use (tests/test_serve.py).
"""
from __future__ import annotations

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", default=None)
    p.add_argument("--config", default="configs/retake_demo.yaml")
    p.add_argument("--video", default=None,
                   help="video file or frame dir; synthesized frames when "
                        "omitted (tiny mode only)")
    p.add_argument("--max_new_tokens", type=int, default=None,
                   help="override the config budget (tiny mode trims it)")
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
    from retake_tpu.data.video import fetch_video
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.runtime.serve import ContinuousServer
    from retake_tpu.utils.config import RetakeConfig

    rt = RetakeConfig.from_yaml(args.config)

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
    else:
        assert args.hf_path, "--hf_path required unless --tiny"
        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params = params_lib.load_safetensors(args.hf_path, cfg)
        processor = Qwen2VLProcessor.from_pretrained(args.hf_path)

    if args.video:
        frames = fetch_video(
            args.video, rt.max_num_frames, rt.sample_fps,
            rt.longsize_resolution,
        )
    else:
        assert args.tiny, "--video required with --hf_path"
        rng = np.random.default_rng(0)
        frames = [
            rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
            for _ in range(8)
        ]

    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for question in DEMO_QUESTIONS:
        inputs = processor(question, frames)
        reqs.append({k: v for k, v in inputs.items() if v is not None})

    max_new = args.max_new_tokens or (8 if args.tiny else rt.max_new_tokens)
    streams = {}
    for impl in ("xla", "pallas"):
        server = ContinuousServer(
            engine, batch_slots=2, segment_steps=4, max_new_tokens=max_new,
            decode_attn_impl=impl,
        )
        results = server.run([dict(r) for r in reqs])
        streams[impl] = [list(map(int, r.tokens)) for r in results]

    answers = {
        impl: [trim_answer(processor.tokenizer.decode(t)) for t in toks]
        for impl, toks in streams.items()
    }
    agree = total = 0
    for a, b in zip(streams["xla"], streams["pallas"]):
        n = min(len(a), len(b))
        agree += sum(int(x == y) for x, y in zip(a[:n], b[:n]))
        total += max(len(a), len(b))
    rec = {
        "answers_xla": answers["xla"],
        "answers_pallas": answers["pallas"],
        "expected": list(EXPECTED_ANSWERS),
        "token_exact": streams["xla"] == streams["pallas"],
        "token_agreement": round(agree / max(total, 1), 4),
    }
    if args.tiny:
        rec["ok"] = (
            all(streams["xla"]) and all(streams["pallas"])
            and rec["token_agreement"] >= 0.7
        )
        rec["note"] = "tiny smoke: golden answers not applicable"
    else:
        rec["ok"] = (
            answers["xla"] == answers["pallas"] == list(EXPECTED_ANSWERS)
        )
    print(json.dumps(rec), flush=True)
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
