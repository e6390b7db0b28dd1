"""End-to-end demo: long-video QA with ReTaKe-TPU.

Counterpart of the reference demo (demo.py:167-220): loads a config, a
Qwen2-VL checkpoint, samples a video at the configured fps/resolution, and
answers the three golden multiple-choice questions (expected A, B, C).

Without a local checkpoint (this environment has no network egress), pass
--random-weights to smoke-test the full pipeline on random weights at real
geometry — tokens are meaningless but every stage (ViT chunking, DPSelect,
chunked prefill, PivotKV, decode) executes.

Usage:
  python demo.py --hf_path /path/to/Qwen2-VL-7B-Instruct \
      --config configs/retake_demo.yaml --video my_video.mp4
"""

from __future__ import annotations

import argparse
import time

import numpy as np

DEMO_QUESTIONS = [
    "As depicted in the video, how is the relationship between the rabbit and"
    " human?\nOptions:\nA. Hostile.\nB. Friend.\nC. Cooperator.\nD. No one is"
    " correct above.\nAnswer with the option's letter from the given choices"
    " directly.",
    "What is the impression of the video?\nOptions:\nA. Sad.\nB. Funny.\nC."
    " Horrible.\nD. Silent.\nAnswer with the option's letter from the given"
    " choices directly.",
    "What is the subject of the video?\nOptions:\nA. Rabbit likes to eat"
    " carrots.\nB. How to raise a rabbit.\nC. A rabbit gives people trouble."
    "\nD. A rabbit performs for food.\nAnswer with the option's letter from"
    " the given choices directly.",
]
EXPECTED_ANSWERS = ["A", "B", "C"]


class _StubTokenizer:
    """Byte-level stand-in so --random-weights runs without tokenizer files."""

    def encode(self, s):
        return [7 + (b % 1000) for b in s.encode()][:512]

    def decode(self, ids, **kw):
        return " ".join(str(i) for i in ids)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", type=str, default=None)
    p.add_argument("--config", type=str, default="configs/retake_demo.yaml")
    p.add_argument("--video", type=str, default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--frames", type=int, default=None,
                   help="synthetic frame count when no --video is given")
    p.add_argument("--json", action="store_true",
                   help="also print one machine-readable JSON line "
                        "(answers vs expected) — consumed by "
                        "tools/first_checkpoint_gate.py")
    p.add_argument("--spec", action="store_true",
                   help="enable prompt-lookup speculative decoding (the "
                        "gate's spec-parity stage compares tokens vs a "
                        "non-spec run)")
    p.add_argument("--no-reuse", action="store_true",
                   help="recompute vision + the full prefill per question "
                        "(the reference's flow); the gate's prefix-parity "
                        "stage compares its tokens vs the default reuse run")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random geometry (TINY_TEST_CONFIG) — CPU-fast "
                        "dry-run mode for the gate's own tests")
    args = p.parse_args()

    import dataclasses

    from retake_tpu.data.processor import Qwen2VLProcessor
    from retake_tpu.data.video import fetch_video
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.runtime.engine import PrefixMismatch, Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    rt = RetakeConfig.from_yaml(args.config)
    if args.spec:
        rt = dataclasses.replace(rt, spec_decode=True)

    if args.tiny:
        # tiny mode is a CPU dry-run: force the CPU backend BEFORE first use
        # (the axon plugin pins jax_platforms="axon,cpu", overriding the
        # JAX_PLATFORMS env var — running tiny shapes on the shared TPU
        # would contend with real benchmarks for no reason)
        import jax

        jax.config.update("jax_platforms", "cpu")

        from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG

        print("== tiny random-geometry dry-run mode ==")
        import jax.numpy as jnp

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
    elif args.random_weights or not args.hf_path:
        from retake_tpu.models.qwen2_vl.config import Qwen2VisionConfig

        print("== random-weights smoke mode (no checkpoint) ==")
        cfg = Qwen2VLConfig(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, tie_word_embeddings=True,
            # the merger must emit the 2B text width (the default vision
            # config targets the 7B model's 3584)
            vision=Qwen2VisionConfig(hidden_size=1536),
        )
        params = params_lib.init_params(cfg, seed=0)
        processor = Qwen2VLProcessor(_StubTokenizer())
    else:
        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params = params_lib.load_safetensors(args.hf_path, cfg)
        processor = Qwen2VLProcessor.from_pretrained(args.hf_path)

    engine = Qwen2VLEngine(cfg, params, rt)

    if args.video:
        frames = fetch_video(
            args.video, rt.max_num_frames, rt.sample_fps, rt.longsize_resolution
        )
    else:
        n = args.frames or (8 if args.tiny else 64)
        print(f"no --video given: synthesizing {n} random frames")
        rng = np.random.default_rng(0)
        size = (56, 84, 3) if args.tiny else (252, 448, 3)
        frames = [
            rng.integers(0, 255, size=size, dtype=np.uint8)
            for _ in range(n)
        ]

    from retake_tpu.data.scorers import trim_answer

    # all three golden questions share the video: capture the WHOLE
    # question-independent prefill once (engine.VideoPrefix — vision tower,
    # DPSelect, AND the video KV prefill); each question then pays only its
    # trailing text segment + decode. Token-identical to the reference's
    # per-question recompute (tests/test_prefix_reuse.py); a diverging plan
    # raises PrefixMismatch and falls back to the vision-features artifact.
    features = prefix = grid = None
    answers = []
    token_streams = []
    for question, expected in zip(DEMO_QUESTIONS, EXPECTED_ANSWERS):
        if args.no_reuse:
            # the reference's flow: vision + the whole prefill per question
            # (reference demo.py:158-164 re-calls chat() each time). The
            # gate's prefix-parity stage pins this against the reuse run.
            inputs = processor(question, frames)
            t0 = time.perf_counter()
            result = engine.generate(
                inputs["input_ids"], inputs["pixel_values_videos"],
                inputs["video_grid_thw"],
                max_new_tokens=rt.max_new_tokens,
            )
            dt = time.perf_counter() - t0
            decoded = processor.decode(result.tokens)
            answers.append(trim_answer(decoded))
            token_streams.append([int(t) for t in result.tokens])
            print(f"\nQ: {question.splitlines()[0]}")
            print(f"A: {decoded!r}")
            print(f"expected: {expected}")
            print(
                f"[{dt:.1f}s total | prefill {result.prefill_seconds:.1f}s | "
                f"input {result.input_len} tok -> cache "
                f"{result.cache_len} tok]"
            )
            continue
        if features is None:
            inputs = processor(question, frames)
            grid = inputs["video_grid_thw"]
            t_enc = time.perf_counter()
            features = engine.encode_video(
                inputs["pixel_values_videos"], grid
            )
            try:
                prefix = engine.encode_prefix(
                    inputs["input_ids"], video_features=features,
                    max_new_tokens=rt.max_new_tokens,
                )
            except ValueError as e:
                print(f"[prefix capture unavailable: {e}]")
            print(f"[vision + video prefill encoded once: "
                  f"{time.perf_counter() - t_enc:.1f}s, reused below]")
        else:
            inputs = processor(question, video_grid=grid[0])
        t0 = time.perf_counter()
        result = None
        if prefix is not None:
            try:
                result = engine.generate(
                    inputs["input_ids"], prefix=prefix,
                    max_new_tokens=rt.max_new_tokens,
                )
            except PrefixMismatch as e:
                print(f"[prefix fallback: {e}]")
        if result is None:
            result = engine.generate(
                inputs["input_ids"],
                video_features=features,
                max_new_tokens=rt.max_new_tokens,
            )
        dt = time.perf_counter() - t0
        decoded = processor.decode(result.tokens)
        answers.append(trim_answer(decoded))
        token_streams.append([int(t) for t in result.tokens])
        print(f"\nQ: {question.splitlines()[0]}")
        print(f"A: {decoded!r}")
        print(f"expected: {expected}")
        print(
            f"[{dt:.1f}s total | prefill {result.prefill_seconds:.1f}s | "
            f"input {result.input_len} tok -> cache {result.cache_len} tok]"
        )
    if args.json:
        import json

        print(json.dumps({
            "answers": answers,
            "expected": EXPECTED_ANSWERS,
            "golden_pass": answers == EXPECTED_ANSWERS,
            "tokens": token_streams,
        }))


if __name__ == "__main__":
    main()
