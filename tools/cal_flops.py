"""Analytic prefill-FLOPs model for the compression trade-off curve.

Re-derivation of the reference's FLOPs sheet (scripts/utils/cal_flops.py:
21-53, 107-139): total chunked-prefill FLOPs as a function of the visual
compression ratio (fewer frames -> fewer chunks) and the KV compression ratio
(shorter attention context per chunk). Used to sanity-check measured speedups
against the theoretical curve.

Usage: python tools/cal_flops.py [--model qwen2_vl_7b|llava_video_7b]
"""

from __future__ import annotations

import argparse
import dataclasses
import math


@dataclasses.dataclass
class Dims:
    hidden: int
    layers: int
    heads: int
    kv_heads: int
    head_dim: int
    mlp: int
    tokens_per_frame: float  # LLM tokens contributed by one raw frame


QWEN2_VL_7B = Dims(
    hidden=3584, layers=28, heads=28, kv_heads=4, head_dim=128, mlp=18944,
    # 448px long side, 16:9 -> (448/14/2)^2 per grid_t, /2 frames per grid_t,
    # /(1280/720) aspect correction (reference cal_flops.py:46-47)
    tokens_per_frame=(448 / 14 / 2) ** 2 / 2 / (1280 / 720),
)

LLAVA_VIDEO_7B = Dims(
    hidden=3584, layers=28, heads=28, kv_heads=4, head_dim=128, mlp=18944,
    # 384px square, 27x27 patches pooled 2x -> ceil(27/2)^2 = 196
    tokens_per_frame=196.0,
)


def layer_flops(q_len: float, kv_len: float, d: Dims) -> float:
    """One decoder layer over a chunk of q_len tokens attending kv_len keys."""
    h = d.hidden
    qkvo = 2 * q_len * h * (d.heads + 2 * d.kv_heads) * d.head_dim + (
        2 * q_len * d.heads * d.head_dim * h
    )
    attn = 4 * q_len * kv_len * d.head_dim * d.heads
    mlp = 2 * q_len * h * d.mlp * 3
    return qkvo + attn + mlp


def pivotkv_prefill_flops(
    num_frames: int,
    chunk_frames: int,
    visual_ratio: float,
    kv_ratio: float,
    d: Dims,
    scoring: bool = True,
) -> float:
    """Total LLM prefill FLOPs with DPSelect frame dropping (visual_ratio)
    and PivotKV per-chunk eviction (kv_ratio)."""
    frames = max(1, round(num_frames * visual_ratio))
    chunk_tokens = chunk_frames * d.tokens_per_frame
    total_tokens = frames * d.tokens_per_frame
    num_chunks = math.ceil(frames / chunk_frames)
    flops = 0.0
    cache = 0.0
    for i in range(num_chunks):
        q = min(chunk_tokens, total_tokens - i * chunk_tokens)
        flops += d.layers * layer_flops(q, cache + q, d)
        if scoring:  # the chunk-local eviction scoring matmul
            flops += d.layers * 4 * q * q * d.head_dim * d.heads
        cache += max(1, int(kv_ratio * q))
    return flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen2_vl_7b",
                   choices=["qwen2_vl_7b", "llava_video_7b"])
    p.add_argument("--num_frames", type=int, default=1024)
    p.add_argument("--chunk_frames", type=int, default=32)
    args = p.parse_args()
    d = QWEN2_VL_7B if args.model == "qwen2_vl_7b" else LLAVA_VIDEO_7B

    baseline = pivotkv_prefill_flops(
        args.num_frames, args.chunk_frames, 1.0, 1.0, d, scoring=False
    )
    print(f"model={args.model} frames={args.num_frames} chunk={args.chunk_frames}")
    print(f"baseline (no compression): {baseline/1e12:.1f} TFLOP")
    print(f"{'visual':>7} {'kv':>5} {'TFLOP':>9} {'vs base':>8}")
    for vr, kr in [(1.0, 1.0), (1.0, 0.5), (1.0, 0.25), (0.5, 1.0),
                   (0.5, 0.5), (0.25, 1.0), (0.25, 0.25)]:
        f = pivotkv_prefill_flops(args.num_frames, args.chunk_frames, vr, kr, d)
        print(f"{vr:>7} {kr:>5} {f/1e12:>9.1f} {f/baseline:>8.2%}")


if __name__ == "__main__":
    main()
