"""Quantization accuracy ablation: bf16 vs int8 vs w8a8 vs +int8-KV.

Runs the SAME video request through the Qwen2-VL engine under each
quantization mode and reports greedy-token agreement against the bf16
reference. Intended for REAL checkpoints (--hf_path) — that is the
validation gate before enabling w8a8 / kv_cache_dtype in production
configs (README: "validate accuracy on your benchmark"). With
--random-weights it only smoke-tests the four engine paths (random
logits are near-uniform, so agreement numbers are meaningless there).

Memory note: the bf16 reference arm must fit the chip, so on one 16 GB
v5e run this with the 2B checkpoint (7B bf16 does not fit at all — the
very reason the quantized modes exist); for 7B use a v5p or tp>=2.

Usage:
  python tools/quant_ablation.py --hf_path /ckpt/Qwen2-VL-7B-Instruct \
      --frames 256 --max-new-tokens 64
  python tools/quant_ablation.py --random-weights   # path smoke test
"""
from __future__ import annotations

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse

import numpy as np


MODES = [
    ("bf16", dict()),
    ("int8-weights", dict(quantization="int8")),
    ("w8a8", dict(quantization="w8a8")),
    ("int8kv-only", dict(kv_cache_dtype="int8")),  # isolates KV-cache loss
    ("w8a8+int8kv", dict(quantization="w8a8", kv_cache_dtype="int8")),
]


def build_rt(extra):
    from retake_tpu.utils.config import RetakeConfig

    base = {
        "scaling_factor": 4,
        "longvideo_kwargs": {
            "frame_chunk_size": 64,
            "chunked_prefill_frames": 32,
            "visual_compression": True,
            "visual_compression_kwargs": {
                "compression_ratio": 1.0,
                "compression_method": "Keyframe",
                "return_keyframe_mask": True,
            },
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "dynamic_compression_ratio": True,
                "compression_method": "pivotkv",
                "pos_embed_reforge": True,
                "max_input_length": 32000,
            },
        },
    }
    base.update(extra)
    return RetakeConfig.from_dict(base)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", type=str, default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--json", action="store_true",
                   help="also print one JSON line of agreements (consumed "
                        "by tools/first_checkpoint_gate.py)")
    args = p.parse_args()

    import jax.numpy as jnp

    import bench
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.ops.quantization import (
        quantize_llm_int8,
        quantize_vit_int8,
    )
    from retake_tpu.runtime.engine import Qwen2VLEngine

    bench._wait_for_hbm(10)
    if args.random_weights or not args.hf_path:
        print("== random weights (2B geometry): smoke test only ==")
        cfg, params_bf = bench.build_model()
    else:
        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params_bf = params_lib.load_safetensors(args.hf_path, cfg)
    ids, patches, grid = bench.build_request(cfg, num_frames=args.frames)

    reference = None
    agreements = {}
    for name, extra in MODES:
        if extra.get("quantization") in ("int8", "w8a8"):
            params = quantize_llm_int8(params_bf)
            if extra["quantization"] == "w8a8":
                params = dict(params)
                params["visual"] = quantize_vit_int8(params["visual"])
        else:
            params = params_bf
        eng = Qwen2VLEngine(cfg, params, build_rt(extra))
        r = eng.generate(ids, patches, grid,
                         max_new_tokens=args.max_new_tokens)
        toks = r.tokens
        if reference is None:
            reference = toks
            print(f"{name:>14}: {len(toks)} tokens (reference) "
                  f"ttft={r.prefill_seconds:.2f}s")
        else:
            n = min(len(toks), len(reference))
            agree = float(np.mean(toks[:n] == reference[:n]))
            agreements[name] = round(agree, 4)
            print(f"{name:>14}: token agreement vs bf16 = {agree:.3f} "
                  f"({n} compared) ttft={r.prefill_seconds:.2f}s")
        del eng, params
    if args.json:
        import json

        print(json.dumps({
            "agreement_vs_bf16": agreements,
            "meaningful": bool(args.hf_path and not args.random_weights),
        }))


if __name__ == "__main__":
    main()
