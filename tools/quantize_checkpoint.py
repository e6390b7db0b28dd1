"""Quantize an HF checkpoint once and save the ready-to-load pytree.

Engines pointed at ``--out`` (eval --hf_path, demo --hf_path) detect the
saved file and skip both the bf16-sized disk read and the on-device
quantization pass at every startup (utils/checkpoint.py). The config
still controls W8A8 activation quantization at runtime — this bakes the
WEIGHTS only, exactly what quantize_llm_int8/quantize_vit_int8/
quantize_siglip_int8 produce at engine load.

Usage:
  python tools/quantize_checkpoint.py --hf_path /ckpt/Qwen2-VL-7B \
      --out /ckpt/qwen2-vl-7b-int8 --model_name qwen2_vl \
      [--vit]   # also quantize the vision tower (w8a8 configs)
"""

import argparse
import json
import shutil
import os

from retake_tpu.utils import checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model_name", default="qwen2_vl",
                   choices=["qwen2_vl", "llava_onevision", "llava_video"])
    p.add_argument("--vit", action="store_true",
                   help="also quantize the vision tower (w8a8 configs)")
    args = p.parse_args()

    from retake_tpu.ops.quantization import quantize_llm_int8

    if args.model_name == "qwen2_vl":
        from retake_tpu.models.qwen2_vl import params as plib
        from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig

        cfg = Qwen2VLConfig.from_pretrained(args.hf_path)
        params = plib.load_safetensors(args.hf_path, cfg)
        params = quantize_llm_int8(params)
        if args.vit:
            from retake_tpu.ops.quantization import quantize_vit_int8

            params["visual"] = quantize_vit_int8(params["visual"])
    else:
        from retake_tpu.models.llava_onevision import params as plib
        from retake_tpu.models.llava_onevision.config import (
            LlavaOnevisionConfig,
        )

        cfg = LlavaOnevisionConfig.from_pretrained(args.hf_path)
        params = plib.load_safetensors(args.hf_path, cfg)
        params = quantize_llm_int8(params)
        if args.vit:
            from retake_tpu.ops.quantization import quantize_siglip_int8

            params = quantize_siglip_int8(params)

    checkpoint.save_params(
        params, args.out,
        meta={"model_name": args.model_name, "weights": "int8",
              "vit_int8": bool(args.vit), "source": args.hf_path},
    )
    # engines still need the HF config (and callers the tokenizer files)
    for fname in ("config.json", "tokenizer.json", "tokenizer_config.json",
                  "vocab.json", "merges.txt"):
        src = os.path.join(args.hf_path, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, fname))
    print(json.dumps({"out": args.out, "files": sorted(os.listdir(args.out))}))


if __name__ == "__main__":
    main()
