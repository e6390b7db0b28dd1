"""Convert lmms-lab LLaVA-Video(-Qwen2) checkpoints for retake-tpu.

Counterpart of the reference converter
(scripts/utils/convert_llava_video_weights_to_hf.py): takes the original
lmms-lab safetensors (model.vision_tower.*, model.mm_projector.0/.2,
model.image_newline, model.layers.*) and writes a single HF-style
safetensors checkpoint + config.json that
``retake_tpu.models.llava_onevision.params.load_safetensors`` (and HF)
can load. No torch required — names are remapped and tensors passed through.

Usage:
  python scripts/convert_llava_video_weights.py \
      --input /path/to/LLaVA-Video-7B-Qwen2 --output /path/to/out
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Reference key-rename map (convert_llava_video_weights_to_hf.py:54-65),
# re-expressed as ordered (old, new) prefix rewrites.
RENAMES = [
    ("model.image_newline", "image_newline"),
    ("model.vision_tower.vision_tower.", "vision_tower."),
    ("model.mm_projector.0.", "multi_modal_projector.linear_1."),
    ("model.mm_projector.2.", "multi_modal_projector.linear_2."),
    ("model.", "language_model.model."),
    ("lm_head.", "language_model.lm_head."),
]


def remap(name: str) -> str:
    name = name.replace(".vision_resampler", "")
    for old, new in RENAMES:
        if name.startswith(old) or name == old.rstrip("."):
            return new + name[len(old):]
    return name


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    from safetensors import safe_open
    from safetensors.numpy import save_file

    tensors = {}
    shards = [
        f for f in sorted(os.listdir(args.input)) if f.endswith(".safetensors")
    ]
    for shard in shards:
        with safe_open(os.path.join(args.input, shard), framework="np") as f:
            for key in f.keys():
                tensors[remap(key)] = f.get_tensor(key)
    print(f"remapped {len(tensors)} tensors from {len(shards)} shards")

    os.makedirs(args.output, exist_ok=True)
    save_file(tensors, os.path.join(args.output, "model.safetensors"))

    # config: Qwen2-7B text + SigLIP so400m vision (reference hardcodes the
    # vision geometry — convert_llava_video_weights_to_hf.py:121-129, 139-143)
    in_cfg = {}
    cfg_path = os.path.join(args.input, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            in_cfg = json.load(f)
    config = {
        "architectures": ["LlavaOnevisionForConditionalGeneration"],
        "model_type": "llava_onevision",
        "image_token_index": 151646,
        "video_token_index": 151647,
        "vision_feature_select_strategy": "full",
        "vision_feature_layer": -1,
        "text_config": {
            "model_type": "qwen2",
            "vocab_size": in_cfg.get("vocab_size", 152128),
            "hidden_size": in_cfg.get("hidden_size", 3584),
            "intermediate_size": in_cfg.get("intermediate_size", 18944),
            "num_hidden_layers": in_cfg.get("num_hidden_layers", 28),
            "num_attention_heads": in_cfg.get("num_attention_heads", 28),
            "num_key_value_heads": in_cfg.get("num_key_value_heads", 4),
            "rope_theta": in_cfg.get("rope_theta", 1000000.0),
            "rms_norm_eps": in_cfg.get("rms_norm_eps", 1e-6),
            "max_position_embeddings": in_cfg.get(
                "max_position_embeddings", 32768
            ),
            "tie_word_embeddings": in_cfg.get("tie_word_embeddings", False),
            "bos_token_id": 151643,
            "eos_token_id": 151645,
        },
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": 1152,
            "image_size": 384,
            "intermediate_size": 4304,
            "num_attention_heads": 16,
            "num_hidden_layers": 26,
            "patch_size": 14,
            "vision_use_head": False,
        },
    }
    with open(os.path.join(args.output, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    print(f"wrote checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
