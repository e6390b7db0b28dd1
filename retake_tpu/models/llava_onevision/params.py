"""LLaVA-OneVision parameters: random init + HF checkpoint conversion.

Accepts HF LlavaOnevision checkpoints in both naming eras
(``language_model.model.*`` / ``vision_tower.vision_model.*`` and the
transformers>=4.52 ``model.language_model.*`` scheme). Also provides
``convert_llava_video_weights`` — the TPU counterpart of the reference's
torch converter (scripts/utils/convert_llava_video_weights_to_hf.py:54-104):
maps lmms-lab LLaVA-Video state dicts (model.vision_tower.*, model.mm_projector
.0/.2, model.image_newline) onto this layout without a torch runtime.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.llava_onevision.config import LlavaOnevisionConfig
from retake_tpu.models.qwen2_vl import params as qwen_params


def init_params(
    cfg: LlavaOnevisionConfig, seed: int = 0, dtype=jnp.bfloat16,
    quantize_int8=False, quantize_vision_int8=False,
) -> dict:
    """Random parameters at real geometry.

    ``quantize_int8`` generates the Qwen2 text decoder directly in int8
    (the bf16 7B tree would OOM a 16 GB chip before it could be quantized —
    same rationale as models/qwen2_vl/params.init_params);
    ``quantize_vision_int8`` does the same for the SigLIP block linears and
    the projector (W8A8 mode).
    """

    @jax.jit
    def _build():
        key_stream = [jax.random.key(seed)]

        def w(*shape, scale=None):
            scale = scale if scale is not None else 1.0 / np.sqrt(
                shape[-2] if len(shape) > 1 else shape[-1]
            )
            key_stream[0], sub = jax.random.split(key_stream[0])
            return jax.random.normal(sub, shape, dtype) * jnp.asarray(scale, dtype)

        def qw(*shape):
            """int8 {w, scale} leaf under quantize_vision_int8."""
            if not quantize_vision_int8:
                return {"w": w(*shape)}
            sigma = 1.0 / np.sqrt(shape[-2])
            key_stream[0], sub = jax.random.split(key_stream[0])
            return {
                "w": jax.random.randint(sub, shape, -127, 128, jnp.int8),
                "scale": jnp.full(
                    shape[:-2] + shape[-1:], sigma / 73.0, jnp.float32
                ),
            }

        def zeros(*shape):
            return jnp.zeros(shape, dtype)

        def ones(*shape):
            return jnp.ones(shape, dtype)

        text = qwen_params._init_params_traced(
            cfg.text, seed + 1, dtype, quantize_int8
        )
        text.pop("visual")  # Qwen2-VL ViT not used in this family
        v = cfg.vision
        d, m, l = v.hidden_size, v.intermediate_size, v.num_hidden_layers
        patch_dim = 3 * v.patch_size**2
        vision = {
            "patch_embed": {"w": w(patch_dim, d), "b": zeros(d)},
            "pos_embed": w(v.num_patches, d, scale=0.02),
            "blocks": {
                "ln1": {"scale": ones(l, d), "bias": zeros(l, d)},
                "q": {**qw(l, d, d), "b": zeros(l, d)},
                "k": {**qw(l, d, d), "b": zeros(l, d)},
                "v": {**qw(l, d, d), "b": zeros(l, d)},
                "out": {**qw(l, d, d), "b": zeros(l, d)},
                "ln2": {"scale": ones(l, d), "bias": zeros(l, d)},
                "fc1": {**qw(l, d, m), "b": zeros(l, m)},
                "fc2": {**qw(l, m, d), "b": zeros(l, d)},
            },
        }
        td = cfg.text.hidden_size
        projector = {
            "linear_1": {**qw(d, td), "b": zeros(td)},
            "linear_2": {**qw(td, td), "b": zeros(td)},
        }
        out = dict(text)
        out["vision_tower"] = vision
        out["projector"] = projector
        out["image_newline"] = w(td, scale=0.02)
        return out

    return _build()


def _canonical(name: str) -> str:
    """Normalize across HF eras and lmms-lab originals."""
    n = name
    n = re.sub(r"^model\.language_model\.", "language_model.", n)
    n = re.sub(r"^model\.vision_tower\.", "vision_tower.", n)
    n = re.sub(r"^model\.multi_modal_projector\.", "multi_modal_projector.", n)
    n = re.sub(r"^model\.image_newline$", "image_newline", n)
    n = re.sub(r"^language_model\.model\.", "language_model.", n)
    n = re.sub(r"^language_model\.lm_head\.", "lm_head.", n)
    # lmms-lab original LLaVA-Video naming
    n = re.sub(r"^model\.mm_projector\.0\.", "multi_modal_projector.linear_1.", n)
    n = re.sub(r"^model\.mm_projector\.2\.", "multi_modal_projector.linear_2.", n)
    n = n.replace(".vision_resampler", "")
    n = re.sub(r"^vision_tower\.vision_tower\.", "vision_tower.", n)
    n = re.sub(r"^model\.", "language_model.", n)  # model.layers.* (lmms-lab)
    n = re.sub(r"^vision_tower\.vision_model\.", "vision_tower.", n)
    return n


def from_hf_tensors(
    cfg: LlavaOnevisionConfig, tensors: Dict[str, np.ndarray], dtype=jnp.bfloat16
) -> dict:
    t = {_canonical(k): val for k, val in tensors.items()}

    def lin(name):
        return np.ascontiguousarray(np.swapaxes(t[name], -1, -2))

    # text stack (reuse qwen converter by re-prefixing names)
    text_tensors = {
        k[len("language_model."):]: val
        for k, val in t.items()
        if k.startswith("language_model.")
    }
    if "lm_head.weight" in t:
        text_tensors["lm_head.weight"] = t["lm_head.weight"]
    # feed through qwen converter's text part by faking visual absence
    text_cfg = cfg.text
    l = text_cfg.num_hidden_layers

    def stack_lin(fmt):
        return np.stack(
            [np.swapaxes(text_tensors[fmt.format(i)], -1, -2) for i in range(l)]
        )

    def stack(fmt):
        return np.stack([text_tensors[fmt.format(i)] for i in range(l)])

    layers = {
        "input_ln": stack("layers.{}.input_layernorm.weight"),
        "q": {
            "w": stack_lin("layers.{}.self_attn.q_proj.weight"),
            "b": stack("layers.{}.self_attn.q_proj.bias"),
        },
        "k": {
            "w": stack_lin("layers.{}.self_attn.k_proj.weight"),
            "b": stack("layers.{}.self_attn.k_proj.bias"),
        },
        "v": {
            "w": stack_lin("layers.{}.self_attn.v_proj.weight"),
            "b": stack("layers.{}.self_attn.v_proj.bias"),
        },
        "o": {"w": stack_lin("layers.{}.self_attn.o_proj.weight")},
        "post_ln": stack("layers.{}.post_attention_layernorm.weight"),
        "gate": {"w": stack_lin("layers.{}.mlp.gate_proj.weight")},
        "up": {"w": stack_lin("layers.{}.mlp.up_proj.weight")},
        "down": {"w": stack_lin("layers.{}.mlp.down_proj.weight")},
    }

    vl = cfg.vision.num_hidden_layers

    def vstack_lin(fmt):
        return np.stack(
            [np.swapaxes(t[fmt.format(i)], -1, -2) for i in range(vl)]
        )

    def vstack(fmt):
        return np.stack([t[fmt.format(i)] for i in range(vl)])

    enc = "vision_tower.encoder.layers.{}."
    patch_w = t["vision_tower.embeddings.patch_embedding.weight"]  # [D,3,ps,ps]
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T
    vision = {
        "patch_embed": {
            "w": np.ascontiguousarray(patch_w),
            "b": t["vision_tower.embeddings.patch_embedding.bias"],
        },
        "pos_embed": t["vision_tower.embeddings.position_embedding.weight"],
        "blocks": {
            "ln1": {
                "scale": vstack(enc + "layer_norm1.weight"),
                "bias": vstack(enc + "layer_norm1.bias"),
            },
            "q": {
                "w": vstack_lin(enc + "self_attn.q_proj.weight"),
                "b": vstack(enc + "self_attn.q_proj.bias"),
            },
            "k": {
                "w": vstack_lin(enc + "self_attn.k_proj.weight"),
                "b": vstack(enc + "self_attn.k_proj.bias"),
            },
            "v": {
                "w": vstack_lin(enc + "self_attn.v_proj.weight"),
                "b": vstack(enc + "self_attn.v_proj.bias"),
            },
            "out": {
                "w": vstack_lin(enc + "self_attn.out_proj.weight"),
                "b": vstack(enc + "self_attn.out_proj.bias"),
            },
            "ln2": {
                "scale": vstack(enc + "layer_norm2.weight"),
                "bias": vstack(enc + "layer_norm2.bias"),
            },
            "fc1": {
                "w": vstack_lin(enc + "mlp.fc1.weight"),
                "b": vstack(enc + "mlp.fc1.bias"),
            },
            "fc2": {
                "w": vstack_lin(enc + "mlp.fc2.weight"),
                "b": vstack(enc + "mlp.fc2.bias"),
            },
        },
    }
    projector = {
        "linear_1": {
            "w": lin("multi_modal_projector.linear_1.weight"),
            "b": t["multi_modal_projector.linear_1.bias"],
        },
        "linear_2": {
            "w": lin("multi_modal_projector.linear_2.weight"),
            "b": t["multi_modal_projector.linear_2.bias"],
        },
    }
    params = {
        "embed_tokens": text_tensors["embed_tokens.weight"],
        "layers": layers,
        "final_ln": text_tensors["norm.weight"],
        "vision_tower": vision,
        "projector": projector,
        "image_newline": t["image_newline"],
    }
    if not text_cfg.tie_word_embeddings:
        params["lm_head"] = lin("lm_head.weight")
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def load_safetensors(
    path: str, cfg: LlavaOnevisionConfig, dtype=jnp.bfloat16
) -> dict:
    from safetensors import safe_open

    index_file = os.path.join(path, "model.safetensors.index.json")
    tensors: Dict[str, np.ndarray] = {}
    if os.path.exists(index_file):
        with open(index_file) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
    else:
        shards = [
            f for f in sorted(os.listdir(path)) if f.endswith(".safetensors")
        ]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return from_hf_tensors(cfg, tensors, dtype)


def from_torch_model(cfg, torch_model, dtype=jnp.bfloat16) -> dict:
    sd = {
        k: v.detach().to("cpu").float().numpy()
        for k, v in torch_model.state_dict().items()
    }
    return from_hf_tensors(cfg, sd, dtype)
