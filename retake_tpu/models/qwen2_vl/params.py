"""Parameter pytree construction: random init and HF checkpoint conversion.

Loads HF safetensors shards directly into the stacked-layer JAX pytree without
a torch runtime dependency (the reference instead relies on
``from_pretrained`` — demo.py:130-136). Accepts both the legacy checkpoint
naming (``model.layers.*``, ``visual.*``) and the transformers>=4.52 scheme
(``model.language_model.*``, ``model.visual.*``).

Layout (all linears stored input-major [in, out], stacked over layers):
  embed_tokens [V, d]; layers/{input_ln, q,k,v,o, post_ln, gate, up, down};
  final_ln [d]; lm_head [d, V] (absent when tied);
  visual/{patch_embed, blocks/{ln1,qkv,proj,ln2,fc1,fc2}, merger/{ln_q,fc1,fc2}}
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig


def init_params(
    cfg: Qwen2VLConfig, seed: int = 0, dtype=jnp.bfloat16, quantize_int8=False,
    quantize_vit_int8=False,
) -> dict:
    """Random parameters (tests / benchmarks with reference geometry).

    Generated on-device via jax.random inside a single jit — numpy generation
    of the ~8.5B values of 7B geometry would take minutes on one host core,
    and per-leaf eager ops each pay a dispatch round-trip on remote-tunnel
    TPU backends. With ``quantize_int8`` the LLM linears/embedding quantize
    inside the same jit, so the full bf16 set (16.6 GB at 7B) never
    materializes — required to even *init* 7B on one 16 GB chip.
    """
    import jax

    @jax.jit
    def _build():
        # direct int8 generation: quantizing a materialized bf16 7B tree
        # would need ~17 GB transients and OOM a 16 GB chip
        return _init_params_traced(
            cfg, seed, dtype, quantize_int8, quantize_vit_int8
        )

    return _build()


def _init_params_traced(
    cfg: Qwen2VLConfig, seed: int, dtype, quantize_int8: bool = False,
    quantize_vit_int8: bool = False,
) -> dict:
    import jax

    key_stream = [jax.random.key(seed)]
    d, m, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    h, kv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def w(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / np.sqrt(
            shape[-2] if len(shape) > 1 else shape[-1]
        )
        key_stream[0], sub = jax.random.split(key_stream[0])
        return jax.random.normal(sub, shape, dtype) * jnp.asarray(scale, dtype)

    def qw(*shape, scale=None):
        """Quantized-linear leaf {w int8, scale}: random int8 (std ~73) with a
        per-channel scale matching the bf16 init's magnitude."""
        if not quantize_int8:
            return {"w": w(*shape, scale=scale)}
        sigma = scale if scale is not None else 1.0 / np.sqrt(shape[-2])
        key_stream[0], sub = jax.random.split(key_stream[0])
        q = jax.random.randint(sub, shape, -127, 128, jnp.int8)
        return {
            "w": q,
            "scale": jnp.full(shape[:-2] + shape[-1:], sigma / 73.0, jnp.float32),
        }

    def zeros(*shape):
        return jnp.zeros(shape, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    layers = {
        "input_ln": ones(l, d),
        "q": {**qw(l, d, h * hd), "b": zeros(l, h * hd)},
        "k": {**qw(l, d, kv * hd), "b": zeros(l, kv * hd)},
        "v": {**qw(l, d, kv * hd), "b": zeros(l, kv * hd)},
        "o": qw(l, h * hd, d),
        "post_ln": ones(l, d),
        "gate": qw(l, d, m),
        "up": qw(l, d, m),
        "down": qw(l, m, d),
    }
    def vqw(*shape):
        """ViT linear leaf: int8 {w, scale} under quantize_vit_int8 (W8A8),
        raw bf16 array otherwise."""
        if not quantize_vit_int8:
            return {"w": w(*shape)}
        sigma = 1.0 / np.sqrt(shape[-2])
        key_stream[0], sub = jax.random.split(key_stream[0])
        return {
            "w": jax.random.randint(sub, shape, -127, 128, jnp.int8),
            "scale": jnp.full(
                shape[:-2] + shape[-1:], sigma / 73.0, jnp.float32
            ),
        }

    v = cfg.vision
    vd, vl, vm = v.embed_dim, v.depth, v.embed_dim * v.mlp_ratio
    merged = vd * v.spatial_merge_size**2
    visual = {
        "patch_embed": {"w": w(v.patch_input_dim, vd)},
        "blocks": {
            "ln1": {"scale": ones(vl, vd), "bias": zeros(vl, vd)},
            "qkv": {**vqw(vl, vd, 3 * vd), "b": zeros(vl, 3 * vd)},
            "proj": {**vqw(vl, vd, vd), "b": zeros(vl, vd)},
            "ln2": {"scale": ones(vl, vd), "bias": zeros(vl, vd)},
            "fc1": {**vqw(vl, vd, vm), "b": zeros(vl, vm)},
            "fc2": {**vqw(vl, vm, vd), "b": zeros(vl, vd)},
        },
        "merger": {
            "ln_q": {"scale": ones(vd), "bias": zeros(vd)},
            "fc1": {**vqw(merged, merged), "b": zeros(merged)},
            "fc2": {**vqw(merged, v.hidden_size), "b": zeros(v.hidden_size)},
        },
    }
    if quantize_int8:
        import jax as _jax

        key_stream[0], sub = _jax.random.split(key_stream[0])
        embed_tokens = {
            "w": _jax.random.randint(
                sub, (cfg.vocab_size, d), -127, 128, jnp.int8
            ),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 73.0, jnp.float32),
        }
    else:
        embed_tokens = w(cfg.vocab_size, d, scale=0.02)
    params = {
        "embed_tokens": embed_tokens,
        "layers": layers,
        "final_ln": ones(d),
        "visual": visual,
    }
    if not cfg.tie_word_embeddings:
        # raw array when unquantized (matches from_hf_tensors layout)
        params["lm_head"] = (
            qw(d, cfg.vocab_size) if quantize_int8 else w(d, cfg.vocab_size)
        )
    return params


def _canonical(name: str) -> str:
    """Normalize HF parameter names across transformers versions."""
    name = re.sub(r"^model\.", "", name)
    name = re.sub(r"^language_model\.", "", name)
    name = re.sub(r"^visual\.", "visual.", name)
    return name


def from_hf_tensors(cfg: Qwen2VLConfig, tensors: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    """Build the pytree from a {hf_name: ndarray} mapping (any source)."""
    t = {_canonical(k): v for k, v in tensors.items()}
    l = cfg.num_hidden_layers

    def lin(name):  # torch Linear weight [out, in] -> [in, out]
        return np.ascontiguousarray(np.swapaxes(t[name], -1, -2))

    def stack_lin(fmt):
        return np.stack([lin(fmt.format(i)) for i in range(l)])

    def stack(fmt):
        return np.stack([t[fmt.format(i)] for i in range(l)])

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

    vl = cfg.vision.depth

    def vstack_lin(fmt):
        return np.stack([lin(fmt.format(i)) for i in range(vl)])

    def vstack(fmt):
        return np.stack([t[fmt.format(i)] for i in range(vl)])

    patch_w = t["visual.patch_embed.proj.weight"]  # [D, C, tps, ps, ps]
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T  # [C*tps*ps*ps, D]
    visual = {
        "patch_embed": {"w": np.ascontiguousarray(patch_w)},
        "blocks": {
            "ln1": {
                "scale": vstack("visual.blocks.{}.norm1.weight"),
                "bias": vstack("visual.blocks.{}.norm1.bias"),
            },
            "qkv": {
                "w": vstack_lin("visual.blocks.{}.attn.qkv.weight"),
                "b": vstack("visual.blocks.{}.attn.qkv.bias"),
            },
            "proj": {
                "w": vstack_lin("visual.blocks.{}.attn.proj.weight"),
                "b": vstack("visual.blocks.{}.attn.proj.bias"),
            },
            "ln2": {
                "scale": vstack("visual.blocks.{}.norm2.weight"),
                "bias": vstack("visual.blocks.{}.norm2.bias"),
            },
            "fc1": {
                "w": vstack_lin("visual.blocks.{}.mlp.fc1.weight"),
                "b": vstack("visual.blocks.{}.mlp.fc1.bias"),
            },
            "fc2": {
                "w": vstack_lin("visual.blocks.{}.mlp.fc2.weight"),
                "b": vstack("visual.blocks.{}.mlp.fc2.bias"),
            },
        },
        "merger": {
            "ln_q": {
                "scale": t["visual.merger.ln_q.weight"],
                "bias": t["visual.merger.ln_q.bias"],
            },
            "fc1": {
                "w": lin("visual.merger.mlp.0.weight"),
                "b": t["visual.merger.mlp.0.bias"],
            },
            "fc2": {
                "w": lin("visual.merger.mlp.2.weight"),
                "b": t["visual.merger.mlp.2.bias"],
            },
        },
    }
    params = {
        "embed_tokens": t["embed_tokens.weight"],
        "layers": layers,
        "final_ln": t["norm.weight"],
        "visual": visual,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin("lm_head.weight")
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def load_safetensors(path: str, cfg: Qwen2VLConfig, dtype=jnp.bfloat16) -> dict:
    """Stream HF safetensors shards from a checkpoint directory."""
    from safetensors import safe_open

    index_file = os.path.join(path, "model.safetensors.index.json")
    tensors: Dict[str, np.ndarray] = {}
    if os.path.exists(index_file):
        with open(index_file) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        shards = [
            f for f in sorted(os.listdir(path)) if f.endswith(".safetensors")
        ]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return from_hf_tensors(cfg, tensors, dtype)


def from_torch_model(cfg: Qwen2VLConfig, torch_model, dtype=jnp.bfloat16) -> dict:
    """Convert a live torch Qwen2VLForConditionalGeneration (tests/oracles)."""
    sd = {
        k: v.detach().to("cpu").float().numpy()
        for k, v in torch_model.state_dict().items()
    }
    return from_hf_tensors(cfg, sd, dtype)
