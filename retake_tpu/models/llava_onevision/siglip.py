"""SigLIP vision tower (so400m geometry), frame-batched for TPU.

Behavioral spec: the HF SiglipVisionModel the reference drives with
``output_hidden_states=True`` and takes ``hidden_states[-1]`` — the last
encoder layer output *without* post_layernorm (vision_feature_layer=-1,
strategy "full": retake/llava_onevision.py:428-439, converter config at
scripts/utils/convert_llava_video_weights_to_hf.py:121-129).

TPU design: frames are patchified on device ([T, 384, 384, 3] uint8 ->
[T, 729, 588] via reshape/transpose, normalization fused), the conv patch
embed becomes one [588, 1152] matmul, and the 26 pre-LN encoder blocks run
under a layer scan with attention batched over frames (729-token sequences).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.llava_onevision.config import SiglipVisionConfig


def patchify_frames(
    frames_u8: jax.Array, vcfg: SiglipVisionConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """[T, H, W, 3] uint8 -> [T, grid*grid, 3*ps*ps] normalized patches.

    Patch vector order is (channel, ph, pw), matching the Conv2d kernel
    flatten in params.py. Normalization: (x/255 - 0.5) / 0.5. ``dtype``
    should match the tower's parameter dtype (bf16 in production; fp32 in
    the HF-parity tests, where a bf16 cast costs ~1e-2 of embedding noise).
    """
    t = frames_u8.shape[0]
    g, ps = vcfg.grid, vcfg.patch_size
    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    # HF's patch embed is Conv2d(kernel=ps, stride=ps, padding='valid'): at
    # so400m geometry (384 px, patch 14) the 27x27 grid covers only 378 px
    # and the conv drops the trailing 6 rows/cols — crop to match
    x = x[:, : g * ps, : g * ps, :]
    x = x.reshape(t, g, ps, g, ps, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [T, gh, gw, C, ph, pw]
    return x.reshape(t, g * g, 3 * ps * ps).astype(dtype)


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _slinear(x, p, act_int8=False):
    """SigLIP linear over {'w'[, 'scale'], 'b'}; shared int8/W8A8 dispatch
    (ops/quantization.qlinear)."""
    from retake_tpu.ops.quantization import qlinear

    return qlinear(x, p, act_int8)


def _block(vcfg: SiglipVisionConfig, hidden, bp, act_quant: bool = False):
    """One SigLIP encoder layer over [T, N, D] (pre-LN)."""
    t, n, d = hidden.shape
    nh, hd = vcfg.num_attention_heads, vcfg.head_dim
    eps = vcfg.layer_norm_eps

    x = _layer_norm(hidden, bp["ln1"]["scale"], bp["ln1"]["bias"], eps)
    q = _slinear(x, bp["q"], act_quant).reshape(t, n, nh, hd)
    k = _slinear(x, bp["k"], act_quant).reshape(t, n, nh, hd)
    v = _slinear(x, bp["v"], act_quant).reshape(t, n, nh, hd)
    logits = jnp.einsum(
        "tqhd,tkhd->thqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("thqk,tkhd->tqhd", probs, v).reshape(t, n, d)
    hidden = hidden + _slinear(attn, bp["out"], act_quant)

    x2 = _layer_norm(hidden, bp["ln2"]["scale"], bp["ln2"]["bias"], eps)
    mlp = _gelu_tanh(_slinear(x2, bp["fc1"], act_quant))
    mlp = _slinear(mlp, bp["fc2"], act_quant)
    return hidden + mlp


def siglip_tower(
    params: dict, vcfg: SiglipVisionConfig, patches: jax.Array,
    act_quant: bool = False,
) -> jax.Array:
    """[T, N, patch_dim] -> last encoder layer output [T, N, D] (no post-LN)."""
    x = patches @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    x = x + params["pos_embed"]  # [N, D] learned

    def body(hidden, bp):
        return _block(vcfg, hidden, bp, act_quant), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def multi_modal_projector(
    params: dict, features: jax.Array, act_quant: bool = False
) -> jax.Array:
    """SigLIP features -> LLM space: linear, gelu, linear."""
    x = _slinear(features, params["linear_1"], act_quant)
    x = jax.nn.gelu(x, approximate=False)
    return _slinear(x, params["linear_2"], act_quant)


def apply_pooling(
    features: jax.Array, grid: int, pooled: int
) -> jax.Array:
    """Bilinear 2x downsample of per-frame token grids
    (reference apply_pooling: F.interpolate bilinear to ceil(g/2)).

    features: [T, grid*grid, D] -> [T, pooled*pooled, D].
    """
    t, n, d = features.shape
    x = features.reshape(t, grid, grid, d).astype(jnp.float32)
    # torch F.interpolate(bilinear, align_corners=False) does NOT antialias;
    # jax.image.resize defaults antialias=True, which diverges on downscale
    x = jax.image.resize(
        x, (t, pooled, pooled, d), method="bilinear", antialias=False
    )
    return x.reshape(t, pooled * pooled, d).astype(features.dtype)
