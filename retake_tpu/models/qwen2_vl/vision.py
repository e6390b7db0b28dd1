"""Qwen2-VL vision transformer (native JAX, layer-scanned, frame-batched).

Behavioral spec: the HF Qwen2VisionTransformer the reference drives in frame
chunks (retake/qwen2_vl.py:597-617). TPU-first design decisions:

* The reference/HF computes attention over the flat patch sequence with
  cu_seqlens splitting per temporal slice. Since every temporal slice of a
  video has the same h*w patches, we reshape to [t, hw, D] and run *batched*
  attention — large uniform matmuls on the MXU instead of a varlen kernel.
* Patches arrive in the 2x2 spatial-merge block order (the processor emits
  them that way, matching HF), so the PatchMerger is a plain reshape to
  [t*hw/4, 4*D].
* 2-D rotary embeddings (h/w interleaved halves, theta 10000, rotary dim =
  head_dim/2) are compile-time constants of the static grid.
* Blocks are stacked and scanned; a video is processed in frame chunks by the
  engine (config ``frame_chunk_size``), each chunk one jit invocation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.qwen2_vl.config import Qwen2VisionConfig


def vision_rotary_tables(
    grid_h: int, grid_w: int, head_dim: int, merge_size: int, theta: float = 10000.0
):
    """cos/sin [hw, head_dim] numpy fp32 for one temporal slice.

    Patch order follows the spatial-merge block permutation: (block_row,
    block_col, intra_row, intra_col). Angle channels: first head_dim/4 from
    the h coordinate, next head_dim/4 from w, then the same repeated.
    """
    half = head_dim // 2  # rotary dim
    inv_freq = 1.0 / (
        theta ** (np.arange(0, half, 2, dtype=np.float32) / half)
    )  # [head_dim//4]
    m = merge_size
    hpos = np.broadcast_to(np.arange(grid_h)[:, None], (grid_h, grid_w))
    wpos = np.broadcast_to(np.arange(grid_w)[None, :], (grid_h, grid_w))

    def blockify(p):
        return (
            p.reshape(grid_h // m, m, grid_w // m, m)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    hpos, wpos = blockify(hpos), blockify(wpos)
    hfreq = hpos[:, None].astype(np.float32) * inv_freq  # [hw, hd/4]
    wfreq = wpos[:, None].astype(np.float32) * inv_freq
    freqs = np.concatenate([hfreq, wfreq], axis=-1)  # [hw, hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [hw, hd]
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_vision_rope(x, cos, sin):
    """x [t, hw, heads, hd]; cos/sin [hw, hd]; fp32 rotation (HF parity)."""
    x32 = x.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x32 * c + _rotate_half(x32) * s).astype(x.dtype)


def _layer_norm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _vlinear(x, p, act_int8):
    """ViT linear over a {'w'[, 'scale'], 'b'} dict; shared int8/W8A8
    dispatch (ops/quantization.qlinear)."""
    from retake_tpu.ops.quantization import qlinear

    return qlinear(x, p, act_int8)


def _block(vcfg: Qwen2VisionConfig, cos, sin, hidden, bp, act_quant: bool):
    """One ViT block over [t, hw, D]."""
    t, hw, d = hidden.shape
    nh, hd = vcfg.num_heads, vcfg.head_dim

    x = _layer_norm(hidden, bp["ln1"]["scale"], bp["ln1"]["bias"])
    # reorder the qkv projection columns HEAD-MAJOR ([q_h|k_h|v_h] per head)
    # so the attention kernel gets lane-contiguous per-head blocks without
    # transposing the [t, hw, *] activations (weight relayout is ~40x
    # smaller than one activation transpose and XLA CSEs it per layer)
    wq = bp["qkv"]["w"].reshape(d, 3, nh, hd).swapaxes(1, 2).reshape(d, -1)
    bq = bp["qkv"]["b"].reshape(3, nh, hd).swapaxes(0, 1).reshape(-1)
    qkv_p = {"w": wq, "b": bq}
    if "scale" in bp["qkv"]:  # per-output-channel scale follows the reorder
        qkv_p["scale"] = (
            bp["qkv"]["scale"].reshape(3, nh, hd).swapaxes(0, 1).reshape(-1)
        )
    qkv = _vlinear(x, qkv_p, act_quant)  # [t, hw, N*3*D] head-major

    # full bidirectional attention within each temporal slice — Pallas
    # kernel with VMEM-resident [hw, hw] logits and the 2-D rotary fused in.
    # An XLA einsum materializes the [t, n, hw, hw] fp32 logits in HBM:
    # measured ~29 ms/layer per 128-frame chunk (~55% of the whole ViT cost)
    # for <1% of its FLOPs; q/k/v head transposes cost another ~6 ms/layer.
    from retake_tpu.ops.pallas.vit_attention import vit_attention_qkv

    attn = vit_attention_qkv(qkv.reshape(t, hw, nh, 3, hd), cos, sin)
    hidden = hidden + _vlinear(attn, bp["proj"], act_quant)

    x2 = _layer_norm(hidden, bp["ln2"]["scale"], bp["ln2"]["bias"])
    mlp = _quick_gelu(_vlinear(x2, bp["fc1"], act_quant))
    mlp = _vlinear(mlp, bp["fc2"], act_quant)
    return hidden + mlp


def vision_tower(
    params: dict,
    vcfg: Qwen2VisionConfig,
    pixel_patches: jax.Array,  # [t*hw, in_channels*tps*ps*ps]
    grid_t: int,
    grid_h: int,
    grid_w: int,
    act_quant: bool = False,
) -> jax.Array:
    """Full tower: patch embed -> scanned blocks -> 2x2 merger.

    Returns LLM-space video embeddings [t * hw / merge^2, out_hidden].
    ``act_quant``: W8A8 block/merger linears (int8 weights required).
    """
    hw = grid_h * grid_w
    d = vcfg.embed_dim
    x = (pixel_patches @ params["patch_embed"]["w"]).reshape(grid_t, hw, d)
    cos_np, sin_np = vision_rotary_tables(
        grid_h, grid_w, vcfg.head_dim, vcfg.spatial_merge_size
    )
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def body(hidden, bp):
        return _block(vcfg, cos, sin, hidden, bp, act_quant), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    m2 = vcfg.spatial_merge_size**2
    mp = params["merger"]
    x = _layer_norm(x, mp["ln_q"]["scale"], mp["ln_q"]["bias"])
    x = x.reshape(grid_t * hw // m2, m2 * d)
    x = jax.nn.gelu(_vlinear(x, mp["fc1"], act_quant), approximate=False)
    return _vlinear(x, mp["fc2"], act_quant)
