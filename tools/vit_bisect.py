"""TPU bisection of the Qwen2-VL ViT chunk cost at 2B geometry.

Times one 128-frame vision chunk and ablated variants to find the non-matmul
overhead (attention, rotary, fp32 layernorms), then prints the analytic
matmul-only floor at the machine's measured bf16 ceiling (126 TF/s on this
v5e, tools/int8_matmul_bench.py) so the vision stage's distance from
speed-of-light is a recorded number, like tools/llm_bisect.py does for the
LLM chunk step. Record the output in bench.py detail + CLAUDE.md.
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from retake_tpu.models.qwen2_vl import params as params_lib, vision
from retake_tpu.models.qwen2_vl.config import Qwen2VisionConfig, Qwen2VLConfig

print("devices:", jax.devices(), flush=True)

cfg = Qwen2VLConfig(
    vocab_size=151936, hidden_size=1536, intermediate_size=8960,
    num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
    tie_word_embeddings=True, vision=Qwen2VisionConfig(hidden_size=1536),
)
params = params_lib.init_params(cfg, seed=0, dtype=jnp.bfloat16)
vp = params["visual"]
vcfg = cfg.vision
GT, GH, GW = 128, 32, 18
hw = GH * GW

patches = jax.random.normal(
    jax.random.key(0), (GT * hw, vcfg.patch_input_dim), jnp.bfloat16
)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32))[None][0])


def timeit(fn, n=6):
    fence(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n


@partial(jax.jit, static_argnames=("mode",))
def tower(vp, patches, mode: str):
    x = (patches @ vp["patch_embed"]["w"]).reshape(GT, hw, vcfg.embed_dim)
    cos_np, sin_np = vision.vision_rotary_tables(
        GH, GW, vcfg.head_dim, vcfg.spatial_merge_size
    )
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    nh, hd = vcfg.num_heads, vcfg.head_dim

    def block(hidden, bp):
        t, n, d = hidden.shape
        if mode == "matmul_only":
            xln = hidden
        elif mode == "ln_bf16":
            mu = hidden.mean(-1, keepdims=True)
            var = ((hidden - mu) ** 2).mean(-1, keepdims=True)
            xln = (hidden - mu) * jax.lax.rsqrt(var + 1e-6) * bp["ln1"]["scale"] + bp["ln1"]["bias"]
        else:
            xln = vision._layer_norm(hidden, bp["ln1"]["scale"], bp["ln1"]["bias"])
        qkv = xln @ bp["qkv"]["w"] + bp["qkv"]["b"]
        q, k, v = jnp.split(qkv.reshape(t, n, 3, nh, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if mode not in ("no_rope", "matmul_only", "no_attn_rope"):
            q = vision._apply_vision_rope(q, cos, sin)
            k = vision._apply_vision_rope(k, cos, sin)
        if mode in ("no_attn", "matmul_only", "no_attn_rope"):
            attn = v.reshape(t, n, d)
        else:
            attn = jax.nn.dot_product_attention(q, k, v).reshape(t, n, d)
        hidden = hidden + (attn @ bp["proj"]["w"] + bp["proj"]["b"])
        if mode == "matmul_only":
            x2 = hidden
        elif mode == "ln_bf16":
            mu = hidden.mean(-1, keepdims=True)
            var = ((hidden - mu) ** 2).mean(-1, keepdims=True)
            x2 = (hidden - mu) * jax.lax.rsqrt(var + 1e-6) * bp["ln2"]["scale"] + bp["ln2"]["bias"]
        else:
            x2 = vision._layer_norm(hidden, bp["ln2"]["scale"], bp["ln2"]["bias"])
        mlp = vision._quick_gelu(x2 @ bp["fc1"]["w"] + bp["fc1"]["b"])
        return hidden + mlp @ bp["fc2"]["w"] + bp["fc2"]["b"], None

    x, _ = jax.lax.scan(block, x, vp["blocks"])
    return x


for mode in ("full", "no_attn", "no_rope", "no_attn_rope", "ln_bf16",
             "matmul_only"):
    t = timeit(lambda m=mode: tower(vp, patches, m))
    print(f"{mode:13s}: {t*1e3:8.1f} ms / 128-frame chunk", flush=True)

jit_real = jax.jit(lambda vp, p: vision.vision_tower(vp, vcfg, p, GT, GH, GW))
t_real = timeit(lambda: jit_real(vp, patches))
print(f"vision_tower : {t_real*1e3:8.1f} ms (incl. merger)", flush=True)

# ---- analytic matmul floor -------------------------------------------------
# Linear-layer FLOPs from the actual weight shapes; attention FLOPs from the
# block-diagonal structure (full attention within each temporal group of
# hw tokens; 2 matmuls, q@k^T and p@v). Floor = FLOPs / measured bf16 ceiling.
BF16_CEILING_TFS = 126.0  # v5e measured, 8k^3 matmul (CLAUDE.md)
tokens = GT * hw
d = vcfg.embed_dim
L = vp["blocks"]["qkv"]["w"].shape[0]
per_tok_blk = 0
for name in ("qkv", "proj", "fc1", "fc2"):
    _, rows, cols = vp["blocks"][name]["w"].shape
    per_tok_blk += 2 * rows * cols
linear_flops = tokens * L * per_tok_blk
linear_flops += 2 * tokens * patches.shape[1] * d  # patch embed
# merger: 2x2 spatial merge -> tokens/4 rows through its mlp
merge_rows = tokens // (vcfg.spatial_merge_size**2)
for w in jax.tree.leaves(vp["merger"]):
    if getattr(w, "ndim", 0) == 2:
        linear_flops += 2 * merge_rows * w.shape[0] * w.shape[1]
attn_flops = L * 4 * GT * vcfg.num_heads * hw * hw * vcfg.head_dim
total_flops = linear_flops + attn_flops
floor_ms = total_flops / (BF16_CEILING_TFS * 1e12) * 1e3
lin_floor_ms = linear_flops / (BF16_CEILING_TFS * 1e12) * 1e3
print(
    f"analytic floor: {floor_ms:8.1f} ms / chunk "
    f"({total_flops/1e12:.2f} TF = {linear_flops/1e12:.2f} linear "
    f"+ {attn_flops/1e12:.2f} attn @ {BF16_CEILING_TFS:.0f} TF/s); "
    f"linear-only {lin_floor_ms:.1f} ms",
    flush=True,
)
print(
    f"vision_tower vs floor: {t_real*1e3:.1f} / {floor_ms:.1f} ms "
    f"= {t_real*1e3/floor_ms:.2f}x "
    f"(MXU util {total_flops/(t_real*1e12)/BF16_CEILING_TFS*100:.0f}% "
    f"of measured ceiling)",
    flush=True,
)
