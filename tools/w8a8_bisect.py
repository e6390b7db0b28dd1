"""TPU A/B of W8A8 vs bf16 at production shapes (2B and 7B geometry).

Times (a) the LLM chunk step (S=2304, mid-fill bucket) with bf16 weights,
int8 weight-only, and W8A8; (b) one 128-frame ViT chunk bf16 vs W8A8.
Amortized protocol per CLAUDE.md: N calls enqueued, one fence.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from retake_tpu.models.qwen2_vl import params as params_lib, text, vision
from retake_tpu.models.qwen2_vl.config import Qwen2VisionConfig, Qwen2VLConfig
from retake_tpu.ops import quantization as quant
from retake_tpu.runtime import cache as cache_lib

print("devices:", jax.devices(), flush=True)

S = 2304
BUDGET = 24576
FILL = 20000


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32))[None][0])


def timeit(fn, *a, n=12, out=lambda r: r[0]):
    fence(out(fn(*a)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*a)
    fence(out(r))
    return (time.perf_counter() - t0) / n


@partial(jax.jit, static_argnames=("cfg", "act_quant"))
def step(params, cfg, cache, hidden, pos3, kp, act_quant):
    return text.decoder_chunk(
        params, cfg, cache, hidden, pos3, jnp.int32(S), kp,
        jnp.int32(1462), compress=True, reforge=True, attn_impl="pallas",
        attn_budget=BUDGET, act_quant=act_quant,
    )


@partial(jax.jit, static_argnames=("cfg", "t", "h", "w", "act_quant"))
def vit(params, cfg, patches, t, h, w, act_quant):
    return vision.vision_tower(
        params["visual"], cfg.vision, patches, t, h, w, act_quant=act_quant
    )


def bench_geometry(name, cfg, fcs=128):
    print(f"=== {name} ===", flush=True)
    params = params_lib.init_params(
        cfg, seed=0, quantize_int8=True, quantize_vit_int8=True
    )
    l, kv = cfg.num_hidden_layers, cfg.num_key_value_heads
    cache = cache_lib.KVCache(
        k=jax.random.normal(jax.random.key(0), (l, kv, BUDGET, 128), jnp.bfloat16),
        v=jax.random.normal(jax.random.key(1), (l, kv, BUDGET, 128), jnp.bfloat16),
        pos=jnp.zeros((l, 3, BUDGET), jnp.int32),
        length=jnp.int32(FILL),
    )
    hidden = jax.random.normal(jax.random.key(2), (S, cfg.hidden_size), jnp.bfloat16) * 0.02
    pos3 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (3, S))
    kp = jnp.zeros(S, bool)

    def run(aq):
        c = jax.tree.map(jnp.copy, cache)
        return timeit(
            lambda: step(params, cfg, c, hidden, pos3, kp, aq), n=16
        )

    t_wo = run(False)
    t_aq = run(True)
    print(f"LLM chunk step  weight-only int8: {t_wo*1e3:7.2f} ms", flush=True)
    print(f"LLM chunk step  W8A8            : {t_aq*1e3:7.2f} ms  ({t_wo/t_aq:.2f}x)", flush=True)

    # ViT chunk: grid 32x18 per temporal patch, fcs frames -> fcs/2 grid_t
    gt, gh, gw = fcs // 2, 32, 18
    patches = jax.random.normal(
        jax.random.key(3), (gt * gh * gw, cfg.vision.patch_input_dim), jnp.bfloat16
    )
    tv_aq = timeit(
        lambda: vit(params, cfg, patches, gt, gh, gw, True), n=8,
        out=lambda r: r,
    )
    del params, cache  # 7B: two full param trees at once OOM the 16 GB chip
    # bf16 arm rebuilt fresh (bf16 ViT weights, int8 LLM)
    params_bf = params_lib.init_params(cfg, seed=0, quantize_int8=True)
    tv_bf = timeit(
        lambda: vit(params_bf, cfg, patches, gt, gh, gw, False), n=8,
        out=lambda r: r,
    )
    print(f"ViT {fcs}-frame chunk bf16 : {tv_bf*1e3:7.1f} ms", flush=True)
    print(f"ViT {fcs}-frame chunk W8A8 : {tv_aq*1e3:7.1f} ms  ({tv_bf/tv_aq:.2f}x)", flush=True)
    del params_bf


cfg2b = Qwen2VLConfig(
    vocab_size=151936, hidden_size=1536, intermediate_size=8960,
    num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
    tie_word_embeddings=True, vision=Qwen2VisionConfig(hidden_size=1536),
).with_yarn(4.0)
bench_geometry("Qwen2-VL-2B geometry", cfg2b)

cfg7b = Qwen2VLConfig().with_yarn(4.0)
bench_geometry("Qwen2-VL-7B geometry", cfg7b, fcs=64)
