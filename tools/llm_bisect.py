"""TPU bisection of the LLM chunk-step cost (7.46 s total at 2B/2048f).

Times text.decoder_chunk at production shapes (S=2304, 2B geometry, mid-fill
bucket) under ablations: full retake step, no-compress (drops scoring +
eviction gather + reforge rope round-trip), and attention impl variants.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from retake_tpu.models.qwen2_vl import params as params_lib, text
from retake_tpu.models.qwen2_vl.config import Qwen2VisionConfig, Qwen2VLConfig
from retake_tpu.runtime import cache as cache_lib

print("devices:", jax.devices(), flush=True)

cfg = Qwen2VLConfig(
    vocab_size=151936, hidden_size=1536, intermediate_size=8960,
    num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
    tie_word_embeddings=True, vision=Qwen2VisionConfig(hidden_size=1536),
).with_yarn(4.0)
params = params_lib.init_params(cfg, seed=0, dtype=jnp.bfloat16)

S = 2304
BUDGET = 24576  # mid-run attn bucket
FILL = 20000


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32))[None][0])


def timeit(fn, *a, n=12):
    fence(fn(*a)[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*a)
    fence(out[0])
    return (time.perf_counter() - t0) / n


cache = cache_lib.KVCache(
    k=jax.random.normal(jax.random.key(0), (28, 2, BUDGET, 128), jnp.bfloat16),
    v=jax.random.normal(jax.random.key(1), (28, 2, BUDGET, 128), jnp.bfloat16),
    pos=jnp.zeros((28, 3, BUDGET), jnp.int32),
    length=jnp.int32(FILL),
)
hidden = jax.random.normal(jax.random.key(2), (S, 1536), jnp.bfloat16) * 0.02
pos3 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (3, S))
kp = jnp.zeros(S, bool)


@partial(jax.jit, static_argnames=("compress", "reforge", "impl"))
def step(params, cache, hidden, compress, reforge, impl):
    return text.decoder_chunk(
        params, cfg, cache, hidden, pos3, jnp.int32(S), kp,
        jnp.int32(S // 4), compress=compress, reforge=reforge,
        attn_impl=impl,
    )


for name, c, r, impl in [
    ("full pallas          ", True, True, "pallas"),
    ("no-reforge pallas    ", True, False, "pallas"),
    ("no-compress pallas   ", False, False, "pallas"),
    ("full flash(xla)      ", True, True, "flash"),
    ("no-compress flash    ", False, False, "flash"),
]:
    t = timeit(step, params, cache, hidden, c, r, impl)
    print(f"{name}: {t*1e3:7.2f} ms / layer-stack chunk step", flush=True)
