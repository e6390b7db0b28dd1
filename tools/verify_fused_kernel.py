"""TPU verification: Pallas prefill attention + standalone scoring kernel.

Production chunk shapes (Qwen2-VL 2B/7B geometry, 32-frame chunk at 448px ->
S=2304, cache budget 40960). Checks numerics on-chip and times each
component separately with amortized dispatch (the per-call tunnel RPC is
~10-30 ms and would otherwise swamp kernel time):
  * attention: XLA online-softmax vs Pallas at block_k in {512, 1024, 2048}
  * scoring:   XLA eviction_scores vs Pallas pivot_score_sums
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from retake_tpu.ops import attention as attn
from retake_tpu.ops import pivotkv
from retake_tpu.ops.pallas.flash_prefill import flash_prefill_attention
from retake_tpu.ops.pallas.pivot_scores import pivot_score_sums

print("devices:", jax.devices(), flush=True)


def fence(x):
    x = x[0] if isinstance(x, tuple) else x
    return float(jnp.sum(x.astype(jnp.float32))[None][0])


def timeit(fn, n=20):
    fence(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n


def run(name, h, kv, s, budget):
    d = 128
    ks = jax.random.split(jax.random.key(0), 9)
    q = jax.random.normal(ks[0], (h, s, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (kv, budget, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (kv, budget, d), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (kv, s, d), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (kv, s, d), jnp.bfloat16)
    qs = jax.random.normal(ks[5], (h, s, d), jnp.bfloat16)
    ksc = jax.random.normal(ks[6], (kv, s, d), jnp.bfloat16)
    vl = jnp.int32(s)
    valid = jnp.arange(s) < vl
    kp = jnp.zeros(s, bool)

    @jax.jit
    def score_xla():
        return jnp.sum(pivotkv.eviction_scores(qs, ksc, valid, kp)[:s])

    def score_pallas():
        return pivot_score_sums(qs, ksc, vl)

    # scoring numerics
    sums = pivot_score_sums(qs, ksc, vl)
    sc_p = sums.sum(0) / (kv * (h // kv))
    sc_x = pivotkv.eviction_scores(qs, ksc, valid, kp)
    err = float(jnp.max(jnp.abs(sc_x - sc_p)))
    t_sx = timeit(score_xla)
    t_sp = timeit(score_pallas)
    print(
        f"{name} scoring: err={err:.5f} xla={t_sx*1e3:.2f}ms "
        f"pallas={t_sp*1e3:.2f}ms",
        flush=True,
    )

    for fill in (4096, 20480, budget):
        cl = jnp.int32(fill)

        @jax.jit
        def attn_xla():
            return attn.flash_chunk_attention(q, kc, vc, cl, kn, vn, vl)

        o_x = attn_xla()
        t_ax = timeit(attn_xla)
        line = f"{name} attn fill={fill}: xla={t_ax*1e3:.2f}ms"
        for bk in (512, 1024, 2048):
            def attn_p(bk=bk):
                return flash_prefill_attention(
                    q, kc, vc, cl, kn, vn, vl, block_k=bk
                )

            o_p = attn_p()
            err_o = float(jnp.max(jnp.abs(
                o_x.astype(jnp.float32) - o_p.astype(jnp.float32)
            )))
            t_p = timeit(attn_p)
            line += f" | bk{bk}={t_p*1e3:.2f}ms(err {err_o:.4f})"
        print(line, flush=True)


run("2B", 12, 2, 2304, 40960)
run("7B", 28, 4, 2304, 40960)
