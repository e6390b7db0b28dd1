"""TPU A/B: batched gap-layout decode attention — XLA full-bucket einsum vs
the Pallas dead-block-skipping kernel (ops/pallas/decode_gapped.py).

The win case is SERVING shapes: one shared attention bucket sized for the
longest tenant, short tenants' live regions a fraction of it. The XLA path
reads B x bucket from HBM every step; the kernel's HBM traffic tracks the
sum of live regions. Uniform full-bucket batches (decode_batch's per-bucket
grouping) should be ~neutral — the kernel must not LOSE there.

Amortized dispatch (n>=20 calls, one fence) per CLAUDE.md; bf16 and
int8-cache modes at 2B (12q/2kv) and 7B (28q/4kv) geometry.

NB this OP-level A/B (caches as jit args, one attention call per step) is
a sanity check, not the ground truth: inside the real 28-layer decode
scan XLA schedules/fuses differently and the gap widens — at the 43008
serving bucket (on-chip 2026-08-20) this tool reads 0.70-1.10x at 2B and
1.44-1.65x at 7B serve-mixed, while the in-scan loop
(tools/serve_decode_bisect.py) measures 1.4-1.9x at 2B and the
end-to-end serving A/B 1.29-1.40x. Uniform arms stay ~1.0x as required
(the eval decode_batch einsum default).
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import time

import jax
import jax.numpy as jnp
import numpy as np

from retake_tpu.ops import attention as attn
from retake_tpu.ops.quantization import quantize_kv_block

print("devices:", jax.devices(), flush=True)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32))[None][0])


def timeit(fn, n=100):
    fence(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n


def run(name, heads, kv, b, s_attn, final_len, dec_start, gap_start,
        gap_filled, quant):
    d = 128
    ks = jax.random.split(jax.random.key(0), 6)
    q = jax.random.normal(ks[0], (b, heads, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, kv, s_attn, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, kv, s_attn, d), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, kv, d), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, kv, d), jnp.bfloat16)
    fl = jnp.asarray(final_len, jnp.int32)
    ds = jnp.asarray(dec_start, jnp.int32)
    kw = {}
    if quant:
        kc, ksc = quantize_kv_block(kc)
        vc, vsc = quantize_kv_block(vc)
        kw = dict(k_scale=ksc, v_scale=vsc)

    # NB: pass the caches as jit ARGUMENTS — closing over them embeds them
    # as HLO constants and the axon remote_compile rejects the payload
    # (HTTP 413) past ~200 MB.
    args = (q, kc, vc, fl, jnp.int32(gap_start), jnp.int32(gap_filled),
            kn, vn)

    @jax.jit
    def g_xla(*a, **k):
        return attn.decode_attention_batch_gapped(
            *a, dec_start=ds, impl="xla", **k)

    @jax.jit
    def g_pal(*a, **k):
        return attn.decode_attention_batch_gapped(
            *a, dec_start=ds, impl="pallas", **k)

    def f_xla():
        return g_xla(*args, **kw)

    def f_pal():
        return g_pal(*args, **kw)

    o_x, o_p = f_xla(), f_pal()
    err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32)
                                - o_p.astype(jnp.float32))))
    t_x = timeit(f_xla)
    t_p = timeit(f_pal)
    live = int(np.sum(np.asarray(final_len))
               + np.sum(gap_start + gap_filled - np.asarray(dec_start)))
    print(
        f"{name}: err={err:.5f} xla={t_x*1e3:.3f}ms pallas={t_p*1e3:.3f}ms "
        f"speedup={t_x/t_p:.2f}x (live {live/1e3:.0f}k of "
        f"{b*s_attn/1e3:.0f}k cols)",
        flush=True,
    )


def main():
    for gname, heads, kv in (("2B 12q/2kv", 12, 2), ("7B 28q/4kv", 28, 4)):
        for quant in (False, True):
            tag = f"{gname}{' int8' if quant else ' bf16'}"
            # serving: ContinuousServer's real geometry — prefill bucket
            # 40960 + gap columns padded so the total is 2048-aligned
            # (43008; an odd bucket like 41984 admits no num_kb-aligned
            # int8 block >= 512 and lands in the padded-scale-plane mode,
            # see decode_gapped.py module header)
            run(f"{tag} serve-mixed B=4", heads, kv, 4, 43008,
                [8194, 8194, 32002, 0], [40960 + 256] * 4, 40960, 512,
                quant)
            run(f"{tag} serve-mixed B=8", heads, kv, 8, 43008,
                [8194, 8194, 4096, 4096, 32002, 8194, 0, 0],
                [40960 + 256] * 8, 40960, 512, quant)
            # uniform full-budget batch (decode_batch after bucket
            # grouping — the EVAL engine's geometry, einsum default)
            run(f"{tag} uniform B=8 32k", heads, kv, 8, 32768 + 1024,
                [32002] * 8, [32768] * 8, 32768, 512, quant)
            # short uniform batch at its own bucket (best XLA case)
            run(f"{tag} uniform B=8 8k", heads, kv, 8, 8192 + 1024,
                [8194] * 8, [8192] * 8, 8192, 512, quant)


if __name__ == "__main__":
    main()
