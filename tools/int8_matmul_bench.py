"""Microbenchmark: does XLA reach the v5e int8 MXU path (2x bf16 peak)?

v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8. Measured practical bf16
ceiling here is ~126 TF/s (8k^3 matmul). If int8 x int8 -> int32 dots land
on the int8 MXU path, W8A8 quantization of the prefill linears roughly
halves the matmul-bound portion of TTFT.

Protocol per CLAUDE.md: enqueue N>=20 calls, fence once (per-call fencing
measures the tunnel RPC, not the kernel).
"""

import time

import jax
import jax.numpy as jnp

from retake_tpu.utils.profiling import device_fence

N = 8192
ITERS = 24


def bench(fn, *args, flops):
    out = fn(*args)  # compile
    device_fence()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    device_fence()
    dt = (time.perf_counter() - t0) / ITERS
    return flops / dt / 1e12, dt


def main():
    key = jax.random.key(0)
    a16 = jax.random.normal(key, (N, N), jnp.bfloat16)
    b16 = jax.random.normal(key, (N, N), jnp.bfloat16)
    a8 = jax.random.randint(key, (N, N), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (N, N), -127, 127, jnp.int8)
    sa = jax.random.uniform(key, (N, 1), jnp.float32)
    sb = jax.random.uniform(key, (1, N), jnp.float32)
    flops = 2 * N**3

    mm16 = jax.jit(lambda x, y: x @ y)
    tf, dt = bench(mm16, a16, b16, flops=flops)
    print(f"bf16 @ bf16 -> bf16        : {tf:7.1f} TF/s  ({dt*1e3:.2f} ms)")

    mm8 = jax.jit(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    tf, dt = bench(mm8, a8, b8, flops=flops)
    print(f"int8 @ int8 -> int32       : {tf:7.1f} TOP/s ({dt*1e3:.2f} ms)")

    # W8A8 with per-row/per-col dequant scales fused on the int32 result
    mm8s = jax.jit(
        lambda x, y, s1, s2: (
            jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * s1
            * s2
        ).astype(jnp.bfloat16)
    )
    tf, dt = bench(mm8s, a8, b8, sa, sb, flops=flops)
    print(f"int8 dot + dequant scales  : {tf:7.1f} TOP/s ({dt*1e3:.2f} ms)")

    # full dynamic W8A8: quantize bf16 activations per-row on the fly
    def w8a8(x, wq, wscale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        xs = amax / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / xs), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs * wscale).astype(jnp.bfloat16)

    mmdyn = jax.jit(w8a8)
    tf, dt = bench(mmdyn, a16, b8, sb, flops=flops)
    print(f"dyn-quant W8A8 (bf16 in)   : {tf:7.1f} TOP/s ({dt*1e3:.2f} ms)")

    # mixed: bf16 activations x int8 weights (XLA converts weights in-core)
    mmmix = jax.jit(lambda x, y, s: (x @ y.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16))
    tf, dt = bench(mmmix, a16, b8, sb, flops=flops)
    print(f"bf16 @ int8(as bf16) w-only: {tf:7.1f} TF/s  ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
