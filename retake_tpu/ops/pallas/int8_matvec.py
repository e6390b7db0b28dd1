"""Pallas kernel: fused int8-dequant matrix-vector product (decode path).

Decode is weight-read bound: XLA lowers ``x @ w_int8.astype(bf16)`` by
materializing the bf16 copy in HBM (3x the traffic of the int8 bytes). This
kernel streams int8 blocks into VMEM, converts in-core, and accumulates in
fp32 — HBM traffic is the int8 bytes only, cutting 7B TPOT toward the
bandwidth floor.

Used automatically by the decoder's ``_linear`` for single-token inputs on
quantized weights (models/qwen2_vl/text.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 1024
DEFAULT_BLOCK_K = 512


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, num_k: int):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0, :]  # [BK] bf16
    w = w_ref[:].astype(x.dtype)  # int8 block -> bf16 in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x[None, :], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == num_k - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def int8_matvec(
    x: jax.Array,  # [1, K] activation (bf16/f32)
    w: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N]
    block_n: int = DEFAULT_BLOCK_N,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    k, n = w.shape
    assert x.shape == (1, k), (x.shape, w.shape)
    k_pad = -(-k // block_k) * block_k
    n_pad = -(-n // block_n) * block_n
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
        w = jnp.pad(w, ((0, k_pad - k), (0, 0)))
    if n_pad != n:
        w = jnp.pad(w, ((0, 0), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n))
    num_k = k_pad // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, num_k=num_k),
        grid=(n_pad // block_n, num_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda j, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda j, kb: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda j, kb: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, block_n), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_pad * n_pad,
            bytes_accessed=k_pad * n_pad + n_pad * 4 + k_pad * 2,
            transcendentals=0,
        ),
    )(x, w, scale)
    return out[:, :n]
