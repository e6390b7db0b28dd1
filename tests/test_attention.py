"""Flash (online-softmax) attention vs the masked einsum reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.ops import attention as attn


@pytest.mark.parametrize(
    "h,kv,s,budget,cache_len,valid",
    [
        (4, 2, 16, 64, 20, 16),
        (4, 2, 16, 64, 0, 9),  # empty cache + padded chunk tail
        (8, 2, 33, 128, 127, 33),  # nearly full cache, odd chunk length
    ],
)
def test_flash_matches_einsum(rng, h, kv, s, budget, cache_len, valid):
    d = 16
    q = jnp.asarray(rng.normal(size=(h, s, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    ref = attn.chunk_prefill_attention(
        q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid)
    )
    fl = attn.flash_chunk_attention(
        q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid),
        block_size=32,
    )
    np.testing.assert_allclose(
        np.asarray(fl)[:, :valid], np.asarray(ref)[:, :valid], atol=2e-5
    )


def test_flash_block_size_invariance(rng):
    h, kv, s, budget, d = 4, 2, 24, 96, 16
    q = jnp.asarray(rng.normal(size=(h, s, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    outs = [
        np.asarray(
            attn.flash_chunk_attention(
                q, kc, vc, jnp.int32(50), kn, vn, jnp.int32(s), block_size=b
            )
        )
        for b in (16, 64, 1024)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=2e-5)


def test_pallas_kernel_matches_einsum(rng):
    """Pallas flash-prefill kernel (interpret mode on CPU) vs einsum path."""
    from retake_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    h, kv, s, budget, d = 4, 2, 48, 256, 128
    q = jnp.asarray(rng.normal(size=(h, s, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    for cache_len, valid in [(0, 48), (100, 48), (256, 30)]:
        ref = attn.chunk_prefill_attention(
            q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid)
        )
        out = flash_prefill_attention(
            q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid),
            block_q=16, block_k=64,
        )
        np.testing.assert_allclose(
            np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
            atol=3e-5,
        )


def test_pallas_kernel_independent_qk_padding(rng):
    """block_k > block_q with s not a multiple of either block size."""
    from retake_tpu.ops.pallas.flash_prefill import flash_prefill_attention

    h, kv, s, budget, d = 4, 2, 40, 128, 32
    q = jnp.asarray(rng.normal(size=(h, s, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    for cache_len, valid in [(0, 40), (70, 40), (128, 25)]:
        ref = attn.chunk_prefill_attention(
            q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid)
        )
        out = flash_prefill_attention(
            q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(valid),
            block_q=16, block_k=64,
        )
        np.testing.assert_allclose(
            np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
            atol=3e-5,
        )


@pytest.mark.parametrize("block_q", [16, 256])
def test_pallas_scoring_kernel_matches_oracle(rng, block_q):
    """pivot_score_sums == ops.pivotkv.eviction_scores."""
    from retake_tpu.ops import pivotkv
    from retake_tpu.ops.pallas.pivot_scores import pivot_score_sums

    h, kv, s, d = 4, 2, 44, 32
    g = h // kv
    qs = jnp.asarray(rng.normal(size=(h, s, d)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(kv, s, d)), jnp.float32)
    keypatch = jnp.asarray(rng.random(s) < 0.2)
    for valid in (44, 30, 1):
        valid_mask = jnp.arange(s) < valid
        ref_scores = pivotkv.eviction_scores(qs, ks, valid_mask, keypatch)
        sums = pivot_score_sums(qs, ks, jnp.int32(valid), block_q=block_q)
        scores = jnp.asarray(sums).sum(axis=0) / (kv * g)
        scores = jnp.where(keypatch, 1.0, scores)
        scores = jnp.where(valid_mask, scores, pivotkv.NEG_INF)
        np.testing.assert_allclose(
            np.asarray(scores)[:valid], np.asarray(ref_scores)[:valid],
            atol=3e-5, rtol=1e-5,
        )
        # padding keys must stay -inf (never kept by top-k)
        assert np.all(np.asarray(scores)[valid:] <= NEG_ORACLE)


NEG_ORACLE = -1e29


def test_decode_appendfree_matches_concat_path(rng):
    h, kv, budget, d = 8, 2, 96, 16
    q = jnp.asarray(rng.normal(size=(h, 1, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(kv, budget, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(kv, 1, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(kv, 1, d)), jnp.float32)
    for cache_len in (0, 1, 50, 96):
        ref = attn.chunk_prefill_attention(
            q, kc, vc, jnp.int32(cache_len), kn, vn, jnp.int32(1)
        )
        out = attn.decode_attention_appendfree(
            q, kc, vc, jnp.int32(cache_len), kn, vn
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


def test_vit_attention_qkv_kernel_matches_einsum(rng):
    """Fused-qkv-layout ViT attention kernel vs rope + einsum reference."""
    import jax

    from retake_tpu.models.qwen2_vl.vision import _apply_vision_rope
    from retake_tpu.ops.pallas.vit_attention import vit_attention_qkv

    t, s, n, d = 3, 24, 4, 16
    qkv = jnp.asarray(rng.normal(size=(t, s, n, 3, d)), jnp.float32)
    ang = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
    qr = _apply_vision_rope(q, cos, sin)
    kr = _apply_vision_rope(k, cos, sin)
    logits = jnp.einsum(
        "tsnd,tknd->tnsk", qr, kr, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("tnsk,tknd->tsnd", probs, v)

    out = vit_attention_qkv(qkv, cos, sin)  # [t, s, n*d]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(t, s, n * d),
        atol=3e-5, rtol=1e-4,
    )


def test_decode_gapped_pallas_matches_einsum(rng):
    """Dead-block-skipping batched decode kernel (ops/pallas/decode_gapped)
    vs the masked-einsum reference, bf16 and int8-cache modes, with
    per-slot dec_start holes and a free slot (final_len 0)."""
    import jax.numpy as jnp

    from retake_tpu.ops import attention as attn
    from retake_tpu.ops.quantization import quantize_kv_block

    b, kv, g, d, s = 3, 2, 3, 8, 64
    q = jnp.asarray(rng.normal(size=(b, kv * g, d)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    final_len = jnp.asarray([10, 32, 0], jnp.int32)
    dec_start = jnp.asarray([40, 44, 40], jnp.int32)
    gap_start, gap_filled = jnp.int32(40), jnp.int32(12)

    args = (final_len, gap_start, gap_filled, kn, vn)
    ref = attn.decode_attention_batch_gapped(
        q, kc, vc, *args, dec_start=dec_start, impl="xla"
    )
    out = attn.decode_attention_batch_gapped(
        q, kc, vc, *args, dec_start=dec_start, impl="pallas"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # int8 cache: same commuting-scale semantics through the kernel's
    # in-VMEM dequant
    kq, ks = quantize_kv_block(kc)
    vq, vs = quantize_kv_block(vc)
    ref_q = attn.decode_attention_batch_gapped(
        q, kq, vq, *args, k_scale=ks, v_scale=vs, dec_start=dec_start,
        impl="xla",
    )
    out_q = attn.decode_attention_batch_gapped(
        q, kq, vq, *args, k_scale=ks, v_scale=vs, dec_start=dec_start,
        impl="pallas",
    )
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q),
                               atol=2e-5, rtol=2e-5)


def test_decode_gapped_stacked_layer_index(rng):
    """Stacked-cache mode (the serving decode loop's path): the kernel
    indexes the FULL [L, B, KV, S, D] cache via a scalar-prefetched layer
    index instead of consuming a materialized per-layer slice. Every layer
    must match the 4-D per-layer call, bf16 and int8."""
    import jax.numpy as jnp

    from retake_tpu.ops import attention as attn
    from retake_tpu.ops.quantization import quantize_kv_block

    L, b, kv, g, d, s = 3, 2, 2, 3, 8, 64
    q = jnp.asarray(rng.normal(size=(b, kv * g, d)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.normal(size=(L, b, kv, s, d)) * 0.3, jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, b, kv, s, d)) * 0.3, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    final_len = jnp.asarray([10, 32], jnp.int32)
    dec_start = jnp.asarray([40, 44], jnp.int32)
    args = (final_len, jnp.int32(40), jnp.int32(12), kn, vn)

    kq, ksc = quantize_kv_block(kc)
    vq, vsc = quantize_kv_block(vc)
    for li in range(L):
        ref = attn.decode_attention_batch_gapped(
            q, kc[li], vc[li], *args, dec_start=dec_start, impl="xla")
        out = attn.decode_attention_batch_gapped(
            q, kc, vc, *args, dec_start=dec_start,
            layer=jnp.int32(li), impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        ref_q = attn.decode_attention_batch_gapped(
            q, kq[li], vq[li], *args, k_scale=ksc[li], v_scale=vsc[li],
            dec_start=dec_start, impl="xla")
        out_q = attn.decode_attention_batch_gapped(
            q, kq, vq, *args, k_scale=ksc, v_scale=vsc,
            dec_start=dec_start, layer=jnp.int32(li), impl="pallas")
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q),
                                   atol=2e-5, rtol=2e-5)


def test_decode_gapped_block_k_divisor_choice():
    """_pick_block_k must find the largest 128-multiple DIVISOR, not just
    power-of-two halvings: the dense grid sweeps s/block_k steps per
    (slot, kv head) per layer, and the old halving chain collapsed the
    serving bucket 41088 (= 321 x 128, 321 odd) to block_k=128 — 321
    grid steps, measured 43 vs ~14 ms per serving decode step
    (tools/serve_decode_bisect.py)."""
    from retake_tpu.ops.pallas.decode_gapped import _pick_block_k

    assert _pick_block_k(41088, 2048) == 384  # 321x128: best divisor
    assert _pick_block_k(41984, 2048) == 1024  # 41x1024 (op-bench bucket)
    assert _pick_block_k(43008, 2048) == 2048  # serve's aligned bucket
    assert _pick_block_k(8192, 2048) == 2048  # eval-path buckets
    assert _pick_block_k(384, 256) == 128  # divisor below the request
    assert _pick_block_k(64, 2048) == 64  # tiny test shapes: s itself
    assert _pick_block_k(96, 64) == 32  # sub-128: halving fallback
    # int8 mode (row_align=8): num_kb = s/bk must sit on the fp32 sublane
    # tile or the reshaped scale planes go padded/strided (measured 4x
    # decode-step regressions — decode_gapped.py module header)
    assert _pick_block_k(43008, 2048, 8) == 1792  # nk=24 (2048 -> nk=21)
    assert _pick_block_k(40960, 2048, 8) == 1280  # nk=32 (2048 -> nk=20)
    assert _pick_block_k(32768, 2048, 8) == 2048  # nk=16: target itself ok
    # 41984 = 41x1024: the only aligned choice is bk=128 (nk=328), but a
    # 128-block dense grid is WORSE than the padded-scale mode — the
    # >=512 aligned-candidate floor drops the constraint instead
    assert _pick_block_k(41984, 2048, 8) == 1024
    # no aligned 128-multiple divisor at all -> plain divisor fallback
    assert _pick_block_k(41088, 2048, 8) == 384
    assert _pick_block_k(64, 2048, 8) == 64  # tiny shapes unaffected


def test_decode_gapped_non_pow2_bucket_parity(rng):
    """Kernel parity at a bucket whose only >=128 block sizes are
    non-power-of-two divisors (s = 384 = 3 x 128, block_k request 256 ->
    chooses 128): the block sweep arithmetic must not assume pow2."""
    import jax.numpy as jnp

    from retake_tpu.ops import attention as attn
    from retake_tpu.ops.pallas.decode_gapped import decode_gapped_flash_state

    b, kv, g, d, s = 2, 2, 3, 8, 384
    q4 = jnp.asarray(rng.normal(size=(b, kv, g, d)) * 0.3, jnp.float32)
    q = q4.reshape(b, kv * g, d)
    kc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    final_len = jnp.asarray([100, 300], jnp.int32)
    dec_start = jnp.asarray([320, 336], jnp.int32)
    args = (final_len, jnp.int32(320), jnp.int32(40), kn, vn)

    ref = attn.decode_attention_batch_gapped(
        q, kc, vc, *args, dec_start=dec_start, impl="xla")
    # route through the state entry directly to pin the block size
    acc, m, l = decode_gapped_flash_state(
        q4, kc, vc, final_len, dec_start, jnp.int32(360), block_k=256)
    scale = 1.0 / np.sqrt(d)
    logit_s = jnp.einsum("bkgd,bkd->bkg", q4, kn) * scale
    m2 = jnp.maximum(m, logit_s)
    w_acc, w_s = jnp.exp(m - m2)[..., None], jnp.exp(logit_s - m2)[..., None]
    out = (acc * w_acc + w_s * vn[:, :, None, :]) / (
        l[..., None] * w_acc + w_s)
    np.testing.assert_allclose(
        np.asarray(out.reshape(b, kv * g, d)), np.asarray(ref),
        atol=2e-5, rtol=2e-5)
