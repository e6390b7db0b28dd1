"""int8 weight-only quantization: exactness properties + engine integration."""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.ops import quantization as quant


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    qd = quant.quantize_weight(w)
    assert qd["w"].dtype == jnp.int8 and qd["scale"].shape == (48,)
    deq = qd["w"].astype(jnp.float32) * qd["scale"]
    # per-channel symmetric int8: max relative error ~ 1/127 of channel max
    err = np.abs(np.asarray(deq - w))
    bound = np.abs(np.asarray(w)).max(axis=0) / 127.0 * 0.51
    assert (err <= bound[None, :] + 1e-7).all()


def test_scale_commutes_with_matmul(rng):
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    qd = quant.quantize_weight(w)
    a = (x @ qd["w"].astype(jnp.float32)) * qd["scale"]
    b = x @ (qd["w"].astype(jnp.float32) * qd["scale"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_int8_linear_matches_numpy_oracle(rng):
    """W8A8 core math: dynamic per-row activation quant + int8 dot + dequant
    must match an independent numpy transcription exactly (int32 accumulate
    is exact; the only rounding is the two int8 quantizations themselves)."""
    x = rng.normal(size=(6, 32)).astype(np.float32) * 3.0
    w = rng.normal(size=(32, 16)).astype(np.float32)
    qd = quant.quantize_weight(jnp.asarray(w))
    got = np.asarray(
        quant.int8_linear(jnp.asarray(x), qd["w"], qd["scale"])
    )

    # numpy oracle
    amax = np.abs(x).max(axis=-1, keepdims=True)
    xs = np.maximum(amax, 1e-8) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(qd["w"]).astype(np.int32)
    want = acc.astype(np.float32) * xs * np.asarray(qd["scale"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # and it approximates the float matmul to 8-bit accuracy
    rel = np.abs(got - x @ w) / (np.abs(x @ w).mean() + 1e-9)
    assert rel.mean() < 0.05


def test_w8a8_decoder_chunk_close_to_bf16(rng):
    """W8A8 prefill is lossy but must stay close: cosine similarity of the
    chunk hidden states vs the exact weight-only path > 0.98 on the tiny
    model (28 layers of 8-bit rounding compound, hence not exact)."""
    import jax

    from retake_tpu.models.qwen2_vl import text
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime import cache as cache_lib

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quant.quantize_llm_int8(params)

    s = 16
    hidden = jnp.asarray(rng.normal(size=(s, cfg.hidden_size)).astype(np.float32))
    pos3 = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (3, s))
    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, 64, cfg.head_dim,
        dtype=jnp.float32,
    )
    args = (hidden, pos3, jnp.int32(s), jnp.zeros(s, bool), jnp.int32(s))
    h_exact, _ = text.decoder_chunk(
        qparams, cfg, kv, *args, compress=False, reforge=False,
        attn_impl="xla", act_quant=False,
    )
    kv2 = jax.tree.map(jnp.copy, kv)
    h_q, _ = text.decoder_chunk(
        qparams, cfg, kv2, *args, compress=False, reforge=False,
        attn_impl="xla", act_quant=True,
    )
    a = np.asarray(h_exact, np.float64).ravel()
    b = np.asarray(h_q, np.float64).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.98, cos


@pytest.mark.slow
def test_engine_runs_w8a8(rng):
    """quantization: w8a8 end-to-end: engine runs with int8 LLM + ViT
    weights, activation quant at prefill, deterministic tokens."""
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quant.quantize_llm_int8(params)
    qparams["visual"] = quant.quantize_vit_int8(qparams["visual"])
    assert qparams["visual"]["blocks"]["qkv"]["w"].dtype == jnp.int8

    n_tok = 2 * 4 * 4 // 4
    ids = np.array(
        [10, cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
        + [cfg.vision_end_token_id, 11, 12], dtype=np.int64,
    )
    patches = rng.normal(size=(2 * 4 * 4, cfg.vision.patch_input_dim)).astype(
        np.float32
    )
    grid = np.array([[2, 4, 4]])
    rt = RetakeConfig.from_dict(
        {
            "quantization": "w8a8",
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2, "frame_chunk_size": 2,
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "compression_ratio": 0.5, "pos_embed_reforge": True,
                },
            },
        }
    )
    eng = Qwen2VLEngine(cfg, qparams, rt)
    assert eng.act_quant
    r1 = eng.generate(ids, patches, grid, max_new_tokens=4)
    r2 = eng.generate(ids, patches, grid, max_new_tokens=4)
    assert r1.tokens.shape[0] >= 1
    np.testing.assert_array_equal(r1.tokens, r2.tokens)


@pytest.mark.slow
def test_engine_runs_quantized(rng):
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quant.quantize_llm_int8(params)
    assert quant.param_bytes(qparams) < quant.param_bytes(params)

    n_tok = 2 * 4 * 4 // 4
    ids = np.array(
        [10, cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
        + [cfg.vision_end_token_id, 11, 12], dtype=np.int64,
    )
    patches = rng.normal(size=(2 * 4 * 4, cfg.vision.patch_input_dim)).astype(
        np.float32
    )
    grid = np.array([[2, 4, 4]])

    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2}}
    )
    base = Qwen2VLEngine(cfg, params, rt).generate(ids, patches, grid, max_new_tokens=4)
    q = Qwen2VLEngine(cfg, qparams, rt).generate(ids, patches, grid, max_new_tokens=4)
    # random tiny models have near-uniform logits, so exact token match is not
    # guaranteed — the contract is: runs end-to-end, same shapes/cache plan
    assert q.cache_len == base.cache_len
    assert q.tokens.shape[0] >= 1
    q2 = Qwen2VLEngine(cfg, qparams, rt).generate(ids, patches, grid, max_new_tokens=4)
    np.testing.assert_array_equal(q.tokens, q2.tokens)



def test_kv_scale_commutes_exactly(rng):
    """int8-KV attention with commuted scales must equal attention over the
    explicitly dequantized cache (scale commutation is exact math)."""
    from retake_tpu.ops import attention as attn_ops
    from retake_tpu.ops.quantization import quantize_kv_block

    KV, G, S, D = 2, 3, 24, 16
    q = jnp.asarray(rng.normal(size=(KV * G, 1, D)).astype(np.float32))
    kc = rng.normal(size=(KV, S, D)).astype(np.float32)
    vc = rng.normal(size=(KV, S, D)).astype(np.float32)
    kq, ksc = quantize_kv_block(jnp.asarray(kc))
    vq, vsc = quantize_kv_block(jnp.asarray(vc))
    k_new = jnp.asarray(rng.normal(size=(KV, 1, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(KV, 1, D)).astype(np.float32))
    clen = jnp.int32(17)

    got = attn_ops.decode_attention_appendfree(
        q, kq, vq, clen, k_new, v_new, k_scale=ksc, v_scale=vsc
    )
    kdq = (kq.astype(jnp.float32) * ksc[..., None])
    vdq = (vq.astype(jnp.float32) * vsc[..., None])
    want = attn_ops.decode_attention_appendfree(q, kdq, vdq, clen, k_new, v_new)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


def test_pallas_kernel_int8_cache_matches_xla(rng):
    """Pallas flash-prefill over an int8 cache must match the XLA reference
    path over the dequantized cache."""
    from retake_tpu.ops import attention as attn_ops
    from retake_tpu.ops.pallas.flash_prefill import flash_prefill_attention
    from retake_tpu.ops.quantization import quantize_kv_block

    KV, G, S, D, BUDGET = 2, 2, 16, 16, 64
    q = jnp.asarray(rng.normal(size=(KV * G, S, D)).astype(np.float32))
    kc = rng.normal(size=(KV, BUDGET, D)).astype(np.float32)
    vc = rng.normal(size=(KV, BUDGET, D)).astype(np.float32)
    kq, ksc = quantize_kv_block(jnp.asarray(kc))
    vq, vsc = quantize_kv_block(jnp.asarray(vc))
    k_new = jnp.asarray(rng.normal(size=(KV, S, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(KV, S, D)).astype(np.float32))
    clen, vlen = jnp.int32(40), jnp.int32(S)

    got = flash_prefill_attention(
        q, kq, vq, clen, k_new, v_new, vlen, k_scale=ksc, v_scale=vsc
    )
    # reference: dequantize cache AND the chunk keys/values the kernel
    # quantizes on entry (one shared rounding for the [cache|chunk] span)
    knq, kns = quantize_kv_block(k_new)
    vnq, vns = quantize_kv_block(v_new)
    want = attn_ops.chunk_prefill_attention(
        q,
        (kq.astype(jnp.float32) * ksc[..., None]),
        (vq.astype(jnp.float32) * vsc[..., None]),
        clen,
        (knq.astype(jnp.float32) * kns[..., None]),
        (vnq.astype(jnp.float32) * vns[..., None]),
        vlen,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )


@pytest.mark.slow
def test_engine_int8_kv_cache(rng):
    """kv_cache_dtype: int8 end-to-end — deterministic, same cache plan as
    bf16, int8 buffers actually in use, batched decode token-exact vs
    sequential under the same quantized cache."""
    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    n_tok = 4 * 4 * 4 // 4
    ids = np.array(
        [10, cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
        + [cfg.vision_end_token_id, 11, 12, 13], dtype=np.int64,
    )
    patches = rng.normal(size=(4 * 4 * 4, cfg.vision.patch_input_dim)).astype(
        np.float32
    )
    grid = np.array([[4, 4, 4]])

    def build(kv_dtype):
        return RetakeConfig.from_dict(
            {
                "kv_cache_dtype": kv_dtype,
                "longvideo_kwargs": {
                    "chunked_prefill_frames": 2, "frame_chunk_size": 2,
                    "kvcache_compression": True,
                    "kvcache_compression_kwargs": {
                        "compression_ratio": 0.6, "pos_embed_reforge": True,
                    },
                },
            }
        )

    eng8 = Qwen2VLEngine(cfg, params, build("int8"))
    r1 = eng8.generate(ids, patches, grid, max_new_tokens=6)
    r2 = eng8.generate(ids, patches, grid, max_new_tokens=6)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)

    eng16 = Qwen2VLEngine(cfg, params, build(None))
    r16 = eng16.generate(ids, patches, grid, max_new_tokens=6)
    assert r1.cache_len == r16.cache_len  # plan identical; values approximate

    # batched decode over the quantized cache: exact vs sequential,
    # including a second request with a DIFFERENT video length (distinct
    # final_len exercises the gap layout's per-request scale regions)
    n2 = 2 * 4 * 4 // 4
    ids2 = np.array(
        [20, cfg.vision_start_token_id] + [cfg.video_token_id] * n2
        + [cfg.vision_end_token_id, 14, 15], dtype=np.int64,
    )
    patches2 = rng.normal(
        size=(2 * 4 * 4, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    grid2 = np.array([[2, 4, 4]])
    r_b = eng8.generate(ids2, patches2, grid2, max_new_tokens=6)
    batch = eng8.generate_batch(
        [dict(input_ids=ids, pixel_values_videos=patches,
              video_grid_thw=grid),
         dict(input_ids=ids2, pixel_values_videos=patches2,
              video_grid_thw=grid2)],
        max_new_tokens=6,
    )
    np.testing.assert_array_equal(batch[0].tokens, r1.tokens)
    np.testing.assert_array_equal(batch[1].tokens, r_b.tokens)


def test_flash_chunk_attention_int8_matches_plain(rng):
    """The XLA online-softmax path's per-block int8 dequant must match the
    plain masked-einsum path over the same quantized cache."""
    from retake_tpu.ops import attention as attn_ops
    from retake_tpu.ops.quantization import quantize_kv_block

    KV, G, S, D, BUDGET = 2, 2, 8, 16, 96
    q = jnp.asarray(rng.normal(size=(KV * G, S, D)).astype(np.float32))
    kq, ksc = quantize_kv_block(
        jnp.asarray(rng.normal(size=(KV, BUDGET, D)).astype(np.float32))
    )
    vq, vsc = quantize_kv_block(
        jnp.asarray(rng.normal(size=(KV, BUDGET, D)).astype(np.float32))
    )
    k_new = jnp.asarray(rng.normal(size=(KV, S, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(KV, S, D)).astype(np.float32))
    clen, vlen = jnp.int32(57), jnp.int32(S)

    got = attn_ops.flash_chunk_attention(
        q, kq, vq, clen, k_new, v_new, vlen, block_size=32,
        k_scale=ksc, v_scale=vsc,
    )
    want = attn_ops.chunk_prefill_attention(
        q, kq, vq, clen, k_new, v_new, vlen, k_scale=ksc, v_scale=vsc
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_quantized_checkpoint_save_load_roundtrip(rng, tmp_path):
    """utils/checkpoint: a quantized pytree saved to disk and reloaded
    produces byte-identical leaves and token-identical generation (the
    tools/quantize_checkpoint.py -> engine fast-load path)."""
    import jax

    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils import checkpoint
    from retake_tpu.utils.config import RetakeConfig

    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quant.quantize_llm_int8(params)
    out = str(tmp_path / "ckpt")
    checkpoint.save_params(
        qparams, out, meta={"model_name": "qwen2_vl", "weights": "int8"}
    )
    assert checkpoint.has_params(out)
    assert checkpoint.load_meta(out)["weights"] == "int8"
    loaded = checkpoint.load_params(out)

    # every leaf identical (dtype + bytes)
    flat_a = jax.tree_util.tree_leaves_with_path(qparams)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        assert va.dtype == vb.dtype, (pa, va.dtype, vb.dtype)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    n_tok = 2 * 4 * 4 // 4
    ids = np.array(
        [10, cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
        + [cfg.vision_end_token_id, 11, 12], dtype=np.int64,
    )
    patches = rng.normal(
        size=(2 * 4 * 4, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    grid = np.array([[2, 4, 4]])
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    a = Qwen2VLEngine(cfg, qparams, rt).generate(
        ids, patches, grid, max_new_tokens=4
    )
    b = Qwen2VLEngine(cfg, loaded, rt).generate(
        ids, patches, grid, max_new_tokens=4
    )
    np.testing.assert_array_equal(a.tokens, b.tokens)
