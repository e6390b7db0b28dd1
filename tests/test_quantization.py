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

