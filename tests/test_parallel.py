"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the GSPMD dp x tp design (parallel/mesh.py) the way the driver's
dryrun does, plus: sharded outputs match the single-device reference, and the
path-based sharding rules cover both bf16 and int8 parameter trees.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from retake_tpu.models.qwen2_vl import params as params_lib, text
from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
from retake_tpu.parallel import mesh as mesh_lib
from retake_tpu.runtime import cache as cache_lib


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def _run_chunk(cfg, params, embeds, pos, budget=64):
    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, budget, cfg.head_dim,
        dtype=jnp.float32,
    )
    hidden, kv = text.decoder_chunk(
        params, cfg, kv, embeds, pos, jnp.int32(embeds.shape[0]),
        jnp.zeros(embeds.shape[0], bool), jnp.int32(embeds.shape[0] // 2),
        compress=True, reforge=True,
    )
    return hidden, kv


def test_tp_sharded_matches_single_device(setup, rng):
    cfg, params = setup
    s = 16
    embeds = jnp.asarray(
        rng.normal(size=(s, cfg.hidden_size)) * 0.1, jnp.float32
    )
    pos = jnp.asarray(
        np.broadcast_to(np.arange(s, dtype=np.int32), (3, s))
    )
    ref_hidden, ref_kv = jax.jit(
        lambda p, e, q: _run_chunk(cfg, p, e, q)
    )(params, embeds, pos)

    mesh = mesh_lib.make_mesh(dp=1, tp=2)
    sharded = mesh_lib.shard_params(params, mesh)
    with jax.set_mesh(mesh):
        hidden, kv = jax.jit(lambda p, e, q: _run_chunk(cfg, p, e, q))(
            sharded, embeds, pos
        )
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(ref_hidden), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv.k), np.asarray(ref_kv.k), atol=1e-4
    )
    assert int(kv.length) == s // 2


def test_shardings_cover_int8_tree(setup):
    cfg, _ = setup
    qparams = params_lib.init_params(
        cfg, seed=0, dtype=jnp.float32, quantize_int8=True
    )
    mesh = mesh_lib.make_mesh(dp=1, tp=2)
    sharded = mesh_lib.shard_params(qparams, mesh)  # must not raise
    spec = sharded["layers"]["q"]["w"].sharding.spec
    assert spec == P(None, None, "tp")
    assert sharded["layers"]["q"]["scale"].sharding.spec == P(None, "tp")
    assert sharded["layers"]["o"]["w"].sharding.spec == P(None, "tp", None)


def test_dp_batched_requests(setup, rng):
    """Two requests vmapped over a dp-sharded batch axis."""
    cfg, params = setup
    mesh = mesh_lib.make_mesh(dp=2, tp=2)
    sharded = mesh_lib.shard_params(params, mesh)
    s, batch = 8, 2
    embeds = jnp.asarray(
        rng.normal(size=(batch, s, cfg.hidden_size)) * 0.1, jnp.float32
    )
    pos = jnp.asarray(
        np.broadcast_to(np.arange(s, dtype=np.int32), (batch, 3, s))
    )
    bsh = NamedSharding(mesh, P("dp"))
    embeds = jax.device_put(embeds, bsh)
    pos = jax.device_put(pos, bsh)

    def one(e, q):
        h, kv = _run_chunk(cfg, sharded, e, q)
        return h, kv.length

    with jax.set_mesh(mesh):
        h, lengths = jax.jit(jax.vmap(one))(embeds, pos)
        h.block_until_ready()
    assert h.shape == (batch, s, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(lengths), [s // 2, s // 2])


def test_vit_frame_sharded_matches_single_device(setup, rng):
    """TP vision tower: frames shard over tp with zero collectives
    (_vit_chunk_tp); outputs must match the replicated single-device tower
    exactly up to fp tolerance."""
    from retake_tpu.runtime import engine as eng_mod

    cfg, params = setup
    grid_t, h, w = 4, 4, 4
    patches = jnp.asarray(
        rng.normal(size=(grid_t * h * w, cfg.vision.patch_input_dim)) * 0.1,
        jnp.float32,
    )
    ref = eng_mod._vit_chunk(params, cfg, patches, grid_t, h, w, False)
    mesh = mesh_lib.make_mesh(dp=1, tp=2)
    out = eng_mod._vit_chunk_tp(
        params["visual"], cfg, patches, grid_t, h, w, False, mesh
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4
    )


def test_engine_run_vision_uses_tp_mesh(setup, rng):
    """Engine-level: with a tp>1 cache sharding the vision tower takes the
    frame-sharded path and produces the same embeddings."""
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg, params = setup
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"frame_chunk_size": 2,
                              "chunked_prefill_frames": 2}}
    )
    grid = np.array([[4, 4, 4]])
    patches = (rng.normal(size=(4 * 16, cfg.vision.patch_input_dim)) * 0.1
               ).astype(np.float32)
    ref = Qwen2VLEngine(cfg, params, rt).run_vision(patches, grid)
    mesh = mesh_lib.make_mesh(dp=1, tp=2)
    eng = Qwen2VLEngine(
        cfg, mesh_lib.shard_params(params, mesh), rt,
        cache_sharding=mesh_lib.cache_shardings(mesh),
    )
    out = eng.run_vision(patches, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_llava_tp_engine_matches_single_device(rng):
    """LLaVA TP: frame-sharded SigLIP tower (_siglip_chunk_tp) + kv-head-
    sharded cache — full-engine greedy tokens match the unsharded engine."""
    import torch
    import transformers

    from retake_tpu.models.llava_onevision import params as lparams_lib
    from retake_tpu.models.llava_onevision.config import (
        LlavaOnevisionConfig, SiglipVisionConfig,
    )
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.runtime.llava_engine import (
        LlavaOnevisionEngine, _siglip_chunk, _siglip_chunk_tp,
    )
    from retake_tpu.utils.config import RetakeConfig

    text_kwargs = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
    )
    hf_cfg = transformers.LlavaOnevisionConfig(
        text_config=dict(text_kwargs, model_type="qwen2"),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
            model_type="siglip_vision_model", vision_use_head=False,
        ),
        image_token_index=5, video_token_index=6,
        vision_feature_select_strategy="full", vision_feature_layer=-1,
    )
    torch.manual_seed(3)
    hf_model = (transformers.LlavaOnevisionForConditionalGeneration(hf_cfg)
                .eval().float())
    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(mrope_section=None, **text_kwargs),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5, video_token_id=6,
    )
    params = lparams_lib.from_torch_model(cfg, hf_model, dtype=jnp.float32)

    frames = rng.integers(0, 255, size=(4, 16, 16, 3), dtype=np.uint8)
    ref = _siglip_chunk(params, cfg.vision, jnp.asarray(frames), False)
    mesh = mesh_lib.make_mesh(dp=1, tp=2)
    out = _siglip_chunk_tp(
        params["vision_tower"], cfg.vision, jnp.asarray(frames), False, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    n_tok = 4 * cfg.tokens_per_frame + 1
    ids = np.concatenate([
        rng.integers(10, 500, size=4),
        np.full(n_tok, cfg.video_token_id),
        rng.integers(10, 500, size=6),
    ]).astype(np.int64)
    base = LlavaOnevisionEngine(cfg, params, rt).generate(
        ids, frames, max_new_tokens=5
    )
    sharded_params = mesh_lib.shard_params(params, mesh)
    eng_tp = LlavaOnevisionEngine(
        cfg, sharded_params, rt,
        cache_sharding=mesh_lib.cache_shardings(mesh),
    )
    got = eng_tp.generate(ids, frames, max_new_tokens=5)
    np.testing.assert_array_equal(got.tokens, base.tokens)
