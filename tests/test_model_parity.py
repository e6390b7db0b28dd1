"""Tiny random-weight parity tests: our JAX Qwen2-VL vs HF torch (CPU).

These validate the bare model stack (decoder w/o compression, ViT, M-RoPE
position indexing) against the implementation the reference monkeypatches.
All in float32 to isolate math errors from dtype noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from retake_tpu.models.qwen2_vl import text, vision, params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime import cache as cache_lib


@pytest.fixture(scope="module")
def tiny():
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        tie_word_embeddings=False,
        vision_config=dict(
            depth=2,
            embed_dim=32,
            hidden_size=64,
            mlp_ratio=2,
            num_heads=2,
            in_channels=3,
            patch_size=2,
            spatial_merge_size=2,
            temporal_patch_size=2,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval().float()

    cfg = Qwen2VLConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        mrope_section=(4, 2, 2),
        tie_word_embeddings=False,
        vision=Qwen2VisionConfig(
            depth=2,
            embed_dim=32,
            hidden_size=64,
            mlp_ratio=2,
            num_heads=2,
            in_channels=3,
            patch_size=2,
            spatial_merge_size=2,
            temporal_patch_size=2,
        ),
    )
    params = params_lib.from_torch_model(cfg, hf_model, dtype=jnp.float32)
    return hf_model, cfg, params


def test_decoder_full_attention_parity(tiny, rng):
    hf_model, cfg, params = tiny
    s = 12
    embeds = rng.normal(size=(s, cfg.hidden_size)).astype(np.float32) * 0.1
    pos = np.broadcast_to(np.arange(s, dtype=np.int64), (3, 1, s)).copy()

    with torch.no_grad():
        hf_out = hf_model.model.language_model(
            inputs_embeds=torch.from_numpy(embeds)[None],
            position_ids=torch.from_numpy(pos),
            use_cache=False,
        ).last_hidden_state[0]

    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, 16, cfg.head_dim,
        dtype=jnp.float32,
    )
    hidden, kv2 = text.decoder_chunk(
        params,
        cfg,
        kv,
        jnp.asarray(embeds),
        jnp.asarray(pos[:, 0].astype(np.int32)),
        jnp.int32(s),
        jnp.zeros(s, bool),
        jnp.int32(s),
        compress=False,
        reforge=False,
    )
    # hf last_hidden_state includes the final norm; ours doesn't.
    # fp32 tolerance: jax/torch exp+reduction orders differ by ~1e-5/layer and
    # random-init activations grow unnormalized; production dtype is bf16.
    ours = text.rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)
    np.testing.assert_allclose(
        np.asarray(ours), hf_out.numpy(), atol=3e-3, rtol=3e-3
    )
    assert int(kv2.length) == s


def test_decoder_cached_chunks_match_single_pass(tiny, rng):
    """Two chunks through the cache == one full pass (no compression)."""
    hf_model, cfg, params = tiny
    s = 16
    embeds = rng.normal(size=(s, cfg.hidden_size)).astype(np.float32) * 0.1
    pos = np.broadcast_to(np.arange(s, dtype=np.int32), (3, s)).copy()

    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, 32, cfg.head_dim,
        dtype=jnp.float32,
    )
    full, _ = text.decoder_chunk(
        params, cfg, kv, jnp.asarray(embeds), jnp.asarray(pos),
        jnp.int32(s), jnp.zeros(s, bool), jnp.int32(s),
        compress=False, reforge=False,
    )
    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, 32, cfg.head_dim,
        dtype=jnp.float32,
    )
    h1, kv = text.decoder_chunk(
        params, cfg, kv, jnp.asarray(embeds[:10]), jnp.asarray(pos[:, :10]),
        jnp.int32(10), jnp.zeros(10, bool), jnp.int32(10),
        compress=False, reforge=False,
    )
    h2, kv = text.decoder_chunk(
        params, cfg, kv, jnp.asarray(embeds[10:]), jnp.asarray(pos[:, 10:]),
        jnp.int32(6), jnp.zeros(6, bool), jnp.int32(6),
        compress=False, reforge=False,
    )
    chunked = np.concatenate([np.asarray(h1), np.asarray(h2)])
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-5)


def test_decoder_padding_invariance(tiny, rng):
    """Padded chunk tail must not change valid-token outputs or the cache."""
    hf_model, cfg, params = tiny
    s, pad = 9, 7
    embeds = rng.normal(size=(s, cfg.hidden_size)).astype(np.float32) * 0.1
    pos = np.broadcast_to(np.arange(s + pad, dtype=np.int32), (3, s + pad)).copy()

    def run(x, n, total):
        kv = cache_lib.init_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, 32, cfg.head_dim,
            dtype=jnp.float32,
        )
        return text.decoder_chunk(
            params, cfg, kv, jnp.asarray(x), jnp.asarray(pos[:, :total]),
            jnp.int32(n), jnp.zeros(total, bool), jnp.int32(n),
            compress=False, reforge=False,
        )

    base, kv_a = run(embeds, s, s)
    padded_x = np.concatenate(
        [embeds, rng.normal(size=(pad, cfg.hidden_size)).astype(np.float32)]
    )
    padded, kv_b = run(padded_x, s, s + pad)
    np.testing.assert_allclose(np.asarray(padded)[:s], np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kv_b.k)[:, :, :s], np.asarray(kv_a.k)[:, :, :s], atol=1e-6
    )


def test_vision_tower_parity(tiny, rng):
    hf_model, cfg, params = tiny
    v = cfg.vision
    t, h, w = 2, 4, 4
    patches = rng.normal(size=(t * h * w, v.patch_input_dim)).astype(np.float32)
    grid = torch.tensor([[t, h, w]])
    with torch.no_grad():
        hf_out = hf_model.model.visual(torch.from_numpy(patches), grid_thw=grid)
    ours = vision.vision_tower(
        params["visual"], v, jnp.asarray(patches), t, h, w
    )
    np.testing.assert_allclose(np.asarray(ours), hf_out.numpy(), atol=3e-4)


def test_logits_parity(tiny, rng):
    hf_model, cfg, params = tiny
    s = 8
    ids = rng.integers(0, cfg.vocab_size, size=s)
    pos = np.broadcast_to(np.arange(s, dtype=np.int64), (3, 1, s)).copy()
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.from_numpy(ids)[None],
            position_ids=torch.from_numpy(pos),
            use_cache=False,
        ).logits[0, -1]
    kv = cache_lib.init_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, 16, cfg.head_dim,
        dtype=jnp.float32,
    )
    embeds = text.embed(params, jnp.asarray(ids))
    hidden, _ = text.decoder_chunk(
        params, cfg, kv, embeds, jnp.asarray(pos[:, 0].astype(np.int32)),
        jnp.int32(s), jnp.zeros(s, bool), jnp.int32(s),
        compress=False, reforge=False,
    )
    ours = text.final_logits(params, cfg, hidden[s - 1])
    got = np.asarray(ours)
    exp = hf_logits.numpy()
    assert got.argmax() == exp.argmax()
    np.testing.assert_allclose(got, exp, atol=5e-3, rtol=5e-3)
