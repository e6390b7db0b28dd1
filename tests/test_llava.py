"""LLaVA-OneVision engine golden tests vs HF torch on a tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from retake_tpu.models.llava_onevision import params as params_lib
from retake_tpu.models.llava_onevision.config import (
    LlavaOnevisionConfig,
    SiglipVisionConfig,
)
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine
from retake_tpu.utils.config import RetakeConfig


@pytest.fixture(scope="module")
def tiny():
    text_cfg = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
        model_type="qwen2",
    )
    vision_cfg = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=4,
        model_type="siglip_vision_model", vision_use_head=False,
    )
    hf_cfg = transformers.LlavaOnevisionConfig(
        text_config=text_cfg,
        vision_config=vision_cfg,
        image_token_index=5,
        video_token_index=6,
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
    )
    torch.manual_seed(3)
    hf_model = (
        transformers.LlavaOnevisionForConditionalGeneration(hf_cfg)
        .eval()
        .float()
    )
    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=4096, rope_theta=10000.0,
            tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
            mrope_section=None,
        ),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5,
        video_token_id=6,
    )
    params = params_lib.from_torch_model(cfg, hf_model, dtype=jnp.float32)
    return hf_model, cfg, params


def make_request(cfg, rng, frames=3):
    n_tok = frames * cfg.tokens_per_frame + 1  # +1 image_newline
    pre = rng.integers(10, 500, size=4).tolist()
    post = rng.integers(10, 500, size=6).tolist()
    ids = np.array(pre + [cfg.video_token_id] * n_tok + post, dtype=np.int64)
    vid = rng.integers(
        0, 255, size=(frames, cfg.vision.image_size, cfg.vision.image_size, 3),
        dtype=np.uint8,
    )
    return ids, vid


def hf_generate(hf_model, cfg, ids, vid, max_new):
    # HF expects [B, T, C, H, W] float pixel values (already normalized)
    px = (vid.astype(np.float32) / 255.0 - 0.5) / 0.5
    px = torch.from_numpy(px).permute(0, 3, 1, 2)[None]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values_videos=px,
            do_sample=False, max_new_tokens=max_new,
        )
    return out[0, len(ids):].numpy()


def test_llava_generate_matches_hf_unchunked(tiny, rng):
    hf_model, cfg, params = tiny
    ids, vid = make_request(cfg, rng)
    expected = hf_generate(hf_model, cfg, ids, vid, 6)
    engine = LlavaOnevisionEngine(cfg, params, RetakeConfig())
    got = engine.generate(ids, vid, max_new_tokens=6)
    np.testing.assert_array_equal(got.tokens, expected)


def test_llava_generate_matches_hf_chunked(tiny, rng):
    hf_model, cfg, params = tiny
    ids, vid = make_request(cfg, rng, frames=6)
    expected = hf_generate(hf_model, cfg, ids, vid, 6)
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 4}}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    got = engine.generate(ids, vid, max_new_tokens=6)
    np.testing.assert_array_equal(got.tokens, expected)


def test_llava_retake_path_runs(tiny, rng):
    """Full retake config: DPSelect pre-projector + PivotKV 1-D reforge."""
    hf_model, cfg, params = tiny
    ids, vid = make_request(cfg, rng, frames=8)
    rt = RetakeConfig.from_dict(
        {
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2,
                "frame_chunk_size": 4,
                "visual_compression": True,
                "visual_compression_kwargs": {
                    "compression_ratio": 0.5,
                    "compression_method": "Keyframe",
                    "patch_sync": False,
                    "return_keyframe_mask": True,
                },
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "dynamic_compression_ratio": True,
                    "compression_method": "pivotkv",
                    "pos_embed_reforge": True,
                    "max_input_length": 16,
                },
            }
        }
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    r1 = engine.generate(ids, vid, max_new_tokens=4)
    r2 = engine.generate(ids, vid, max_new_tokens=4)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)
    # visual compression halved the frames; KV compression capped the cache
    assert r1.input_len < len(ids)
    assert r1.cache_len < r1.input_len


def _anyres_image(cfg, rng, oh, ow):
    """Random anyres tiles + ids span length for an (oh, ow) image."""
    from retake_tpu.models.llava_onevision import anyres

    n_patch = anyres.image_size_to_num_patches(
        (oh, ow), cfg.image_grid_pinpoints, cfg.vision.image_size
    )
    s = cfg.vision.image_size
    tiles = rng.integers(0, 255, size=(1, n_patch, s, s, 3), dtype=np.uint8)
    # token count: base tile + unpadded spatial grid + newline per row
    g = cfg.grid_side
    nph, npw = anyres.anyres_grid_shape(
        (oh, ow), cfg.image_grid_pinpoints, cfg.vision.image_size
    )
    h0, h1, w0, w1 = anyres.unpad_bounds((oh, ow), (nph * g, npw * g))
    n_tok = g * g + (h1 - h0) * (w1 - w0 + 1)
    return tiles, np.array([[oh, ow]]), n_tok


@pytest.fixture(scope="module")
def tiny_anyres(tiny):
    """Tiny model pair with matching small image_grid_pinpoints."""
    import dataclasses

    hf_model, cfg, params = tiny
    pins = ((16, 16), (16, 32), (32, 16), (32, 32))
    hf_model.config.image_grid_pinpoints = [list(p) for p in pins]
    cfg = dataclasses.replace(cfg, image_grid_pinpoints=pins)
    return hf_model, cfg, params


def test_llava_image_anyres_matches_hf(tiny_anyres, rng):
    """Still-image anyres path (reference llava_onevision.py:383-416)."""
    hf_model, cfg, params = tiny_anyres
    tiles, sizes, n_tok = _anyres_image(cfg, rng, 20, 35)
    ids = np.array(
        [10, 11] + [cfg.image_token_id] * n_tok + [30, 31], dtype=np.int64
    )
    px = (tiles[0].astype(np.float32) / 255.0 - 0.5) / 0.5
    px = torch.from_numpy(px).permute(0, 3, 1, 2)[None]
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=px,
            image_sizes=torch.from_numpy(sizes),
            do_sample=False, max_new_tokens=6,
        )[0, len(ids):].numpy()
    engine = LlavaOnevisionEngine(cfg, params, RetakeConfig())
    got = engine.generate(
        ids, max_new_tokens=6, pixel_values=tiles, image_sizes=sizes
    )
    np.testing.assert_array_equal(got.tokens, expected)


def test_llava_mixed_image_video_matches_hf(tiny_anyres, rng):
    """Image + video in one sequence, chunked video prefill."""
    hf_model, cfg, params = tiny_anyres
    tiles, sizes, n_tok = _anyres_image(cfg, rng, 16, 16)  # 1-tile image
    frames = 4
    n_vid = frames * cfg.tokens_per_frame + 1
    vid = rng.integers(
        0, 255, size=(frames, cfg.vision.image_size, cfg.vision.image_size, 3),
        dtype=np.uint8,
    )
    ids = np.array(
        [10] + [cfg.image_token_id] * n_tok + [12]
        + [cfg.video_token_id] * n_vid + [30, 31],
        dtype=np.int64,
    )
    px = (tiles[0].astype(np.float32) / 255.0 - 0.5) / 0.5
    px = torch.from_numpy(px).permute(0, 3, 1, 2)[None]
    pv = (vid.astype(np.float32) / 255.0 - 0.5) / 0.5
    pv = torch.from_numpy(pv).permute(0, 3, 1, 2)[None]
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=px, image_sizes=torch.from_numpy(sizes),
            pixel_values_videos=pv,
            do_sample=False, max_new_tokens=6,
        )[0, len(ids):].numpy()
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 4}}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    got = engine.generate(
        ids, vid, max_new_tokens=6, pixel_values=tiles, image_sizes=sizes
    )
    np.testing.assert_array_equal(got.tokens, expected)


@pytest.mark.slow
def test_llava_w8a8_and_batch(tiny, rng):
    """W8A8 LLaVA: SigLIP + projector + text decoder int8-quantized, engine
    runs deterministically; generate_batch token-exact vs sequential
    (bf16 params — batched decode shares engine.decode_batch)."""
    from retake_tpu.ops.quantization import (
        quantize_llm_int8,
        quantize_siglip_int8,
    )

    _, cfg, params = tiny
    qparams = quantize_siglip_int8(quantize_llm_int8(params))
    assert qparams["vision_tower"]["blocks"]["q"]["w"].dtype == jnp.int8
    assert qparams["projector"]["linear_1"]["w"].dtype == jnp.int8

    ids, vid = make_request(cfg, rng, frames=4)
    rt = RetakeConfig.from_dict(
        {
            "quantization": "w8a8",
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2, "frame_chunk_size": 4,
            },
        }
    )
    eng = LlavaOnevisionEngine(cfg, qparams, rt)
    assert eng.act_quant and eng._vision_aq()
    r1 = eng.generate(ids, vid, max_new_tokens=4)
    r2 = eng.generate(ids, vid, max_new_tokens=4)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)

    # batched decode parity on the bf16 engine
    eng_bf = LlavaOnevisionEngine(
        cfg, params,
        RetakeConfig.from_dict(
            {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                                  "frame_chunk_size": 4}}
        ),
    )
    ids2, vid2 = make_request(cfg, rng, frames=6)
    reqs = [
        dict(input_ids=ids, pixel_values_videos=vid),
        dict(input_ids=ids2, pixel_values_videos=vid2),
    ]
    seq = [eng_bf.generate(**r, max_new_tokens=5) for r in reqs]
    batch = eng_bf.generate_batch(reqs, max_new_tokens=5)
    for b, s in zip(batch, seq):
        np.testing.assert_array_equal(b.tokens, s.tokens)


def test_patchify_indivisible_geometry_matches_conv(rng):
    """so400m geometry regression: image_size (384) is NOT divisible by
    patch_size (14); HF's valid-padding Conv2d drops the trailing pixels.
    patchify_frames must crop identically (caught live at 384x384: reshape
    to 27*14=378 crashed before the crop was added)."""
    from retake_tpu.models.llava_onevision import siglip

    vcfg = SiglipVisionConfig(
        hidden_size=8, intermediate_size=16, num_hidden_layers=1,
        num_attention_heads=2, image_size=20, patch_size=6,  # grid 3 -> 18px
    )
    frames = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    patches = siglip.patchify_frames(
        jnp.asarray(frames), vcfg, jnp.float32
    )  # [2, 9, 108]
    assert patches.shape == (2, vcfg.grid**2, 3 * 36)

    w = rng.normal(size=(8, 3, 6, 6)).astype(np.float32)
    conv = torch.nn.Conv2d(3, 8, 6, stride=6, padding="valid", bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        px = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
        want = conv(torch.from_numpy(px).permute(0, 3, 1, 2))  # [2,8,3,3]
        want = want.flatten(2).transpose(1, 2).numpy()  # [2, 9, 8]
    got = np.asarray(patches) @ w.reshape(8, -1).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_llava_video_features_reuse_matches_inline(tiny, rng):
    """encode_video artifact reuse (engine.VideoFeatures): token-exact vs
    the inline SigLIP+DPSelect+projector path, across two questions on the
    same video, including the tgt != t placeholder-truncation path."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "chunked_prefill_frames": 2, "frame_chunk_size": 4,
            "visual_compression": True,
            "visual_compression_kwargs": {"compression_ratio": 0.5,
                                          "return_keyframe_mask": True},
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "dynamic_compression_ratio": True,
                "compression_method": "pivotkv",
                "pos_embed_reforge": True, "max_input_length": 16,
            },
        }}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    ids1, vid = make_request(cfg, rng, frames=8)
    ids2 = np.concatenate(
        [ids1[:-6], rng.integers(10, 500, size=9).astype(np.int64)]
    )
    feats = engine.encode_video(vid)
    for ids in (ids1, ids2):
        inline = engine.generate(ids, vid, max_new_tokens=4)
        reused = engine.generate(ids, video_features=feats, max_new_tokens=4)
        np.testing.assert_array_equal(reused.tokens, inline.tokens)
        assert reused.cache_len == inline.cache_len


@pytest.mark.slow
def test_llava_spec_decode_matches_vanilla(tiny, rng):
    """spec_decode through the shared prefill_and_decode core with the
    LLaVA family (1-D RoPE positions, reforge): tokens identical to the
    s=1 loop."""
    import dataclasses

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "chunked_prefill_frames": 2, "frame_chunk_size": 4,
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "dynamic_compression_ratio": True,
                "compression_method": "pivotkv",
                "pos_embed_reforge": True, "max_input_length": 16,
            },
        }}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    engine_s = LlavaOnevisionEngine(
        cfg, params, dataclasses.replace(rt, spec_decode=True)
    )
    for frames in (4, 8):
        ids, vid = make_request(cfg, rng, frames=frames)
        a = engine.generate(ids, vid, max_new_tokens=17)
        b = engine_s.generate(ids, vid, max_new_tokens=17)
        np.testing.assert_array_equal(b.tokens, a.tokens)
