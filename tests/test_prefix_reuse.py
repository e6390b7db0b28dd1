"""Cross-question LLM-prefill reuse (engine.VideoPrefix).

With prompt_guided_compression off (every shipped eval config — no
``prompt_guided_compression`` key in the reference's
configs/qwen2_vl/retake_qwen2-vl_videomme.yaml), the segment plan up to and
including the last video chunk is question-independent (reference
qwen2_vl.py:670-720: the question enters video chunks only via forge).
``encode_prefix`` snapshots the compressed KV cache there;
``generate(prefix=...)`` runs only the trailing text segment + decode.

Exactness contract under test: reuse is TOKEN-EXACT vs the inline path for
any question whose prefill plan matches the capture, and raises
PrefixMismatch (never silently drifts) when the plan diverges — e.g. the
reference's dynamic compression ratio (qwen2_vl.py:550-557) resolving to
different keep_len values for a much longer question.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.models.llava_onevision.config import (
    LlavaOnevisionConfig,
    SiglipVisionConfig,
)
from retake_tpu.models.llava_onevision import params as llava_params_lib
from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import (
    PrefixMismatch,
    Qwen2VLEngine,
    decode_batch,
)
from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine
from retake_tpu.utils.config import RetakeConfig


VIS = dict(
    depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
    in_channels=3, patch_size=2, spatial_merge_size=2, temporal_patch_size=2,
)
TEXT = dict(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=4096, rope_theta=10000.0,
    tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="module")
def qwen():
    cfg = Qwen2VLConfig(
        **TEXT, mrope_section=(4, 2, 2),
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
        vision=Qwen2VisionConfig(**VIS),
    )
    return cfg, params_lib.init_params(cfg, 0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def llava():
    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(**TEXT, mrope_section=None),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5,
        video_token_id=6,
    )
    return cfg, llava_params_lib.init_params(cfg, 0, dtype=jnp.float32)


def _qwen_rt(**kv_kwargs):
    return RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "frame_chunk_size": 4, "chunked_prefill_frames": 2,
            "visual_compression": True,
            "visual_compression_kwargs": {"compression_ratio": 0.5,
                                          "return_keyframe_mask": True},
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "compression_method": "pivotkv",
                "pos_embed_reforge": True,
                **kv_kwargs,
            },
        }}
    )


def _qwen_request(cfg, rng, question, grid_t=4, gh=4, gw=4):
    m2 = cfg.vision.spatial_merge_size**2
    n_vid = grid_t * gh * gw // m2
    ids = np.array(
        [10, 11, 12, cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_vid + [cfg.vision_end_token_id]
        + list(question),
        dtype=np.int64,
    )
    patches = rng.normal(
        size=(grid_t * gh * gw, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    return ids, patches, np.array([[grid_t, gh, gw]])


def test_qwen_prefix_reuse_token_exact(qwen, rng):
    """Token-exact vs inline for two questions of different lengths, with
    DPSelect (tgt != t reforge) AND PivotKV compression active; the shared
    snapshot must survive repeated use (each generate forks the cache)."""
    cfg, params = qwen
    eng = Qwen2VLEngine(cfg, params, _qwen_rt(compression_ratio=0.5))
    ids1, patches, grid = _qwen_request(cfg, rng, [20, 21, 22, 23, 24])
    ids2, _, _ = _qwen_request(cfg, rng, [30, 31, 32, 33, 34, 35, 36, 37])

    prefix = eng.encode_prefix(ids1, patches, grid, max_new_tokens=6)
    for ids in (ids1, ids2):
        inline = eng.generate(ids, patches, grid, max_new_tokens=6)
        reused = eng.generate(ids, prefix=prefix, max_new_tokens=6)
        np.testing.assert_array_equal(reused.tokens, inline.tokens)
        assert reused.cache_len == inline.cache_len
        assert reused.input_len == inline.input_len
    # snapshot integrity: a second pass over the same prefix is identical
    again = eng.generate(ids2, prefix=prefix, max_new_tokens=6)
    np.testing.assert_array_equal(
        again.tokens, eng.generate(ids2, patches, grid, max_new_tokens=6).tokens
    )


def test_qwen_prefix_from_video_features(qwen, rng):
    """encode_prefix composes with a precomputed VideoFeatures artifact
    (the eval runner's flow: encode_video once -> encode_prefix once)."""
    cfg, params = qwen
    eng = Qwen2VLEngine(cfg, params, _qwen_rt(compression_ratio=0.5))
    ids, patches, grid = _qwen_request(cfg, rng, [40, 41, 42, 43])
    feats = eng.encode_video(patches, grid[0])
    prefix = eng.encode_prefix(ids, video_features=feats, max_new_tokens=6)
    assert prefix.features is feats
    inline = eng.generate(ids, patches, grid, max_new_tokens=6)
    reused = eng.generate(ids, prefix=prefix, max_new_tokens=6)
    np.testing.assert_array_equal(reused.tokens, inline.tokens)


def test_qwen_prefix_mismatch_and_fallback(qwen, rng):
    """A diverging plan raises PrefixMismatch (loud, never silent drift);
    the prefix.features fallback then reproduces the inline tokens."""
    cfg, params = qwen
    # dynamic ratio with a threshold the prompts straddle: question length
    # changes the resolved keep_len values
    eng = Qwen2VLEngine(
        cfg, params,
        _qwen_rt(dynamic_compression_ratio=True, max_input_length=16),
    )
    ids1, patches, grid = _qwen_request(cfg, rng, [20, 21, 22])
    long_q = rng.integers(10, 500, size=40).tolist()
    ids2, _, _ = _qwen_request(cfg, rng, long_q)
    prefix = eng.encode_prefix(ids1, patches, grid, max_new_tokens=4)
    with pytest.raises(PrefixMismatch):
        eng.generate(ids2, prefix=prefix, max_new_tokens=4)
    # different prompt prefix (system tokens) is also a loud mismatch
    bad = ids1.copy()
    bad[0] = 99
    with pytest.raises(PrefixMismatch):
        eng.generate(bad, prefix=prefix, max_new_tokens=4)
    inline = eng.generate(ids2, patches, grid, max_new_tokens=4)
    fallback = eng.generate(
        ids2, video_features=prefix.features, max_new_tokens=4
    )
    np.testing.assert_array_equal(fallback.tokens, inline.tokens)


def test_qwen_prefix_guard_rails(qwen, rng):
    cfg, params = qwen
    ids, patches, grid = _qwen_request(cfg, rng, [20, 21, 22])
    # prompt-guided compression folds the question into every video chunk
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "frame_chunk_size": 4, "chunked_prefill_frames": 2,
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "compression_ratio": 0.5, "compression_method": "pivotkv",
                "pos_embed_reforge": True,
                "prompt_guided_compression": True,
            },
        }}
    )
    with pytest.raises(ValueError, match="prompt_guided"):
        Qwen2VLEngine(cfg, params, rt).encode_prefix(
            ids, patches, grid, max_new_tokens=4
        )
    # a prompt that ends with the video span cannot seed the first token
    eng = Qwen2VLEngine(cfg, params, _qwen_rt(compression_ratio=0.5))
    no_suffix = ids[: int(np.where(ids == cfg.vision_end_token_id)[0][0])]
    with pytest.raises(ValueError, match="trailing text"):
        eng.encode_prefix(no_suffix, patches, grid, max_new_tokens=4)


def test_qwen_prefix_batched_decode(qwen, rng):
    """prefix reuse composes with the prefill-state / batched-decode path
    (eval_batch_size wiring): tokens match the sequential reuse path."""
    cfg, params = qwen
    rt = _qwen_rt(compression_ratio=0.5)
    eng = Qwen2VLEngine(cfg, params, rt)
    ids1, patches, grid = _qwen_request(cfg, rng, [20, 21, 22, 23, 24])
    ids2, _, _ = _qwen_request(cfg, rng, [30, 31, 32, 33, 34])
    prefix = eng.encode_prefix(ids1, patches, grid, max_new_tokens=6)
    seq = [eng.generate(i, prefix=prefix, max_new_tokens=6)
           for i in (ids1, ids2)]
    states = [eng.generate(i, prefix=prefix, max_new_tokens=6,
                           _prefill_only=True) for i in (ids1, ids2)]
    batched = decode_batch(params, cfg, rt, states, 6)
    for s, b in zip(seq, batched):
        np.testing.assert_array_equal(b.tokens, s.tokens)


@pytest.mark.slow
def test_qwen_prefix_reuse_int8_kv(qwen, rng):
    """kv_cache_dtype: int8 — the VideoPrefix snapshot carries the k/v
    scale planes (the cache fork is a whole-pytree copy), and reuse stays
    token-exact: inline and reuse share byte-identical int8 cache contents
    for the prefix steps (single rounding site), so the suffix prefill and
    decode see the same numerics."""
    cfg, params = qwen
    rt = RetakeConfig.from_dict(
        {"kv_cache_dtype": "int8",
         "longvideo_kwargs": {
             "frame_chunk_size": 4, "chunked_prefill_frames": 2,
             "kvcache_compression": True,
             "kvcache_compression_kwargs": {
                 "compression_ratio": 0.5,
                 "compression_method": "pivotkv",
                 "pos_embed_reforge": True,
             },
         }}
    )
    eng = Qwen2VLEngine(cfg, params, rt)
    ids1, patches, grid = _qwen_request(cfg, rng, [20, 21, 22, 23, 24])
    ids2, _, _ = _qwen_request(cfg, rng, [30, 31, 32, 33, 34, 35, 36, 37])
    prefix = eng.encode_prefix(ids1, patches, grid, max_new_tokens=6)
    assert prefix.cache.k.dtype == jnp.int8
    assert prefix.cache.k_scale is not None
    for ids in (ids1, ids2):
        inline = eng.generate(ids, patches, grid, max_new_tokens=6)
        reused = eng.generate(ids, prefix=prefix, max_new_tokens=6)
        np.testing.assert_array_equal(reused.tokens, inline.tokens)
        assert reused.cache_len == inline.cache_len
    # snapshot integrity under int8: reuse must not have mutated the scales
    again = eng.generate(ids1, prefix=prefix, max_new_tokens=6)
    np.testing.assert_array_equal(
        again.tokens, eng.generate(ids1, patches, grid, max_new_tokens=6).tokens
    )


def test_llava_prefix_reuse_token_exact(llava, rng):
    """LLaVA family: token-exact reuse across two questions, including the
    tgt != t placeholder-truncation path and 1-D positions."""
    cfg, params = llava
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "chunked_prefill_frames": 2, "frame_chunk_size": 4,
            "visual_compression": True,
            "visual_compression_kwargs": {"compression_ratio": 0.5,
                                          "return_keyframe_mask": True},
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "compression_ratio": 0.5,
                "compression_method": "pivotkv",
                "pos_embed_reforge": True,
            },
        }}
    )
    eng = LlavaOnevisionEngine(cfg, params, rt)
    frames = 8
    n_tok = frames * cfg.tokens_per_frame + 1
    pre = [10, 11, 12, 13]
    vid = rng.integers(
        0, 255, size=(frames, cfg.vision.image_size, cfg.vision.image_size, 3),
        dtype=np.uint8,
    )
    ids1 = np.array(
        pre + [cfg.video_token_id] * n_tok + [20, 21, 22, 23, 24, 25],
        dtype=np.int64,
    )
    ids2 = np.array(
        pre + [cfg.video_token_id] * n_tok + [30, 31, 32, 33],
        dtype=np.int64,
    )
    prefix = eng.encode_prefix(ids1, vid, max_new_tokens=5)
    for ids in (ids1, ids2):
        inline = eng.generate(ids, vid, max_new_tokens=5)
        reused = eng.generate(ids, prefix=prefix, max_new_tokens=5)
        np.testing.assert_array_equal(reused.tokens, inline.tokens)
        assert reused.cache_len == inline.cache_len
