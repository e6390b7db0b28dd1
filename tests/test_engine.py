"""End-to-end engine tests on the tiny random model.

The golden test drives the full pipeline (ViT -> embed scatter -> chunked
prefill -> greedy decode) against HF ``generate`` on the identical tiny torch
model — the same comparison surface the reference treats as its acceptance
test (demo golden answers, SURVEY.md §4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from retake_tpu.models.qwen2_vl import params as params_lib, text
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime import cache as cache_lib
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.utils.config import RetakeConfig


VIS = dict(
    depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
    in_channels=3, patch_size=2, spatial_merge_size=2, temporal_patch_size=2,
)


@pytest.fixture(scope="module")
def tiny():
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        tie_word_embeddings=False, vision_config=dict(VIS),
        attn_implementation="eager",
        bos_token_id=0, eos_token_id=1,
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
    )
    torch.manual_seed(1)
    hf_model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    cfg = Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        mrope_section=(4, 2, 2), tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=1,
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
        vision=Qwen2VisionConfig(**VIS),
    )
    params = params_lib.from_torch_model(cfg, hf_model, dtype=jnp.float32)
    return hf_model, cfg, params


def make_video_request(cfg, rng, grid_t=2, grid_h=4, grid_w=4, prompt_len=5):
    """input_ids with a video span + random pixel patches."""
    m2 = cfg.vision.spatial_merge_size**2
    n_video_tokens = grid_t * grid_h * grid_w // m2
    pre = rng.integers(10, 500, size=3).tolist()
    post = rng.integers(10, 500, size=prompt_len).tolist()
    ids = np.array(
        pre + [cfg.vision_start_token_id] + [cfg.video_token_id] * n_video_tokens
        + [cfg.vision_end_token_id] + post,
        dtype=np.int64,
    )
    patches = rng.normal(
        size=(grid_t * grid_h * grid_w, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    grid = np.array([[grid_t, grid_h, grid_w]])
    return ids, patches, grid


def hf_generate(hf_model, ids, patches, grid, max_new):
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.from_numpy(grid),
            do_sample=False, max_new_tokens=max_new,
        )
    return out[0, len(ids):].numpy()


def test_generate_matches_hf_unchunked(tiny, rng):
    """No chunking, no compression: single text-mode pass + decode."""
    hf_model, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng)
    expected = hf_generate(hf_model, ids, patches, grid, 6)
    engine = Qwen2VLEngine(cfg, params, RetakeConfig())
    got = engine.generate(ids, patches, grid, max_new_tokens=6)
    np.testing.assert_array_equal(got.tokens, expected)


def test_generate_matches_hf_chunked(tiny, rng):
    """Chunked prefill (4 video chunks), still no compression."""
    hf_model, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng, grid_t=4)
    expected = hf_generate(hf_model, ids, patches, grid, 6)
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    got = engine.generate(ids, patches, grid, max_new_tokens=6)
    np.testing.assert_array_equal(got.tokens, expected)


def test_compress_keep_all_equals_no_compress(tiny, rng):
    """compress path with keep_len == q_len must reproduce the plain cache."""
    _, cfg, params = tiny
    s = 8
    embeds = rng.normal(size=(s, cfg.hidden_size)).astype(np.float32) * 0.1
    pos = np.broadcast_to(np.arange(s, dtype=np.int32), (3, s)).copy()

    def run(compress, reforge):
        kv = cache_lib.init_cache(2, 2, 16, cfg.head_dim, dtype=jnp.float32)
        return text.decoder_chunk(
            params, cfg, kv, jnp.asarray(embeds), jnp.asarray(pos),
            jnp.int32(s), jnp.zeros(s, bool), jnp.int32(s),
            compress=compress, reforge=reforge,
        )

    h_plain, kv_plain = run(False, False)
    h_comp, kv_comp = run(True, False)
    np.testing.assert_allclose(np.asarray(h_comp), np.asarray(h_plain), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kv_comp.k)[:, :, :s], np.asarray(kv_plain.k)[:, :, :s], atol=1e-6
    )
    # with reforge: rotate->derotate->rerotate round-trip at identical
    # positions; identity up to fp noise
    h_ref, kv_ref = run(True, True)
    np.testing.assert_allclose(
        np.asarray(kv_ref.k)[:, :, :s], np.asarray(kv_plain.k)[:, :, :s], atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(kv_ref.pos)[:, :, :s], np.asarray(kv_plain.pos)[:, :, :s]
    )


def test_generate_with_pivotkv_compression(tiny, rng):
    """Full retake path: DPSelect keyframe mask + PivotKV + reforge.

    Token-exactness of the composed loop is covered by the independent numpy
    oracle (tests/test_composed_oracle.py); this checks the engine-level
    contract: cache length == host plan == max_input_length cap,
    deterministic output, plausible tokens.
    """
    hf_model, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng, grid_t=8, grid_h=4, grid_w=4)
    rt = RetakeConfig.from_dict(
        {
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2,
                "frame_chunk_size": 4,
                "visual_compression": True,
                "visual_compression_kwargs": {
                    "compression_ratio": 1.0,
                    "compression_method": "Keyframe",
                    "patch_sync": False,
                    "return_keyframe_mask": True,
                },
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "dynamic_compression_ratio": True,
                    "compression_method": "pivotkv",
                    "pos_embed_reforge": True,
                    "max_input_length": 24,
                },
            }
        }
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    r1 = engine.generate(ids, patches, grid, max_new_tokens=5)
    r2 = engine.generate(ids, patches, grid, max_new_tokens=5)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)
    assert r1.input_len > 24  # compression actually triggered
    # cache holds ~ratio * video + text, never more than input length
    assert r1.cache_len < r1.input_len
    assert (r1.tokens >= 0).all() and (r1.tokens < cfg.vocab_size).all()


def make_image_inputs(cfg, rng, grids):
    """Concatenated image patches + [n,3] grids (HF pixel_values layout)."""
    total = sum(t * h * w for t, h, w in grids)
    patches = rng.normal(size=(total, cfg.vision.patch_input_dim)).astype(
        np.float32
    )
    return patches, np.asarray(grids, dtype=np.int64)


def test_generate_matches_hf_image_only(tiny, rng):
    """Still-image inputs (reference qwen2_vl.py:593-595, 633-646)."""
    hf_model, cfg, params = tiny
    m2 = cfg.vision.spatial_merge_size**2
    img_pixels, img_grid = make_image_inputs(cfg, rng, [(1, 4, 4)])
    n_img = 16 // m2
    ids = np.array(
        [10, 11] + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_img + [cfg.vision_end_token_id]
        + [30, 31, 32],
        dtype=np.int64,
    )
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=torch.from_numpy(img_pixels),
            image_grid_thw=torch.from_numpy(img_grid),
            do_sample=False, max_new_tokens=6,
        )[0, len(ids):].numpy()
    engine = Qwen2VLEngine(cfg, params, RetakeConfig())
    got = engine.generate(
        ids, max_new_tokens=6,
        pixel_values=img_pixels, image_grid_thw=img_grid,
    )
    np.testing.assert_array_equal(got.tokens, expected)


def test_generate_matches_hf_mixed_image_video_chunked(tiny, rng):
    """Interleaved image + video + image with chunked prefill: images must
    ride the text-segment path while the video span chunks."""
    hf_model, cfg, params = tiny
    m2 = cfg.vision.spatial_merge_size**2
    vid_ids, patches, grid = make_video_request(cfg, rng, grid_t=4)
    img_pixels, img_grid = make_image_inputs(cfg, rng, [(1, 4, 4), (1, 2, 4)])
    n1, n2 = 16 // m2, 8 // m2
    ids = np.concatenate([
        [12, cfg.vision_start_token_id], [cfg.image_token_id] * n1,
        [cfg.vision_end_token_id],
        vid_ids,
        [cfg.vision_start_token_id], [cfg.image_token_id] * n2,
        [cfg.vision_end_token_id, 40, 41],
    ]).astype(np.int64)
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=torch.from_numpy(img_pixels),
            image_grid_thw=torch.from_numpy(img_grid),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.from_numpy(grid),
            do_sample=False, max_new_tokens=6,
        )[0, len(ids):].numpy()
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    got = engine.generate(
        ids, patches, grid, max_new_tokens=6,
        pixel_values=img_pixels, image_grid_thw=img_grid,
    )
    np.testing.assert_array_equal(got.tokens, expected)


def test_pallas_impl_matches_flash_full_pipeline(tiny, rng):
    """attn_implementation=pallas (fused eviction scoring in the kernel) must
    reproduce the flash/XLA path token-for-token through the full retake
    pipeline, including the final cache state."""
    _, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng, grid_t=8, grid_h=4, grid_w=4)
    base = {
        "longvideo_kwargs": {
            "chunked_prefill_frames": 2,
            "frame_chunk_size": 4,
            "visual_compression": True,
            "visual_compression_kwargs": {
                "compression_ratio": 1.0,
                "compression_method": "Keyframe",
                "return_keyframe_mask": True,
            },
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "dynamic_compression_ratio": True,
                "compression_method": "pivotkv",
                "pos_embed_reforge": True,
                "max_input_length": 24,
            },
        }
    }
    results = {}
    for impl in ("flash", "pallas"):
        d = dict(base, attn_implementation=impl)
        engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(d))
        results[impl] = engine.generate(ids, patches, grid, max_new_tokens=5)
    np.testing.assert_array_equal(
        results["pallas"].tokens, results["flash"].tokens
    )
    assert results["pallas"].cache_len == results["flash"].cache_len


@pytest.mark.slow
def test_do_sample_seeded_deterministic(tiny, rng):
    """Config do_sample is honored: seeded sampling is deterministic under a
    fixed seed, and near-zero temperature reproduces greedy (reference
    forwards do_sample to HF generate, infer_eval.py:53,110)."""
    hf_model, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng)

    def run(**kw):
        engine = Qwen2VLEngine(cfg, params, RetakeConfig(**kw))
        return engine.generate(ids, patches, grid, max_new_tokens=8).tokens

    greedy = run()
    s1 = run(do_sample=True, seed=7)
    s1b = run(do_sample=True, seed=7)
    np.testing.assert_array_equal(s1, s1b)
    # near-greedy at tiny temperature
    cold = run(do_sample=True, temperature=1e-4, seed=3)
    np.testing.assert_array_equal(cold, greedy)
    # top_p/top_k paths execute
    run(do_sample=True, top_p=0.9, top_k=5, seed=1)


def test_yarn_scaling_changes_rope_only(tiny, rng):
    _, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng)
    e1 = Qwen2VLEngine(cfg, params, RetakeConfig())
    e2 = Qwen2VLEngine(cfg, params, RetakeConfig(scaling_factor=4))
    assert e2.cfg.yarn_factor == 4.0
    r1 = e1.generate(ids, patches, grid, max_new_tokens=3)
    r2 = e2.generate(ids, patches, grid, max_new_tokens=3)
    assert r1.tokens.shape == r2.tokens.shape


def test_prompt_guided_compression(tiny, rng):
    """prompt_guided_compression appends the question to every video chunk
    (reference forge_input_chunks, qwen2_vl.py:493-519)."""
    hf_model, cfg, params = tiny
    ids, patches, grid = make_video_request(cfg, rng, grid_t=8, prompt_len=4)
    rt = RetakeConfig.from_dict(
        {
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2,
                "frame_chunk_size": 4,
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "dynamic_compression_ratio": True,
                    "compression_method": "pivotkv",
                    "pos_embed_reforge": True,
                    "prompt_guided_compression": True,
                    "max_input_length": 24,
                },
            }
        }
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    r1 = engine.generate(ids, patches, grid, max_new_tokens=4)
    r2 = engine.generate(ids, patches, grid, max_new_tokens=4)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)
    # reference semantics: every video chunk is scored *with the prompt
    # appended* and keeps int(ratio * (chunk+prompt)) tokens — the prompt's
    # K/V are partially re-retained per chunk, plus the final text segment.
    s = r1.input_len
    ratio = 24 / s
    pre, video, post = 4, 32, 5
    keep_per_chunk = int(ratio * (4 + post))
    expected = pre + 8 * keep_per_chunk + post
    assert r1.cache_len == expected, (r1.cache_len, expected)


@pytest.mark.slow
def test_generate_batch_matches_sequential(tiny, rng):
    """Batched decode (generate_batch) must be token-exact vs per-request
    generate under greedy decoding — same caches, same decode math, just
    vmapped (engine.decode_batch)."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {
            "longvideo_kwargs": {
                "chunked_prefill_frames": 2,
                "frame_chunk_size": 2,
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "compression_ratio": 0.6,
                    "pos_embed_reforge": True,
                },
            }
        }
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    # different shapes per request: video sizes and prompt lengths differ
    reqs = []
    for grid_t, plen in ((2, 5), (4, 3), (2, 8)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(
            dict(input_ids=ids, pixel_values_videos=patches,
                 video_grid_thw=grid)
        )
    seq = [engine.generate(**r, max_new_tokens=6) for r in reqs]
    batch = engine.generate_batch(reqs, max_new_tokens=6)
    assert len(batch) == len(seq)
    for b, s in zip(batch, seq):
        np.testing.assert_array_equal(b.tokens, s.tokens)
        assert b.cache_len == s.cache_len


@pytest.mark.slow
def test_generate_batch_eos_first_token(tiny, rng):
    """A request whose first token is EOS must not join the decode batch —
    including the all-finished case where NO batched loop runs at all.
    Forced by redefining eos_token_id to whatever token the model actually
    emits first (random weights never emit the real EOS id)."""
    import dataclasses

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    ids, patches, grid = make_video_request(cfg, rng)
    first = int(engine.generate(ids, patches, grid, max_new_tokens=1).tokens[0])

    cfg_eos = dataclasses.replace(cfg, eos_token_id=first)
    eng_eos = Qwen2VLEngine(cfg_eos, params, rt)
    req = dict(input_ids=ids, pixel_values_videos=patches,
               video_grid_thw=grid)
    # all requests finish at the first token -> live=[] -> no decode loop
    batch = eng_eos.generate_batch([req, req], max_new_tokens=5)
    for b in batch:
        np.testing.assert_array_equal(b.tokens, [first])

    # mixed batch: one EOS-at-first request + one live request; the live
    # one must match its sequential tokens, the EOS one stays length 1
    ids2, patches2, grid2 = make_video_request(cfg, rng, grid_t=4)
    eng_mixed = Qwen2VLEngine(cfg, params, rt)  # real eos id: nothing stops
    seq2 = eng_mixed.generate(ids2, patches2, grid2, max_new_tokens=5)
    first2 = int(seq2.tokens[0])
    assert first2 != first, "distinct requests should differ here"
    cfg_eos1 = dataclasses.replace(cfg, eos_token_id=first)
    eng = Qwen2VLEngine(cfg_eos1, params, rt)
    seq2_eos = eng.generate(ids2, patches2, grid2, max_new_tokens=5)
    batch = eng.generate_batch(
        [req, dict(input_ids=ids2, pixel_values_videos=patches2,
                   video_grid_thw=grid2)],
        max_new_tokens=5,
    )
    np.testing.assert_array_equal(batch[0].tokens, [first])
    np.testing.assert_array_equal(batch[1].tokens, seq2_eos.tokens)
    assert engine.generate_batch([]) == []


def test_generate_batch_per_request_max_new_tokens(tiny, rng):
    """Per-request max_new_tokens is honored (trimmed harvest-side), not
    silently overridden by the batch-wide value: each result is token-exact
    vs sequential generate at ITS OWN limit."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    maxes = (2, 6, 4)
    reqs = []
    for grid_t, plen, m in zip((2, 4, 2), (5, 3, 8), maxes):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(
            dict(input_ids=ids, pixel_values_videos=patches,
                 video_grid_thw=grid, max_new_tokens=m)
        )
    seq = [engine.generate(**r) for r in reqs]
    batch = engine.generate_batch(reqs)  # no batch-wide value: per-request
    for b, s, m in zip(batch, seq, maxes):
        assert len(b.tokens) <= m
        np.testing.assert_array_equal(b.tokens, s.tokens)
    # batch-wide default still applies to requests without their own limit
    del reqs[1]["max_new_tokens"]
    seq1 = engine.generate(**reqs[1], max_new_tokens=3)
    batch = engine.generate_batch(reqs, max_new_tokens=3)
    np.testing.assert_array_equal(batch[1].tokens, seq1.tokens)
    # reqs[0] keeps its own limit (2) even though the batch-wide default is 3
    np.testing.assert_array_equal(batch[0].tokens, seq[0].tokens)


def test_generate_batch_mixed_text_only_and_video(tiny, rng):
    """A text-only request (no video) batches with video requests; batched
    greedy tokens match sequential for both."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    ids_v, patches, grid = make_video_request(cfg, rng)
    ids_t = rng.integers(10, 500, size=9).astype(np.int64)
    reqs = [
        dict(input_ids=ids_v, pixel_values_videos=patches,
             video_grid_thw=grid),
        dict(input_ids=ids_t),
    ]
    seq = [engine.generate(**r, max_new_tokens=5) for r in reqs]
    batch = engine.generate_batch(reqs, max_new_tokens=5)
    for b, s in zip(batch, seq):
        np.testing.assert_array_equal(b.tokens, s.tokens)


@pytest.mark.slow
def test_prefill_state_trimmed_and_mixed_bucket_decode(tiny, rng, monkeypatch):
    """A prefill-only state's cache is trimmed to its own decode bucket
    (PrefillState.attn_need) instead of holding the full prefill budget, and
    decode_batch over a mixed-bucket set still matches sequential generate
    (the short cache pads back up at batch assembly). Bucket granularity is
    shrunk so tiny CPU shapes produce distinct buckets."""
    from retake_tpu.runtime import engine as eng_mod

    monkeypatch.setattr(eng_mod, "BUDGET_BUCKET", 16)
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for grid_t, gh, gw, plen in ((2, 4, 4, 4), (16, 8, 8, 7)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, grid_h=gh, grid_w=gw, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    seq = [engine.generate(**r, max_new_tokens=5) for r in reqs]
    states = [engine.generate(**r, max_new_tokens=5, _prefill_only=True)
              for r in reqs]
    assert states[0].attn_need < states[1].attn_need
    for st in states:
        assert st.cache.budget == st.attn_need, (st.cache.budget, st.attn_need)
    # default (einsum) decode impl: this test asserts EXACT token equality
    # vs sequential generate, which only the einsum's fp reduction order
    # guarantees (generate_batch deliberately doesn't forward attn_impl
    # either — engine.py)
    results = eng_mod.decode_batch(params, cfg, rt, states, 5)
    for r, s in zip(results, seq):
        np.testing.assert_array_equal(r.tokens, s.tokens)
        assert r.cache_len == s.cache_len


def test_video_token_feature_mismatch_raises(tiny, rng):
    """Reference parity: mismatched video token count vs ViT features is an
    explicit error (retake/qwen2_vl.py:649-653), not a silent bad scatter."""
    _, cfg, params = tiny
    # ids carry a 2-frame video span but the pixel grid says 4 frames
    ids, _, _ = make_video_request(cfg, rng, grid_t=2)
    _, patches4, grid4 = make_video_request(cfg, rng, grid_t=4)
    engine = Qwen2VLEngine(cfg, params, RetakeConfig())
    with pytest.raises(ValueError, match="do not match"):
        engine.generate(ids, patches4, grid4, max_new_tokens=2)


def test_generate_batch_sampling_matches_sequential(tiny, rng):
    """Batched SAMPLED decode is token-exact vs sequential generate: draw
    keys derive from (seed, request-own step) — the same schedule the
    sequential loop uses — not from the batch slot."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"do_sample": True, "temperature": 1.2, "top_k": 20, "seed": 5,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for grid_t, plen in ((2, 5), (4, 3)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    seq = [engine.generate(**r, max_new_tokens=6) for r in reqs]
    batch = engine.generate_batch(reqs, max_new_tokens=6)
    for b, s in zip(batch, seq):
        np.testing.assert_array_equal(b.tokens, s.tokens)


@pytest.mark.slow
def test_decode_batch_early_stop_matches_scan(tiny, rng):
    """while_loop early-exit batched decode (decode_batch(early_stop=True))
    is token-identical to the static scan — both when no request hits EOS
    (full trip count) and when EVERY request hits 'EOS' early (the exit
    actually fires: rebind eos_token_id to a token the model emits, so the
    loop stops before max_new and the post-EOS buffer rows keep their EOS
    prefill)."""
    import dataclasses

    from retake_tpu.runtime import engine as eng_mod

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    reqs = []
    for grid_t, plen in ((2, 5), (4, 3)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    max_new = 8

    def run(cfg_, early):
        eng = Qwen2VLEngine(cfg_, params, rt)
        states = [eng.generate(**r, max_new_tokens=max_new,
                               _prefill_only=True) for r in reqs]
        return eng_mod.decode_batch(params, cfg_, rt, states, max_new,
                                    early_stop=early)

    base = run(cfg, False)
    fast = run(cfg, True)
    for b, f in zip(base, fast):
        np.testing.assert_array_equal(b.tokens, f.tokens)
        assert len(b.tokens) == max_new  # no natural EOS on random weights

    # force an early exit: declare a token the model actually produces to
    # be EOS (2nd decoded token of request 0)
    eos2 = int(base[0].tokens[2])
    cfg2 = dataclasses.replace(cfg, eos_token_id=eos2)
    base2 = run(cfg2, False)
    fast2 = run(cfg2, True)
    hit = False
    for b, f in zip(base2, fast2):
        np.testing.assert_array_equal(b.tokens, f.tokens)
        hit = hit or len(b.tokens) < max_new
    assert hit, "rebound EOS never fired; early-exit path not exercised"


def test_generate_decode_early_stop_matches(tiny, rng):
    """Sequential generate with config decode_early_stop: true is
    token-identical to the default static scan, both without a natural
    EOS (full trip) and with a rebound EOS that fires mid-decode."""
    import dataclasses

    _, cfg, params = tiny
    base_rt = {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                                    "frame_chunk_size": 2}}
    ids, patches, grid = make_video_request(cfg, rng, grid_t=2, prompt_len=5)
    req = dict(input_ids=ids, pixel_values_videos=patches,
               video_grid_thw=grid)
    max_new = 8

    def run(cfg_, early):
        rt = RetakeConfig.from_dict(
            {**base_rt, "decode_early_stop": early})
        eng = Qwen2VLEngine(cfg_, params, rt)
        return eng.generate(**req, max_new_tokens=max_new)

    base = run(cfg, False)
    fast = run(cfg, True)
    np.testing.assert_array_equal(base.tokens, fast.tokens)
    assert len(base.tokens) == max_new

    eos2 = int(base.tokens[2])
    cfg2 = dataclasses.replace(cfg, eos_token_id=eos2)
    base2 = run(cfg2, False)
    fast2 = run(cfg2, True)
    np.testing.assert_array_equal(base2.tokens, fast2.tokens)
    assert len(base2.tokens) < max_new


@pytest.mark.parametrize("vc_kwargs", [
    # ratio-1.0 mask-only DPSelect + PivotKV reforge (the shipped configs)
    {"compression_ratio": 1.0, "return_keyframe_mask": True},
    # actual frame dropping (tgt != t: the ids/pos reforge path)
    {"compression_ratio": 0.5, "return_keyframe_mask": True},
    # MA-LLM merge baseline
    {"compression_ratio": 0.5, "compression_method": "MA-LLM"},
])
def test_video_features_reuse_matches_inline(tiny, rng, vc_kwargs):
    """encode_video -> generate(video_features=...) must be token-exact vs
    the inline vision path, reusable across DIFFERENT questions on the same
    video (the vision stage is question-independent; the reference
    recomputes it per question, qwen2_vl.py:597-627)."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {
            "chunked_prefill_frames": 2, "frame_chunk_size": 2,
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {"compression_ratio": 0.6,
                                           "pos_embed_reforge": True},
            "visual_compression": True,
            "visual_compression_kwargs": vc_kwargs,
        }}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    ids1, patches, grid = make_video_request(cfg, rng, grid_t=4, prompt_len=5)
    # a second question about the SAME video: same video span, new prompt
    n_vid = int(np.sum(ids1 == cfg.video_token_id))
    vstart = int(np.where(ids1 == cfg.video_token_id)[0][0])
    ids2 = np.concatenate([
        ids1[: vstart + n_vid + 1],
        rng.integers(10, 500, size=8).astype(np.int64),
    ])
    feats = engine.encode_video(patches, grid)
    for ids in (ids1, ids2):
        inline = engine.generate(ids, patches, grid, max_new_tokens=6)
        reused = engine.generate(ids, video_features=feats, max_new_tokens=6)
        np.testing.assert_array_equal(reused.tokens, inline.tokens)
        assert reused.cache_len == inline.cache_len


@pytest.mark.slow
def test_spec_decode_matches_vanilla(tiny, rng):
    """Prompt-lookup speculative decoding (config spec_decode): greedy
    tokens identical to the s=1 decode loop — including multi-token
    acceptance runs (random tiny-model greedy enters cycles, which the
    n-gram matcher catches), cache-length rollback of rejected proposals,
    and EOS inside an accepted run."""
    import dataclasses

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2,
                              "kvcache_compression": True,
                              "kvcache_compression_kwargs": {
                                  "compression_ratio": 0.6,
                                  "pos_embed_reforge": True}}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    engine_s = Qwen2VLEngine(
        cfg, params, dataclasses.replace(rt, spec_decode=True)
    )
    accepted_any = False
    for seed in (4, 5):
        r = np.random.default_rng(seed)
        ids, patches, grid = make_video_request(cfg, r, grid_t=4,
                                                prompt_len=5)
        a = engine.generate(ids, patches, grid, max_new_tokens=33)
        b = engine_s.generate(ids, patches, grid, max_new_tokens=33)
        np.testing.assert_array_equal(b.tokens, a.tokens)
        accepted_any |= (b.stages or {}).get(
            "spec_tokens_per_step", 1.0) > 1.0
    # at least one of the seeds must exercise real multi-token acceptance
    # (deterministic: fixed params seed + fixed request seeds)
    assert accepted_any

    # EOS early stop: rebind eos to a token the stream emits
    eos2 = int(a.tokens[5])
    cfg2 = dataclasses.replace(cfg, eos_token_id=eos2)
    e2 = Qwen2VLEngine(cfg2, params, rt)
    e2s = Qwen2VLEngine(cfg2, params,
                        dataclasses.replace(rt, spec_decode=True))
    x = e2.generate(ids, patches, grid, max_new_tokens=33)
    y = e2s.generate(ids, patches, grid, max_new_tokens=33)
    np.testing.assert_array_equal(y.tokens, x.tokens)
    assert len(x.tokens) < 33
