"""Continuous batching (runtime/serve.py): greedy token parity vs
sequential generate, mid-decode admission, and gap-region compaction.

The reference has no serving layer (its eval prefills everything then
decodes the whole batch, retake/infer_eval.py:184-201); the invariant here
is that continuous admission NEVER changes a request's greedy tokens — slot
isolation (per-slot dec_start masks + analytic positions) makes each lane
equivalent to the plain batched decode, which is pinned token-exact to
sequential generate by tests/test_engine.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.serve import ContinuousServer
from retake_tpu.utils.config import RetakeConfig

from tests.test_engine import VIS, make_video_request


@pytest.fixture(scope="module")
def tiny():
    """Random-weight tiny model (no HF twin needed: serve parity is pinned
    against our own sequential generate, itself HF-pinned elsewhere)."""
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
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    return None, cfg, params


def _build(tiny, rng, n_reqs=4):
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2,
                              "kvcache_compression": True,
                              "kvcache_compression_kwargs": {
                                  "compression_ratio": 0.6,
                                  "pos_embed_reforge": True,
                              }}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for i in range(n_reqs):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=2 + 2 * (i % 2), prompt_len=4 + i
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    return engine, reqs


def test_continuous_serve_matches_sequential(tiny, rng):
    """All-at-once arrivals, fewer slots than requests: every request's
    greedy tokens match its solo generate; tiny segments + a tiny gap
    capacity force several compactions mid-flight."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    max_new = 9
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6,  # forces a compaction every other segment
    )
    results = server.run(reqs)
    assert [r.request_id for r in results] == list(range(4))
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)
        assert res.ttft_s >= 0 and res.latency_s >= res.ttft_s


def test_continuous_serve_staggered_admission(tiny, rng):
    """A request arriving while others are mid-decode is admitted into a
    freed slot and still decodes token-exactly (dec_start masks the slot's
    previous tenant)."""
    engine, reqs = _build(tiny, rng, n_reqs=3)
    max_new = 7
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=max_new,
        gap_capacity=8,
    )
    # third request arrives 'later' (t=0.01s): with 2 slots it is admitted
    # once a slot frees mid-run
    results = server.run(reqs, arrival_times=[0.0, 0.0, 0.01])
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_rejects_sampling(tiny, rng):
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"do_sample": True,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    with pytest.raises(NotImplementedError, match="greedy"):
        ContinuousServer(engine)
