"""Composed-path oracle: the full chunked-prefill x PivotKV x reforge x decode
loop vs an independent numpy transcription of the reference
(tests/oracle_retake.py; reference call stack /root/reference/retake/
qwen2_vl.py:670-733). Token-exact, including prompt-guided mode — this is
where off-by-ones in keep_len / position rescale / temporal rebase change
answers (SURVEY.md §7 hard-part #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oracle_retake import RetakeOracle
from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import prefill_and_decode
from retake_tpu.utils import positions as pos_lib
from retake_tpu.utils.config import RetakeConfig
from retake_tpu.utils.profiling import StageTimer


@pytest.fixture(scope="module")
def tiny_text():
    cfg = Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        mrope_section=(4, 2, 2), tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=1,
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
        vision=Qwen2VisionConfig(
            depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
            in_channels=3, patch_size=2, spatial_merge_size=2,
            temporal_patch_size=2,
        ),
    )
    params = params_lib.init_params(cfg, seed=3, dtype=jnp.float32)
    params_np = jax.tree.map(np.asarray, params)
    return cfg, params, params_np


def _request(cfg, rng, n_video=64, grid=(8, 8, 4), prompt_len=6):
    ids = np.concatenate([
        rng.integers(10, 500, size=4),
        [cfg.vision_start_token_id], [cfg.video_token_id] * n_video,
        [cfg.vision_end_token_id],
        rng.integers(10, 500, size=prompt_len),
    ]).astype(np.int64)
    pos, _ = pos_lib.get_rope_index(
        ids,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        video_grid_thw=np.asarray([grid]),
    )
    keypatch = np.zeros(len(ids), bool)
    vi = np.flatnonzero(ids == cfg.video_token_id)
    keypatch[vi] = rng.random(n_video) < 0.15
    video_embeds = (rng.normal(size=(n_video, cfg.hidden_size)) * 0.3).astype(
        np.float32
    )
    return ids, pos, keypatch, video_embeds


@pytest.mark.parametrize(
    "ratio,reforge,prompt_guided,attn_impl,mrope",
    [
        # the two heaviest arms are slow-marked; every dimension (xla /
        # flash / pallas impls, reforge on/off, prompt-guided on/off, both
        # RoPE layouts) keeps one fast representative
        pytest.param(0.5, True, False, "xla", True,
                     marks=pytest.mark.slow),
        (0.5, True, True, "xla", True),
        (0.5, False, False, "xla", True),
        (0.4, True, True, "flash", True),
        pytest.param(0.5, True, False, "pallas", True,
                     marks=pytest.mark.slow),  # Pallas scoring kernel path
        (0.5, True, True, "pallas", False),  # 1-D RoPE (LLaVA-style decoder)
    ],
)
def test_composed_path_token_exact(
    tiny_text, rng, ratio, reforge, prompt_guided, attn_impl, mrope
):
    cfg, params, params_np = tiny_text
    if not mrope:
        import dataclasses

        cfg = dataclasses.replace(cfg, mrope_section=None)
    ids, pos, keypatch, video_embeds = _request(cfg, rng)
    if not mrope:  # 1-D positions: plain arange broadcast over the 3 rows
        pos = np.broadcast_to(
            np.arange(len(ids), dtype=np.int32), (3, len(ids))
        ).copy()
    chunk_tokens = 16
    max_new = 6
    decode_pos_base = int(pos.max()) + 1

    rt = RetakeConfig.from_dict({
        "attn_implementation": attn_impl,
        "longvideo_kwargs": {
            "chunked_prefill_frames": 1,  # unused: chunk_tokens passed direct
            "kvcache_compression": True,
            "kvcache_compression_kwargs": {
                "compression_method": "pivotkv",
                "compression_ratio": ratio,
                "pos_embed_reforge": reforge,
                "prompt_guided_compression": prompt_guided,
            },
        },
    })
    got = prefill_and_decode(
        params, cfg, rt,
        ids=ids, pos=pos, keypatch_tokens=keypatch,
        video_embeds=jnp.asarray(video_embeds),
        video_token_id=cfg.video_token_id,
        chunk_tokens=chunk_tokens, decode_pos_base=decode_pos_base,
        max_new_tokens=max_new, attn_impl=rt.attn_implementation,
        timer=StageTimer(), t_start=0.0,
    )

    oracle = RetakeOracle(
        params_np, cfg, ratio=ratio, reforge=reforge,
        prompt_guided=prompt_guided,
    )
    want_tokens, want_cache = oracle.generate(
        ids, pos, keypatch, video_embeds, cfg.video_token_id,
        chunk_tokens, decode_pos_base, max_new,
    )

    np.testing.assert_array_equal(got.tokens, want_tokens)
    # oracle cache grew by max_new - 1 decode tokens beyond the prefill state
    assert got.cache_len == want_cache - (len(want_tokens) - 1)
