"""Data-layer tests: processor parity vs HF, scorers, sampling, config."""

import numpy as np
import pytest

from retake_tpu.data import processor as proc_lib
from retake_tpu.data import video as video_lib
from retake_tpu.data.scorers import (
    eval_lvbench_results,
    eval_videomme_results,
    trim_answer,
)
from retake_tpu.utils import positions as pos_lib
from retake_tpu.utils.config import RetakeConfig


@pytest.mark.slow
def test_smart_resize_matches_hf():
    transformers = pytest.importorskip("transformers")
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    for h, w in [(252, 448), (448, 252), (720, 1280), (1080, 1920), (56, 56)]:
        assert proc_lib.smart_resize(h, w) == hf_smart_resize(h, w)


def test_preprocess_video_matches_hf(rng):
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen2VLImageProcessor

    frames = [
        rng.integers(0, 255, size=(112, 196, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    hf_proc = Qwen2VLImageProcessor()
    hf_out = hf_proc(images=None, videos=[frames], return_tensors="np")
    pixel, grid = proc_lib.preprocess_video(frames)
    np.testing.assert_array_equal(
        np.asarray([grid]), hf_out["video_grid_thw"]
    )
    np.testing.assert_allclose(
        pixel, hf_out["pixel_values_videos"], atol=2e-3
    )


def test_frame_indices_match_reference_formula():
    # demo.py:16-24: floor, even-count, linspace
    idx = video_lib.get_frame_indices(
        total_frames=250, max_num_frames=2048, sample_fps=4, extraction_fps=25
    )
    assert len(idx) == 40  # 250/25*4 = 40
    assert idx[0] == 0 and idx[-1] == 249
    idx = video_lib.get_frame_indices(1000, 64, 4, 25)
    assert len(idx) == 64
    idx = video_lib.get_frame_indices(37, 2048, 4, 25)  # 5.92 -> 5 -> 4 (even)
    assert len(idx) == 4


def test_trim_answer():
    assert trim_answer("The best answer is B.") == "B"
    assert trim_answer("  C") == "C"
    assert trim_answer("I think the answer is (D)") == "D"
    assert trim_answer("no letter here at all " * 5) == ""
    assert trim_answer("") == ""


def test_videomme_scorer_layout():
    results = {i: "A" for i in range(6)}
    metas = {
        i: dict(
            answer="A" if i % 2 == 0 else "B",
            task_type="t1" if i < 3 else "t2",
            domain="d",
            duration=["short", "medium", "long"][i % 3],
        )
        for i in range(6)
    }
    eval_df, infer_df = eval_videomme_results(results, metas)
    assert list(eval_df.index) == ["short", "medium", "long", "overall"]
    assert "overall" in eval_df.columns
    assert infer_df["correct"].sum() == 3


def test_mlvu_scorer_dev_and_test_split():
    """Dev split: M-AVG over the seven dev MC types. Test split: SportsQA
    and Tutorial QA join M-AVG (the reference raises NotImplementedError
    for this split — dataset_utils.py:339-342; we aggregate it in the
    reference's intended column order, :357-366). Unknown types raise
    instead of silently dropping out of the aggregate."""
    from retake_tpu.data.scorers import (
        MLVU_GEN_TYPES,
        MLVU_MC_TYPES,
        MLVU_TEST_MC_TYPES,
        eval_mlvu_results,
    )

    # dev: one right + one wrong sample per MC type, gen types score 0
    # without the GPT judge
    metas, results = {}, {}
    i = 0
    for qt in MLVU_MC_TYPES + MLVU_GEN_TYPES:
        for correct in (True, False):
            metas[i] = dict(answer="A", question_type=qt)
            results[i] = "A" if correct else "B"
            i += 1
    eval_df, infer_df = eval_mlvu_results(results, metas)
    assert eval_df["M-AVG"].iloc[0] == 50.0
    assert list(eval_df.columns) == (
        MLVU_MC_TYPES + ["M-AVG"] + MLVU_GEN_TYPES + ["G-AVG"]
    )

    # test: all 11 types; SportsQA all-correct pulls M-AVG above 50
    for qt in ("SportsQA", "Tutorial QA"):
        metas[i] = dict(answer="A", question_type=qt)
        results[i] = "A"
        i += 1
    eval_df, _ = eval_mlvu_results(results, metas)
    cols = list(eval_df.columns)
    assert cols == MLVU_TEST_MC_TYPES + [
        "M-AVG", "Sub-Scene Captioning", "Video Summary", "G-AVG",
    ]
    assert eval_df["SportsQA"].iloc[0] == 100.0
    assert eval_df["M-AVG"].iloc[0] == pytest.approx((7 * 50 + 2 * 100) / 9)

    # unknown type: loud, never a silently-wrong aggregate
    metas[i] = dict(answer="A", question_type="Mystery QA")
    results[i] = "A"
    with pytest.raises(ValueError, match="Mystery QA"):
        eval_mlvu_results(results, metas)


def test_lvbench_scorer_multi_type():
    results = {0: "A", 1: "B"}
    metas = {
        0: dict(answer="A", question_type=["reasoning", "summarization"]),
        1: dict(answer="A", question_type=["reasoning"]),
    }
    eval_df, infer_df = eval_lvbench_results(results, metas)
    assert eval_df["reasoning"].iloc[0] == 50.0
    assert eval_df["summarization"].iloc[0] == 100.0
    assert eval_df["overall"].iloc[0] == 50.0


def test_config_parses_reference_yaml(tmp_path):
    # byte-for-byte a reference config (schema parity requirement)
    y = """
method: retake
scaling_factor: 4
attn_implementation: "flash_attention_2"
longvideo_kwargs: {
  'frame_chunk_size': 128,
  'chunked_prefill_frames': 32,
  'visual_compression': True,
  'visual_compression_kwargs': {
    'compression_ratio': 1.0,
    'compression_method': 'Keyframe',
    'patch_sync': False,
    'return_keyframe_mask': True
  },
  'kvcache_compression': True,
  'kvcache_compression_kwargs': {
    'dynamic_compression_ratio': True,
    'compression_method': 'pivotkv',
    'pos_embed_reforge': True,
    'max_input_length': 32000
  },
}
sample_fps: 4
max_num_frames: 2048
longsize_resolution: 448
do_sample: false
"""
    f = tmp_path / "c.yaml"
    f.write_text(y)
    rt = RetakeConfig.from_yaml(str(f))
    assert rt.scaling_factor == 4
    assert rt.frame_chunk_size == 128
    assert rt.chunked_prefill_frames == 32
    assert rt.visual_compression and rt.visual.compression_method == "Keyframe"
    assert rt.kvcache_compression and rt.kv.pos_embed_reforge
    assert rt.kv.max_input_length == 32000
    assert rt.attn_implementation == "pallas"  # GPU impls map to the Pallas kernel
    assert rt.compression_ratio_for(64000) == 0.5
    assert rt.compression_ratio_for(1000) == 1.0


def test_get_rope_index_matches_hf(rng):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
            in_channels=3, patch_size=2, spatial_merge_size=2,
            temporal_patch_size=2,
        ),
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
    )
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg)
    t, h, w = 4, 4, 6
    n_tok = t * h * w // 4
    ids = np.array(
        [10, 11, 3] + [6] * n_tok + [4, 12, 13, 14], dtype=np.int64
    )
    grid = np.array([[t, h, w]])
    hf_pos, hf_delta = model.model.get_rope_index(
        torch.from_numpy(ids)[None], None, torch.from_numpy(grid), None
    )
    pos, delta = pos_lib.get_rope_index(
        ids,
        spatial_merge_size=2,
        image_token_id=5,
        video_token_id=6,
        vision_start_token_id=3,
        video_grid_thw=grid,
    )
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0, 0])


def test_segment_modalities():
    ids = np.array([1, 2, 6, 6, 6, 3, 4, 6, 6, 5])
    segs = pos_lib.segment_modalities(ids, 6)
    assert segs == [
        (0, 2, "text"), (2, 5, "video"), (5, 7, "text"),
        (7, 9, "video"), (9, 10, "text"),
    ]


def test_get_rope_index_multi_video_and_image(rng):
    """Mixed media sequences: positions must match HF exactly."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
            in_channels=3, patch_size=2, spatial_merge_size=2,
            temporal_patch_size=2,
        ),
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
    )
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg)
    img_grid = np.array([[1, 4, 4]])       # 4 image tokens
    vid_grid = np.array([[2, 4, 6], [4, 2, 2]])  # 12 and 4 video tokens
    ids = np.array(
        [10, 3] + [5] * 4 + [4, 11, 3] + [6] * 12 + [4, 12, 3] + [6] * 4
        + [4, 13, 14],
        dtype=np.int64,
    )
    hf_pos, hf_delta = model.model.get_rope_index(
        torch.from_numpy(ids)[None],
        torch.from_numpy(img_grid),
        torch.from_numpy(vid_grid),
        None,
    )
    pos, delta = pos_lib.get_rope_index(
        ids,
        spatial_merge_size=2,
        image_token_id=5,
        video_token_id=6,
        vision_start_token_id=3,
        image_grid_thw=img_grid,
        video_grid_thw=vid_grid,
    )
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0, 0])


def test_reforge_after_visual_compression_semantics():
    """Reference reforge (qwen2_vl.py:419-438): keep the FIRST tgt video
    tokens' positions, shift everything after the span down by the dropped
    frame count on all three axes."""
    # text(2) + video 4 tokens (2 frames x 2 tok) + text(2)
    ids = np.array([7, 8, 6, 6, 6, 6, 9, 10], dtype=np.int64)
    pos = np.stack([
        np.array([0, 1, 2, 2, 3, 3, 4, 5]),   # temporal
        np.array([0, 1, 2, 2, 2, 2, 4, 5]),   # h
        np.array([0, 1, 2, 3, 2, 3, 4, 5]),   # w
    ]).astype(np.int32)
    new_ids, new_pos = pos_lib.reforge_after_visual_compression(
        ids, pos, (2, 6), tgt_seq_len=2, num_frame_diff=1
    )
    np.testing.assert_array_equal(new_ids, [7, 8, 6, 6, 9, 10])
    np.testing.assert_array_equal(new_pos[0], [0, 1, 2, 2, 3, 4])
    np.testing.assert_array_equal(new_pos[1], [0, 1, 2, 2, 3, 4])
    np.testing.assert_array_equal(new_pos[2], [0, 1, 2, 3, 3, 4])


def test_preprocess_image_matches_hf(rng):
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen2VLImageProcessor

    img = rng.integers(0, 255, size=(130, 210, 3), dtype=np.uint8)
    hf_proc = Qwen2VLImageProcessor()
    hf_out = hf_proc(images=[img], return_tensors="np")
    pixel, grid = proc_lib.preprocess_image(img)
    np.testing.assert_array_equal(np.asarray([grid]), hf_out["image_grid_thw"])
    np.testing.assert_allclose(pixel, hf_out["pixel_values"], atol=2e-3)


def test_llava_anyres_tiles_match_hf(rng):
    """image_to_anyres_tiles vs the HF LlavaOnevisionImageProcessor
    (reference relies on AutoProcessor for anyres tiling)."""
    transformers = pytest.importorskip("transformers")
    from transformers import LlavaOnevisionImageProcessor

    from retake_tpu.models.llava_onevision import anyres

    pins = [[384, 384], [384, 768], [768, 384], [768, 768]]
    # SigLIP checkpoints ship 0.5/0.5 normalization in preprocessor_config
    # (the HF class default is CLIP mean/std); ours normalizes on device
    hf_proc = LlavaOnevisionImageProcessor(
        size={"height": 384, "width": 384}, image_grid_pinpoints=pins,
        image_mean=[0.5] * 3, image_std=[0.5] * 3,
    )
    for h, w in [(300, 500), (384, 384), (900, 400)]:
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        hf_out = hf_proc(images=[img], return_tensors="np")
        tiles, hw = anyres.image_to_anyres_tiles(
            img, tile_size=384, pinpoints=[tuple(p) for p in pins]
        )
        assert hw == (h, w)
        # HF returns normalized CHW float; ours returns raw uint8 tiles that
        # the device normalizes with the same (0.5, 0.5) mean/std
        ours = (tiles.astype(np.float32) / 255.0 - 0.5) / 0.5
        ours = ours.transpose(0, 3, 1, 2)
        hf_px = hf_out["pixel_values"][0]  # [n_patch(+pad), 3, 384, 384]
        np.testing.assert_allclose(ours, hf_px[: len(ours)], atol=2e-3)
        # any HF padding tail must be zeros (we pad identically)
        assert np.abs(hf_px[len(ours):]).max(initial=0.0) <= 1.0 + 1e-6


class _StubTok:
    def encode(self, s):
        return [20 + (b % 400) for b in s.encode()][:32]

    def decode(self, ids, **kw):
        return "x"


@pytest.mark.slow
def test_qwen_processor_images_end_to_end(rng):
    """Processor image path feeds the engine: placeholder counts match the
    ViT token production for mixed image + video."""
    import jax.numpy as jnp

    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg = TINY_TEST_CONFIG
    v = cfg.vision
    proc = proc_lib.Qwen2VLProcessor(
        _StubTok(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        image_token_id=cfg.image_token_id,
        patch_size=v.patch_size,
        merge_size=v.spatial_merge_size,
        temporal_patch_size=v.temporal_patch_size,
        min_pixels=v.patch_size * v.spatial_merge_size * 56,
        max_pixels=56 * 56 * 99,
    )
    frames = [
        rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    images = [
        rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8),
        rng.integers(0, 255, size=(84, 56, 3), dtype=np.uint8),
    ]
    out = proc("what?", frames, images=images)
    assert out["pixel_values"] is not None
    assert out["image_grid_thw"].shape == (2, 3)
    n_img_tok = int((out["input_ids"] == cfg.image_token_id).sum())
    assert n_img_tok == out["image_grid_thw"].prod(axis=1).sum() // 4

    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    engine = Qwen2VLEngine(cfg, params, RetakeConfig())
    r = engine.generate(
        out["input_ids"], out["pixel_values_videos"], out["video_grid_thw"],
        max_new_tokens=3,
        pixel_values=out["pixel_values"], image_grid_thw=out["image_grid_thw"],
    )
    assert len(r.tokens) >= 1


@pytest.mark.slow
def test_llava_processor_images_end_to_end(rng):
    import jax.numpy as jnp

    from retake_tpu.models.llava_onevision import params as lparams
    from retake_tpu.models.llava_onevision.config import (
        LlavaOnevisionConfig,
        SiglipVisionConfig,
    )
    from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
    from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine
    from retake_tpu.utils.config import RetakeConfig

    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, mrope_section=None,
        ),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5, video_token_id=6,
        image_grid_pinpoints=((16, 16), (16, 32), (32, 16), (32, 32)),
    )
    proc = proc_lib.LlavaOnevisionVideoProcessor(
        _StubTok(),
        video_token_id=cfg.video_token_id,
        image_token_id=cfg.image_token_id,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        tokens_per_frame=cfg.tokens_per_frame,
        image_grid_pinpoints=cfg.image_grid_pinpoints,
    )
    frames = [
        rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    images = [rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)]
    out = proc("what?", frames, images=images)
    params = lparams.init_params(cfg, seed=0, dtype=jnp.float32)
    engine = LlavaOnevisionEngine(cfg, params, RetakeConfig())
    r = engine.generate(
        out["input_ids"], out["pixel_values_videos"],
        max_new_tokens=3,
        pixel_values=out["pixel_values"], image_sizes=out["image_sizes"],
    )
    assert len(r.tokens) >= 1


def test_config_rejects_invalid_quantization_values():
    import pytest

    from retake_tpu.utils.config import RetakeConfig

    with pytest.raises(ValueError, match="kv_cache_dtype"):
        RetakeConfig.from_dict({"kv_cache_dtype": "INT8"})
    with pytest.raises(ValueError, match="quantization"):
        RetakeConfig.from_dict({"quantization": "fp8"})
    assert RetakeConfig.from_dict({"kv_cache_dtype": "int8"}).kv_cache_dtype == "int8"


def test_processor_text_only_modes_match_full():
    """Grid-only / num_frames-only tokenization (VideoFeatures reuse)
    emits exactly the ids the full pixel-processing call emits."""
    import numpy as np

    from retake_tpu.data.processor import (
        LlavaOnevisionVideoProcessor, Qwen2VLProcessor,
    )

    class Tok:
        def encode(self, s):
            return [20 + (b % 400) for b in s.encode()][:64]

        def decode(self, ids, **kw):
            return ""

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
              for _ in range(4)]

    qp = Qwen2VLProcessor(Tok(), patch_size=2, merge_size=2,
                          temporal_patch_size=2, min_pixels=1)
    full = qp("What? A. x", frames)
    lite = qp("What? A. x", video_grid=full["video_grid_thw"][0])
    np.testing.assert_array_equal(lite["input_ids"], full["input_ids"])
    assert lite["pixel_values_videos"] is None
    np.testing.assert_array_equal(
        lite["video_grid_thw"], full["video_grid_thw"]
    )

    lp = LlavaOnevisionVideoProcessor(Tok(), video_token_id=6,
                                      image_size=16, tokens_per_frame=4)
    lfull = lp("What? A. x", frames)
    llite = lp("What? A. x", num_frames=len(frames))
    np.testing.assert_array_equal(llite["input_ids"], lfull["input_ids"])
    assert llite["pixel_values_videos"] is None
