"""Eval harness end-to-end on a synthetic benchmark: sharding, journaling,
resume, merge, scoring artifacts (reference-compatible outputs)."""

import json
import os

import numpy as np
import pytest

from PIL import Image

import jax.numpy as jnp

from retake_tpu.data.datasets import BaseDataset
from retake_tpu.data.processor import Qwen2VLProcessor
from retake_tpu.eval.infer_eval import merge_and_score, run_eval
from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import TINY_TEST_CONFIG
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.utils.config import RetakeConfig


class StubTokenizer:
    def encode(self, s):
        return [20 + (b % 400) for b in s.encode()][:64]

    def decode(self, ids, **kw):
        # deterministic pseudo-answer letter from the ids
        return "ABCD"[int(sum(ids)) % 4]


@pytest.fixture(scope="module")
def fake_benchmark(tmp_path_factory):
    root = tmp_path_factory.mktemp("videomme")
    rng = np.random.default_rng(0)
    annos = []
    for v in range(4):
        vdir = root / f"vid{v}"
        os.makedirs(vdir)
        base = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
        for i in range(12):
            Image.fromarray(np.roll(base, i * 3, axis=1)).save(
                vdir / f"{i:06d}.jpg"
            )
        annos.append(
            {
                "messages": [
                    {"role": "user", "content": f"<video>Question {v}? A. x B. y"},
                    {"role": "assistant", "content": "AB"[v % 2]},
                ],
                "videos": [str(vdir)],
                "meta": json.dumps(
                    {
                        "task_type": "t1" if v < 2 else "t2",
                        "domain": "d",
                        "duration": ["short", "medium", "long", "short"][v],
                        "question": f"Question {v}?",
                    }
                ),
            }
        )
    anno_file = root / "anno.json"
    anno_file.write_text(json.dumps(annos))
    return str(anno_file), str(root)


@pytest.mark.slow
def test_eval_harness_end_to_end(fake_benchmark, tmp_path):
    anno_file, _ = fake_benchmark
    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    rt = RetakeConfig.from_dict(
        {
            "dataset_name": "videomme",
            "max_new_tokens": 4,
            "output_dir": str(tmp_path / "results"),
            "longvideo_kwargs": {"chunked_prefill_frames": 4,
                                 "frame_chunk_size": 4},
        }
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    processor = Qwen2VLProcessor(
        StubTokenizer(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        min_pixels=1,
    )
    dataset = BaseDataset(
        anno_file,
        processor_kwargs=dict(
            video_fps=4, video_maxlen=8, image_resolution=84,
            # 12-frame clips: extraction fps 2 -> 8 sampled frames (the
            # reference formula floors to even counts)
            video_frame_extraction_fps=2,
        ),
    )

    # two "ranks" on one process: round-robin sharding
    done0 = run_eval(engine, processor, dataset, rt, rank=0, world=2)
    done1 = run_eval(engine, processor, dataset, rt, rank=1, world=2)
    assert sorted(done0) == [0, 2] and sorted(done1) == [1, 3]

    # resume: journals exist -> nothing re-runs (engine not even needed)
    done0b = run_eval(None, processor, dataset, rt, rank=0, world=2)
    assert done0b == done0

    eval_df, infer_df = merge_and_score(rt, world=2)
    out = rt.output_dir
    assert os.path.exists(os.path.join(out, "anno_id2result.json"))
    assert os.path.exists(os.path.join(out, "infer_results.csv"))
    assert os.path.exists(os.path.join(out, "eval_results.csv"))
    assert len(infer_df) == 4
    assert list(eval_df.index) == ["short", "medium", "long", "overall"]


def test_prefetch_iter_order_and_overlap():
    """Background prefetch yields in order and overlaps producer latency
    with consumer work (reference DataLoader(num_workers), infer_eval.py:184)."""
    import time

    from retake_tpu.eval.infer_eval import prefetch_iter

    def load(idx):
        time.sleep(0.03)
        return idx * 10

    idxs = list(range(12))
    # serial
    t0 = time.perf_counter()
    serial = []
    for idx, val in prefetch_iter(idxs, load, 0):
        time.sleep(0.03)  # consumer work (the TPU generate)
        serial.append((idx, val))
    t_serial = time.perf_counter() - t0
    # prefetched
    t0 = time.perf_counter()
    fetched = []
    for idx, val in prefetch_iter(idxs, load, 2):
        time.sleep(0.03)
        fetched.append((idx, val))
    t_prefetch = time.perf_counter() - t0
    assert fetched == serial == [(i, i * 10) for i in idxs]
    assert t_prefetch < t_serial * 0.85, (t_prefetch, t_serial)


@pytest.mark.slow
def test_eval_harness_batched_matches_serial(fake_benchmark, tmp_path):
    """eval_batch_size > 1: same answers as the per-sample loop (greedy
    batched decode is token-exact), same journal/merge artifacts."""
    anno_file, _ = fake_benchmark
    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)

    def build_rt(out, bs):
        return RetakeConfig.from_dict(
            {
                "dataset_name": "videomme",
                "max_new_tokens": 4,
                "eval_batch_size": bs,
                "output_dir": out,
                "longvideo_kwargs": {"chunked_prefill_frames": 4,
                                     "frame_chunk_size": 4},
            }
        )

    engine = Qwen2VLEngine(cfg, params, build_rt(None, 1))
    processor = Qwen2VLProcessor(
        StubTokenizer(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        min_pixels=1,
    )
    dataset = BaseDataset(
        anno_file,
        processor_kwargs=dict(
            video_fps=4, video_maxlen=8, image_resolution=84,
            video_frame_extraction_fps=2,
        ),
    )
    rt_serial = build_rt(str(tmp_path / "serial"), 1)
    rt_batch = build_rt(str(tmp_path / "batch"), 3)  # 4 samples -> 3 + 1
    done_serial = run_eval(engine, processor, dataset, rt_serial,
                           rank=0, world=1)
    done_batch = run_eval(engine, processor, dataset, rt_batch,
                          rank=0, world=1)
    assert done_batch == done_serial


@pytest.fixture()
def shared_video_benchmark(tmp_path):
    """3 videos, (3, 2, 1) questions each — multiple questions per video is
    the real benchmark shape (VideoMME asks 3 per video)."""
    rng = np.random.default_rng(5)
    annos = []
    for v, n_q in enumerate((3, 2, 1)):
        vdir = tmp_path / f"vid{v}"
        os.makedirs(vdir)
        base = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
        for i in range(12):
            Image.fromarray(np.roll(base, v * 7 + i * 3, axis=1)).save(
                vdir / f"{i:06d}.jpg"
            )
        for q in range(n_q):
            annos.append({
                "messages": [
                    {"role": "user",
                     "content": f"<video>Question {v}.{q}? A. x B. y"},
                    {"role": "assistant", "content": "AB"[q % 2]},
                ],
                "videos": [str(vdir)],
                "meta": json.dumps({
                    "task_type": "t1", "domain": "d",
                    "duration": ["short", "medium", "long"][v],
                    "question": f"Question {v}.{q}?",
                }),
            })
    anno_file = tmp_path / "anno.json"
    anno_file.write_text(json.dumps(annos))
    return str(anno_file)


@pytest.mark.parametrize("eval_batch_size", [1, 2])
def test_eval_reuse_video_features(shared_video_benchmark, tmp_path,
                                   monkeypatch, eval_batch_size):
    """reuse_video_features: one vision encode per VIDEO (not per question),
    round-robin sharding BY VIDEO, answers identical to the per-sample
    path."""
    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)

    def build_rt(out, reuse):
        return RetakeConfig.from_dict({
            "dataset_name": "videomme", "max_new_tokens": 4,
            "eval_batch_size": eval_batch_size,
            "output_dir": str(tmp_path / out),
            "reuse_video_features": reuse,
            "longvideo_kwargs": {"chunked_prefill_frames": 4,
                                 "frame_chunk_size": 4},
        })

    processor = Qwen2VLProcessor(
        StubTokenizer(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        min_pixels=1,
    )
    dataset = BaseDataset(
        shared_video_benchmark,
        processor_kwargs=dict(video_fps=4, video_maxlen=8,
                              image_resolution=84,
                              video_frame_extraction_fps=2),
    )

    rt_base = build_rt("base", False)
    engine = Qwen2VLEngine(cfg, params, rt_base)
    base0 = run_eval(engine, processor, dataset, rt_base, rank=0, world=1)

    n_encodes = 0
    orig = Qwen2VLEngine.encode_video

    def counting(self, *a, **kw):
        nonlocal n_encodes
        n_encodes += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Qwen2VLEngine, "encode_video", counting)
    rt = build_rt("reuse", True)
    # two "ranks": videos (not samples) round-robin — rank 0 gets videos
    # 0 and 2 (questions 0,1,2,5), rank 1 gets video 1 (questions 3,4)
    done0 = run_eval(engine, processor, dataset, rt, rank=0, world=2)
    done1 = run_eval(engine, processor, dataset, rt, rank=1, world=2)
    assert sorted(done0) == [0, 1, 2, 5] and sorted(done1) == [3, 4]
    assert n_encodes == 3  # one per video, not one per question
    merged = {**done0, **done1}
    assert merged == base0

    # resume: a second pass re-encodes nothing and re-runs nothing
    n_encodes = 0
    done0b = run_eval(None, processor, dataset, rt, rank=0, world=2)
    assert done0b == done0 and n_encodes == 0


def _journal_records(out_dir, rank=0):
    with open(os.path.join(out_dir, f"shard_{rank:03d}.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_eval_reuse_journal_outcomes(shared_video_benchmark, tmp_path,
                                     monkeypatch):
    """Every journaled sample under reuse_video_features attributes its
    answer to the reuse vs inline path: metrics.prefill_reused always
    present, metrics.prefill_fallback names the reason on the inline path
    (mismatch / capture_failed / unsupported) — round-4 VERDICT #6."""
    cfg = TINY_TEST_CONFIG
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)

    def build_rt(out):
        return RetakeConfig.from_dict({
            "dataset_name": "videomme", "max_new_tokens": 4,
            "output_dir": str(tmp_path / out),
            "reuse_video_features": True,
            "longvideo_kwargs": {"chunked_prefill_frames": 4,
                                 "frame_chunk_size": 4},
        })

    processor = Qwen2VLProcessor(
        StubTokenizer(),
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        video_token_id=cfg.video_token_id,
        patch_size=cfg.vision.patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        min_pixels=1,
    )
    dataset = BaseDataset(
        shared_video_benchmark,
        processor_kwargs=dict(video_fps=4, video_maxlen=8,
                              image_resolution=84,
                              video_frame_extraction_fps=2),
    )
    allowed = {"mismatch", "capture_failed", "unsupported"}

    def check(out_dir, n_expected):
        recs = _journal_records(out_dir)
        assert len(recs) == n_expected
        for rec in recs:
            m = rec["metrics"]
            assert isinstance(m["prefill_reused"], bool)
            if m["prefill_reused"]:
                assert "prefill_fallback" not in m
            else:
                assert m["prefill_fallback"] in allowed
        return recs

    rt = build_rt("ok")
    engine = Qwen2VLEngine(cfg, params, rt)
    base = run_eval(engine, processor, dataset, rt, rank=0, world=1)
    recs = check(rt.output_dir, 6)
    # healthy path on this config: every sample reuses the captured prefix
    assert all(r["metrics"]["prefill_reused"] for r in recs)

    # capture failure (per-video): every sample falls back, reason recorded,
    # answers unchanged (correctness never depends on the cache)
    def boom(self, *a, **kw):
        raise ValueError("synthetic capture failure")

    monkeypatch.setattr(Qwen2VLEngine, "encode_prefix", boom)
    rt = build_rt("capfail")
    done = run_eval(engine, processor, dataset, rt, rank=0, world=1)
    recs = check(rt.output_dir, 6)
    assert all(r["metrics"]["prefill_fallback"] == "capture_failed"
               for r in recs)
    assert done == base

    # config-level unsupported: first capture raises PrefixUnsupported,
    # later videos must not even attempt a capture
    from retake_tpu.runtime.engine import PrefixUnsupported

    calls = 0

    def unsupported(self, *a, **kw):
        nonlocal calls
        calls += 1
        raise PrefixUnsupported("synthetic: prompt_guided_compression")

    monkeypatch.setattr(Qwen2VLEngine, "encode_prefix", unsupported)
    rt = build_rt("unsup")
    done = run_eval(engine, processor, dataset, rt, rank=0, world=1)
    recs = check(rt.output_dir, 6)
    assert all(r["metrics"]["prefill_fallback"] == "unsupported"
               for r in recs)
    assert calls == 1 and done == base
