"""HTTP serving front-end (runtime/http_server.py): health, blocking
generate, SSE streaming — end-to-end through a real socket against the
tiny random-weight engine (frames loaded from a real frame dir)."""

import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

from PIL import Image

import jax.numpy as jnp

from retake_tpu.data.processor import Qwen2VLProcessor
from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.http_server import RetakeHTTPServer
from retake_tpu.utils.config import RetakeConfig

from tests.test_serve import tiny  # noqa: F401  (module-scope fixture)


class StubTokenizer:
    def encode(self, s):
        return [20 + (b % 400) for b in s.encode()][:64]

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_video")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
    for i in range(8):
        Image.fromarray(np.roll(base, i * 5, axis=1)).save(
            root / f"{i:06d}.jpg"
        )
    return str(root)


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=300)


@pytest.mark.slow
def test_http_generate_and_stream(tiny, frame_dir):  # noqa: F811
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"max_new_tokens": 8, "max_num_frames": 8, "sample_fps": 2,
         "longsize_resolution": 84,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
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
    with RetakeHTTPServer(
        engine, processor, rt, port=0,
        batch_slots=2, segment_steps=3, max_new_tokens=8, gap_capacity=64,
    ) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        # health
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["batch_slots"] == 2

        # oracle: the same request through the library
        from retake_tpu.data.video import fetch_video

        frames = fetch_video(frame_dir, 8, 2, 84, extraction_fps=2.0)
        inputs = processor("What happens? A. x B. y", frames)
        expected = engine.generate(
            inputs["input_ids"], inputs["pixel_values_videos"],
            inputs["video_grid_thw"], max_new_tokens=8,
        )

        body = {"question": "What happens? A. x B. y",
                "video_path": frame_dir, "extraction_fps": 2}
        with _post(base + "/v1/generate", body) as r:
            out = json.loads(r.read())
        assert out["tokens"] == [int(t) for t in expected.tokens]
        assert not out["cancelled"] and out["latency_s"] >= out["ttft_s"]

        # SSE streaming: concatenated chunk tokens == the full stream
        with _post(base + "/v1/generate", dict(body, stream=True)) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            events = [json.loads(line[len(b"data: "):])
                      for line in r.read().split(b"\n\n")
                      if line.startswith(b"data: ")]
        streamed = [t for e in events if not e.get("done")
                    for t in e["tokens"]]
        assert streamed == [int(t) for t in expected.tokens]
        assert events[-1]["done"] and not events[-1]["cancelled"]

        # malformed request: clean 400, server stays up
        try:
            _post(base + "/v1/generate", {"video_path": frame_dir})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            assert json.loads(r.read())["ok"]


def test_http_vision_cache(tiny, frame_dir):  # noqa: F811
    """vision_cache_slots over HTTP: a second question about the same
    video_path skips frame loading AND re-encoding, same answers."""
    from retake_tpu.runtime.engine import Qwen2VLEngine as Eng

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"max_new_tokens": 6, "max_num_frames": 8, "sample_fps": 2,
         "longsize_resolution": 84,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
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
    n_enc = {"n": 0}
    orig = Eng.encode_video

    def counting(self, *a, **kw):
        n_enc["n"] += 1
        return orig(self, *a, **kw)

    Eng.encode_video = counting
    try:
        with RetakeHTTPServer(
            engine, processor, rt, port=0,
            batch_slots=2, segment_steps=3, max_new_tokens=6,
            gap_capacity=64, vision_cache_slots=1,
        ) as srv:
            base = f"http://127.0.0.1:{srv.port}"
            body = {"question": "Q one? A. x B. y",
                    "video_path": frame_dir, "extraction_fps": 2}
            with _post(base + "/v1/generate", body) as r:
                out1 = json.loads(r.read())
            with _post(base + "/v1/generate",
                       dict(body, question="Q one? A. x B. y")) as r:
                out2 = json.loads(r.read())
            assert n_enc["n"] == 1  # second request: cache hit end-to-end
            assert out1["tokens"] == out2["tokens"]  # identical question
            # a different extraction_fps is a DIFFERENT frame set: the
            # cache key includes it, so this must MISS and re-encode
            with _post(base + "/v1/generate",
                       dict(body, extraction_fps=1)) as r:
                json.loads(r.read())
            assert n_enc["n"] == 2
    finally:
        Eng.encode_video = orig


def test_http_prefix_cache(tiny, frame_dir):  # noqa: F811
    """prefix_cache_slots over HTTP: a re-ask of the same video_path skips
    frame loading, vision, AND the video prefill (VideoPrefix hit) — tokens
    identical to the capturing request for the same question."""
    from retake_tpu.runtime.engine import Qwen2VLEngine as Eng

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"max_new_tokens": 6, "max_num_frames": 8, "sample_fps": 2,
         "longsize_resolution": 84,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
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
    n_enc = {"n": 0}
    orig = Eng.encode_video

    def counting(self, *a, **kw):
        n_enc["n"] += 1
        return orig(self, *a, **kw)

    Eng.encode_video = counting
    try:
        with RetakeHTTPServer(
            engine, processor, rt, port=0,
            batch_slots=2, segment_steps=3, max_new_tokens=6,
            gap_capacity=64, prefix_cache_slots=1,
        ) as srv:
            base = f"http://127.0.0.1:{srv.port}"
            body = {"question": "Q one? A. x B. y",
                    "video_path": frame_dir, "extraction_fps": 2}
            with _post(base + "/v1/generate", body) as r:
                out1 = json.loads(r.read())  # miss: captures the prefix
            with _post(base + "/v1/generate", dict(body)) as r:
                out2 = json.loads(r.read())  # hit: suffix-only prefill
            assert n_enc["n"] == 1  # capture encoded once; hit skipped all
            assert out1["tokens"] == out2["tokens"]  # token-exact reuse
            # different question, same video: still a prefix hit
            with _post(base + "/v1/generate",
                       dict(body, question="Q two? A. p B. q")) as r:
                out3 = json.loads(r.read())
            assert n_enc["n"] == 1 and out3["tokens"]
            with urllib.request.urlopen(base + "/metrics") as r:
                m = json.loads(r.read())
            assert m["prefix_cache_misses"] == 1
            assert m["prefix_cache_hits"] == 2
            assert m["prefix_cache_entries"] == 1
    finally:
        Eng.encode_video = orig


def test_http_metrics(tiny, frame_dir):  # noqa: F811
    """GET /metrics: serving counters consistent with the work done."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"max_new_tokens": 6, "max_num_frames": 8, "sample_fps": 2,
         "longsize_resolution": 84,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
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
    with RetakeHTTPServer(
        engine, processor, rt, port=0,
        batch_slots=2, segment_steps=3, max_new_tokens=6,
        gap_capacity=64, vision_cache_slots=1,
    ) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        body = {"question": "Q? A. x B. y", "video_path": frame_dir,
                "extraction_fps": 2}
        with _post(base + "/v1/generate", body) as r:
            out1 = json.loads(r.read())
        with _post(base + "/v1/generate", body) as r:
            json.loads(r.read())
        with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
            m = json.loads(r.read())
        assert m["requests_admitted"] == 2
        assert m["requests_finished"] == 2
        assert m["requests_cancelled"] == 0
        assert m["tokens_emitted"] >= 2 * len(out1["tokens"])
        assert m["vision_cache_misses"] == 1
        assert m["vision_cache_hits"] == 1
        assert m["vision_cache_entries"] == 1
        assert m["segments_dispatched"] >= 1 and m["uptime_s"] >= 0


def test_http_503_on_full_backlog(tiny, frame_dir):  # noqa: F811
    """max_queue: a POST arriving with the backlog full gets 503 +
    Retry-After; earlier requests complete normally."""
    import threading

    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"max_new_tokens": 24, "max_num_frames": 8, "sample_fps": 2,
         "longsize_resolution": 84,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
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
    with RetakeHTTPServer(
        engine, processor, rt, port=0, max_queue=1,
        batch_slots=1, segment_steps=2, max_new_tokens=24, gap_capacity=64,
    ) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        body = {"question": "Q? A. x B. y", "video_path": frame_dir,
                "extraction_fps": 2}
        # request 1: stream, read its first event => it is ADMITTED (the
        # backlog is empty again) and will decode for a while
        r1 = _post(base + "/v1/generate", dict(body, stream=True))
        first = r1.readline()
        assert first.startswith(b"data: ")
        results = {}

        def post2():
            with _post(base + "/v1/generate", body) as r:
                results["r2"] = json.loads(r.read())

        t2 = threading.Thread(target=post2)
        t2.start()
        # wait until request 2 is actually queued (backlog == 1)
        for _ in range(200):
            if srv.handle._q.qsize() >= 1:
                break
            import time
            time.sleep(0.01)
        assert srv.handle._q.qsize() >= 1
        try:
            _post(base + "/v1/generate", body)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503 and e.headers["Retry-After"]
        r1.read()  # drain request 1's stream
        r1.close()
        t2.join(timeout=300)
        assert results["r2"]["tokens"]  # request 2 completed normally
