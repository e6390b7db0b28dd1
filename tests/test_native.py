"""Native C++ frame pipeline vs the numpy/PIL reference paths."""

import os

import numpy as np
import pytest

from retake_tpu.data import processor as proc_lib

native = pytest.importorskip("retake_tpu.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.get_lib()
    except native.NativeUnavailable as e:
        pytest.skip(f"native build unavailable: {e}")


def test_patchify_matches_numpy(lib, rng):
    frames = rng.integers(0, 255, size=(5, 56, 84, 3), dtype=np.uint8)
    got = native.patchify_qwen(frames)
    expected, grid = proc_lib.preprocess_video(
        [f for f in frames], patch_size=14, merge_size=2, temporal_patch_size=2,
        min_pixels=1, max_pixels=10**9,
    )
    # preprocess_video also smart-resizes; 56x84 are exact multiples of 28 so
    # the resize is identity and shapes line up
    assert got.shape == expected.shape, (got.shape, expected.shape, grid)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_load_frames_roundtrip(lib, rng, tmp_path):
    from PIL import Image

    frames = []
    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        p = tmp_path / f"{i:06d}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        frames.append(arr)
        paths.append(str(p))

    out = native.load_frames(paths, resolution=448)  # no resize needed
    assert out.shape == (4, 120, 160, 3)
    # JPEG is lossy: compare loosely against the PIL decode of the same files
    for i, p in enumerate(paths):
        ref = np.asarray(Image.open(p).convert("RGB"))
        assert np.mean(np.abs(out[i].astype(int) - ref.astype(int))) < 2.0


def test_load_frames_resize_matches_pil(lib, rng, tmp_path):
    from PIL import Image

    from retake_tpu.data.video import resize_longside

    arr = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    p = tmp_path / "000000.jpg"
    Image.fromarray(arr).save(p, quality=100, subsampling=0)
    out = native.load_frames([str(p)], resolution=200)
    decoded = np.asarray(Image.open(p).convert("RGB"))
    expected = resize_longside(decoded, 200)
    assert out.shape[1:3] == expected.shape[:2]
    match = (out[0] == expected).mean()
    assert match > 0.99, f"nearest-resize mismatch: {match:.4f}"
