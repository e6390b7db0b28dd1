"""ctypes bindings for the native host data pipeline (framepipe.cpp).

Builds the shared library on first use (g++ -O3, links libjpeg) and caches it
next to the source. All entry points degrade gracefully: callers should catch
``NativeUnavailable`` and fall back to the numpy/PIL paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libframepipe.so")
_SRC = os.path.join(_HERE, "framepipe.cpp")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-ljpeg", "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                _build()
            except Exception as e:  # no compiler / no libjpeg
                raise NativeUnavailable(f"framepipe build failed: {e}") from e
        lib = ctypes.CDLL(_SO)
        lib.rt_load_frames.restype = ctypes.c_int
        lib.rt_load_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.rt_decode_jpeg.restype = ctypes.c_int
        lib.rt_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rt_patchify_qwen.restype = ctypes.c_int
        lib.rt_patchify_qwen.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return lib


def probe_jpeg_size(path: str) -> Tuple[int, int]:
    from PIL import Image

    with Image.open(path) as img:
        return img.height, img.width


def load_frames(
    paths: List[str], resolution: int, threads: Optional[int] = None
) -> np.ndarray:
    """Decode JPEG frames + longest-side NEAREST resize -> [n, h, w, 3] u8."""
    lib = get_lib()
    h0, w0 = probe_jpeg_size(paths[0])
    if max(h0, w0) > resolution and resolution > 0:
        factor = resolution / max(h0, w0)
        dh, dw = int(h0 * factor), int(w0 * factor)
    else:
        dh, dw = h0, w0
    out = np.empty((len(paths), dh, dw, 3), np.uint8)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    oh, ow = ctypes.c_int(), ctypes.c_int()
    rc = lib.rt_load_frames(
        blob, len(paths), resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(oh), ctypes.byref(ow),
        threads or os.cpu_count() or 1,
    )
    if rc != 0:
        raise NativeUnavailable(f"rt_load_frames failed rc={rc}")
    assert (oh.value, ow.value) == (dh, dw), (oh.value, ow.value, dh, dw)
    return out


def patchify_qwen(
    frames: np.ndarray,  # [T, H, W, 3] uint8, H/W multiples of ps*merge
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    mean=None,
    std=None,
    threads: Optional[int] = None,
) -> np.ndarray:
    from retake_tpu.data.processor import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

    lib = get_lib()
    mean = np.asarray(mean if mean is not None else OPENAI_CLIP_MEAN, np.float32)
    std = np.asarray(std if std is not None else OPENAI_CLIP_STD, np.float32)
    t, h, w, _ = frames.shape
    grid_t = -(-t // temporal_patch_size)
    gh, gw = h // patch_size, w // patch_size
    out = np.empty(
        (grid_t * gh * gw, 3 * temporal_patch_size * patch_size**2), np.float32
    )
    frames = np.ascontiguousarray(frames)
    rc = lib.rt_patchify_qwen(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, patch_size, temporal_patch_size, merge_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        threads or os.cpu_count() or 1,
    )
    if rc != 0:
        raise NativeUnavailable(f"rt_patchify_qwen failed rc={rc}")
    return out
