"""ctypes bindings for the native image-preprocessing library.

Loads ``native/libllava_img.so`` (built by ``make -C native``); every entry
point has a PIL/numpy fallback, so the native path is a pure speedup knob.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[Path]:
    here = Path(__file__).resolve()
    candidates = [here.parents[2] / "native" / "libllava_img.so"]
    env = os.environ.get("LLAVA_IMG_LIB")
    if env:
        candidates.append(Path(env))
    for c in candidates:
        if c.is_file():
            return c
    return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.clip_preprocess.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p,
    ]
    lib.clip_preprocess.restype = ctypes.c_int
    lib.clip_preprocess_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, f32p,
    ]
    lib.clip_preprocess_batch.restype = ctypes.c_int
    lib.expand2square_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, u8p,
    ]
    lib.expand2square_u8.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def clip_preprocess(
    image: np.ndarray,  # uint8 [H, W, 3]
    shortest_edge: int = 336,
    crop: int = 336,
    mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
) -> np.ndarray:
    lib = load_library()
    assert lib is not None, "native library not built (make -C native)"
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    out = np.empty((crop, crop, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    rc = lib.clip_preprocess(
        _u8p(image), h, w, shortest_edge, crop,
        _f32p(mean_a), _f32p(std_a), _f32p(out),
    )
    assert rc == 0
    return out


def clip_preprocess_batch(
    images: np.ndarray,  # uint8 [N, H, W, 3], same dims
    shortest_edge: int = 336,
    crop: int = 336,
    mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w = images.shape[:3]
    out = np.empty((n, crop, crop, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    rc = lib.clip_preprocess_batch(
        _u8p(images), n, h, w, shortest_edge, crop,
        _f32p(mean_a), _f32p(std_a), _f32p(out),
    )
    assert rc == 0
    return out


def expand2square(image: np.ndarray, background: Sequence[int]) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    side = max(h, w)
    out = np.empty((side, side, 3), np.uint8)
    bg = np.asarray(background, np.uint8)
    lib.expand2square_u8(_u8p(image), h, w, _u8p(bg), _u8p(out))
    return out
