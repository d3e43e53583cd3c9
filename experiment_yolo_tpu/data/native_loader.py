"""ctypes bindings for the native C++ data-loader core (native/dataloader.cpp).

Decode (libjpeg/libpng) + bilinear letterbox + thread-pool batch fill run
in C++, releasing the GIL for the whole batch; falls back to the cv2 path
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libyolodata.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.yolodata_load_batch.restype = ctypes.c_int
    lib.yolodata_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.yolodata_decode.restype = ctypes.c_int
    lib.yolodata_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.yolodata_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    try:  # added after the first release of the .so; stale builds lack it
        lib.yolodata_decode_buffer.restype = ctypes.c_int
        lib.yolodata_decode_buffer.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    except AttributeError:
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_letterboxed_batch(
    paths: List[str], imgsz: int, workers: int = 8
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode + letterbox a batch natively.

    Returns (batch (N, S, S, 3) uint8 RGB, ratio_pad (N, 3) [gain, padw,
    padh], n_failures).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libyolodata.so not built — run `make -C native`")
    n = len(paths)
    out = np.empty((n, imgsz, imgsz, 3), np.uint8)
    rp = np.empty((n, 3), np.float32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    failures = lib.yolodata_load_batch(
        blob,
        n,
        imgsz,
        workers,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, rp, int(failures)


def decode_image_bytes(raw: bytes) -> Optional[np.ndarray]:
    """Decode an in-memory JPEG/PNG buffer natively -> (H, W, 3) uint8 RGB.

    Returns None when the native lib is unavailable (or too old) or the
    buffer isn't decodable — callers fall back to cv2.imdecode. This is the
    serving hot path (serve.py receives bytes over HTTP, not file paths).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "yolodata_decode_buffer"):
        return None
    data = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.yolodata_decode_buffer(raw, len(raw), ctypes.byref(data),
                                  ctypes.byref(h), ctypes.byref(w)):
        return None
    arr = np.ctypeslib.as_array(data, shape=(h.value, w.value, 3)).copy()
    lib.yolodata_free(data)
    return arr


def decode_image(path: str) -> np.ndarray:
    """Decode one image natively -> (H, W, 3) uint8 RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libyolodata.so not built — run `make -C native`")
    data = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.yolodata_decode(path.encode(), ctypes.byref(data), ctypes.byref(h), ctypes.byref(w)):
        raise ValueError(f"native decode failed for {path}")
    arr = np.ctypeslib.as_array(data, shape=(h.value, w.value, 3)).copy()
    lib.yolodata_free(data)
    return arr
