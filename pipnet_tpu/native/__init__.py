"""Native (C++) host-preprocessing bindings via ctypes.

Builds ``libpipnet_native.so`` from ``preprocess.cc`` on first use (g++ is in
the image; no pybind11 needed).  Falls back to None when no compiler is
available — callers must handle ``lib() is None`` by using the pure-Python
path (``data/augment.py``)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libpipnet_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

IMAGENET_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
IMAGENET_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


def build(force: bool = False) -> Optional[str]:
    src = os.path.join(_DIR, "preprocess.cc")
    if os.path.exists(_SO) and not force and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run([cc, "-O3", "-march=native", "-shared", "-fPIC",
                            src, "-o", _SO], check=True, capture_output=True)
            return _SO
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = build()
        if path:
            _LIB = ctypes.CDLL(path)
            _LIB.resize_crop_normalize.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            _LIB.normalize_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    return _LIB


def resize_crop_normalize(img_u8: np.ndarray, resize_to: int,
                          crop_yx: tuple, crop_hw: tuple, hflip: bool,
                          out: Optional[np.ndarray] = None) -> np.ndarray:
    """uint8 HWC -> resized/cropped/flipped normalized float32 HWC, one pass."""
    L = lib()
    ch, cw = crop_hw
    if out is None:
        out = np.empty((ch, cw, 3), np.float32)
    if L is None:
        # pure-numpy fallback (rarely hit: g++ is in the image)
        from PIL import Image
        im = Image.fromarray(img_u8).resize((resize_to, resize_to), Image.BILINEAR)
        a = np.asarray(im, np.float32)[crop_yx[0]:crop_yx[0] + ch,
                                       crop_yx[1]:crop_yx[1] + cw]
        if hflip:
            a = a[:, ::-1]
        out[:] = (a / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return out
    img_u8 = np.ascontiguousarray(img_u8)
    L.resize_crop_normalize(
        img_u8.ctypes.data, img_u8.shape[0], img_u8.shape[1],
        resize_to, resize_to, crop_yx[0], crop_yx[1], ch, cw, int(hflip),
        IMAGENET_MEAN.ctypes.data, IMAGENET_STD.ctypes.data, out.ctypes.data)
    return out


def normalize_u8(img_u8: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    L = lib()
    h, w = img_u8.shape[:2]
    if out is None:
        out = np.empty((h, w, 3), np.float32)
    if L is None:
        out[:] = (img_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return out
    img_u8 = np.ascontiguousarray(img_u8)
    L.normalize_u8(img_u8.ctypes.data, h, w, IMAGENET_MEAN.ctypes.data,
                   IMAGENET_STD.ctypes.data, out.ctypes.data)
    return out
