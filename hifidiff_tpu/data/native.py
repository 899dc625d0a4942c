"""ctypes binding for the C++ data-path core (native/src/hifidiff_native.cc).

Provides cv2-semantics resize (INTER_LINEAR/INTER_CUBIC), BORDER_REFLECT_101
filter2d, Gaussian noise, 8-bit quantization, a fused blur->downsample->noise
degradation stage, and a threaded batch resize — the native replacements for
the cv2/basicsr kernels the reference's loader depends on
(`dataset_multipie.py:104-146`).

Build once with `sh native/build.sh` (or `python -m hifidiff_tpu.data.native
--build`). `available()` gates callers; every op has a numpy/cv2 fallback in
`hifidiff_tpu.data.degradations`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libhifidiff_native.so")
_lib: Optional[ctypes.CDLL] = None


def build() -> None:
    script = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                          "build.sh")
    subprocess.run(["sh", os.path.abspath(script)], check=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.hn_resize.argtypes = [f32p, f32p] + [ctypes.c_int] * 6
    lib.hn_filter2d.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, f32p, ctypes.c_int,
                                ctypes.c_int]
    lib.hn_add_gaussian_noise.argtypes = [f32p, ctypes.c_int64,
                                          ctypes.c_float, ctypes.c_uint64]
    lib.hn_quantize8.argtypes = [f32p, ctypes.c_int64]
    lib.hn_degrade_stage1.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, f32p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float, ctypes.c_uint64]
    lib.hn_resize_batch.argtypes = [f32p, f32p] + [ctypes.c_int] * 8
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f32c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def resize(img: np.ndarray, out_hw, cubic: bool = True) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native lib not built (sh native/build.sh)"
    img = _f32c(img)
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.empty((oh, ow, c), np.float32)
    lib.hn_resize(_ptr(img), _ptr(out), h, w, c, oh, ow, int(cubic))
    return out


def resize_batch(imgs: np.ndarray, out_hw, cubic: bool = True,
                 num_threads: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    imgs = _f32c(imgs)
    b, h, w, c = imgs.shape
    oh, ow = out_hw
    out = np.empty((b, oh, ow, c), np.float32)
    threads = num_threads or (os.cpu_count() or 1)
    lib.hn_resize_batch(_ptr(imgs), _ptr(out), b, h, w, c, oh, ow,
                        int(cubic), threads)
    return out


def filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = _f32c(img)
    kernel = _f32c(kernel)
    h, w, c = img.shape
    out = np.empty_like(img)
    lib.hn_filter2d(_ptr(img), _ptr(out), h, w, c, _ptr(kernel),
                    kernel.shape[0], kernel.shape[1])
    return out


def add_gaussian_noise(img: np.ndarray, sigma: float,
                       seed: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = _f32c(img).copy()
    lib.hn_add_gaussian_noise(_ptr(img), img.size, sigma, seed)
    return img


def quantize8(img: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = _f32c(img).copy()
    lib.hn_quantize8(_ptr(img), img.size)
    return img


def degrade_stage1(img: np.ndarray, kernel: np.ndarray, small_hw,
                   noise_sigma: float, seed: int) -> np.ndarray:
    """Fused blur -> bilinear downsample -> clipped Gaussian noise."""
    lib = _load()
    assert lib is not None
    img = _f32c(img)
    kernel = _f32c(kernel)
    h, w, c = img.shape
    sh, sw = small_hw
    out = np.empty((sh, sw, c), np.float32)
    lib.hn_degrade_stage1(_ptr(img), _ptr(out), h, w, c, _ptr(kernel),
                          kernel.shape[0], sh, sw, noise_sigma, seed)
    return out


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        build()
        print("native available:", available())
