"""ctypes bindings for the native host loader (native/libvcg_host.so).

Provides a threaded libjpeg decode path for the frame pipeline; falls back
silently to the pure-python PIL path when the library isn't built.
Build with `native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libvcg_host.so"),
    "libvcg_host.so",
)


class NativeLoader:
    """Thread-pooled JPEG batch decoder."""

    def __init__(self, n_threads: int = 4, lib_path: Optional[str] = None):
        path = lib_path or next(
            (p for p in _LIB_PATHS if os.path.exists(p)), None
        )
        if path is None:
            raise FileNotFoundError(
                "libvcg_host.so not found — run native/build.sh"
            )
        self.lib = ctypes.CDLL(os.path.abspath(path))
        self.lib.vcg_pool_create.restype = ctypes.c_void_p
        self.lib.vcg_pool_create.argtypes = [ctypes.c_int]
        self.lib.vcg_pool_destroy.argtypes = [ctypes.c_void_p]
        self.lib.vcg_decode_batch.restype = ctypes.c_int
        self.lib.vcg_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        self.lib.vcg_decode_file.restype = ctypes.c_int
        self.lib.vcg_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        try:
            self.lib.vcg_decode_batch_s2d.restype = ctypes.c_int
            self.lib.vcg_decode_batch_s2d.argtypes = (
                self.lib.vcg_decode_batch.argtypes)
            self._has_s2d = True
        except AttributeError:  # older library build
            self._has_s2d = False
        self.lib.vcg_normalize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.pool = self.lib.vcg_pool_create(n_threads)
        self.failures = 0

    def __del__(self):
        pool = getattr(self, "pool", None)
        if pool:
            self.lib.vcg_pool_destroy(pool)
            self.pool = None

    def decode_batch(self, paths: Sequence[str], hw: int = 224) -> np.ndarray:
        """paths -> uint8 [N, hw, hw, 3]; unreadable files are zero-filled."""
        n = len(paths)
        out = np.empty((n, hw, hw, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(
            *[os.fsencode(p) for p in paths]
        )
        failed = self.lib.vcg_decode_batch(
            self.pool, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), hw,
        )
        self.failures += failed
        return out

    def decode_batch_s2d(self, paths: Sequence[str],
                         hw: int = 224) -> np.ndarray:
        """paths -> uint8 [N, hw/4, hw/4, 48]: frames emitted directly in
        the 4x4 space-to-depth order the fused TPU stem consumes
        (ops/stem_pallas.py) — the reorder is a fixed permutation done at
        decode time in the thread pool, replacing a per-batch on-device
        transpose. Falls back to decode + numpy reorder on older builds."""
        n = len(paths)
        assert hw % 4 == 0, hw
        if not self._has_s2d:
            return space_to_depth4(self.decode_batch(paths, hw))
        out = np.empty((n, hw // 4, hw // 4, 48), np.uint8)
        arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
        failed = self.lib.vcg_decode_batch_s2d(
            self.pool, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), hw,
        )
        self.failures += failed
        return out

    def normalize_f32(self, u8: np.ndarray, mean, std) -> np.ndarray:
        """Fused uint8 -> normalized float32 on the host (SIMD-vectorized
        by the compiler). Prefer the on-device ops.preprocess path; this is
        for host-side consumers (e.g. feature dumps)."""
        assert u8.shape[-1] == 3 and u8.flags["C_CONTIGUOUS"]
        dst = np.empty(u8.shape, np.float32)
        m = np.ascontiguousarray(mean, np.float32)
        s = np.ascontiguousarray(std, np.float32)
        self.lib.vcg_normalize_f32(
            u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            u8.size // 3,
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return dst


def space_to_depth4(frames: np.ndarray) -> np.ndarray:
    """uint8 [..., H, W, 3] -> [..., H/4, W/4, 48] (numpy fallback for the
    native s2d decode path; channel order di*12 + dj*3 + c)."""
    *lead, h, w, c = frames.shape
    out = frames.reshape(*lead, h // 4, 4, w // 4, 4, c)
    nd = out.ndim
    out = out.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2,
                        nd - 1)
    return np.ascontiguousarray(out).reshape(*lead, h // 4, w // 4, 48)


def install_native_loader(n_threads: int = 4) -> bool:
    """Route data.frames.load_clip_frames through the native decoder.
    Returns False (no-op) when the library isn't built."""
    from . import frames

    try:
        loader = NativeLoader(n_threads)
    except (FileNotFoundError, OSError):
        return False
    fn = lambda paths, hw: loader.decode_batch(paths, hw)
    fn.s2d = lambda paths, hw: loader.decode_batch_s2d(paths, hw)
    frames.set_native_loader(fn)
    return True
