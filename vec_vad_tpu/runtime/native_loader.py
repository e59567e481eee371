"""ctypes bindings for the native vadio frame loader (native/vadio.cpp).

Provides a drop-in LazyFrameStack replacement that decodes JPEG/PNG frame
chunks with a C++ thread pool into preallocated buffers, plus a background
prefetcher pipelining the next chunk's disk+decode work under the current
chunk's device compute — replacing the reference's per-frame cv2.imread
hot path (vad_datasets.py:18-25,356-402).

Falls back transparently to the cv2 path when the shared library is not
built or the format is unsupported (jpeg/png/tiff are native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_REPO_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def native_dir() -> str:
    """Directory holding vadio.cpp/Makefile/libvadio.so.

    VEC_VAD_NATIVE_DIR overrides the repo-layout default (../../native
    relative to the package) — needed when the package is installed into
    site-packages rather than run from a checkout (pyproject.toml)."""
    return os.environ.get("VEC_VAD_NATIVE_DIR", _REPO_NATIVE_DIR)


def _so_path() -> str:
    return os.path.join(native_dir(), "libvadio.so")


def build_native(force: bool = False) -> bool:
    """Compile libvadio.so via the Makefile; returns success."""
    if os.path.exists(_so_path()) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", native_dir()], check=True, capture_output=True
        )
        return os.path.exists(_so_path())
    except Exception:
        return False


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_so_path()):
        if not (auto_build and build_native()):
            return None
    lib = ctypes.CDLL(_so_path())
    lib.vadio_decode.restype = ctypes.c_int
    lib.vadio_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.vadio_pool_create.restype = ctypes.c_void_p
    lib.vadio_pool_create.argtypes = [ctypes.c_int]
    lib.vadio_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.vadio_pool_decode_batch.restype = ctypes.c_int
    lib.vadio_pool_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.vadio_prefetcher_create.restype = ctypes.c_void_p
    lib.vadio_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vadio_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.vadio_prefetcher_next.restype = ctypes.c_int
    lib.vadio_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    _LIB = lib
    return lib


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


_SUPPORTED = (".jpg", ".jpeg", ".png", ".tif", ".tiff")


def native_supported(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in _SUPPORTED


class NativePool:
    """Thread-pool batch decoder."""

    def __init__(self, n_threads: Optional[int] = None):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("libvadio.so unavailable")
        n_threads = n_threads or max(os.cpu_count() or 1, 1)
        self._pool = self.lib.vadio_pool_create(n_threads)

    def decode_batch(
        self, paths: Sequence[str], h: int, w: int,
        out: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        n = len(paths)
        if out is None:
            out = np.empty((n, h, w, 3), np.uint8)
        assert out.shape == (n, h, w, 3) and out.dtype == np.uint8
        errs = self.lib.vadio_pool_decode_batch(
            self._pool, _paths_array(paths), n,
            out.ctypes.data_as(ctypes.c_void_p), h, w,
        )
        if errs:
            raise IOError(f"{errs}/{n} frames failed native decode")
        return out

    def __del__(self):
        if getattr(self, "_pool", None) and self.lib is not None:
            self.lib.vadio_pool_destroy(self._pool)
            self._pool = None


class NativeFrameStack:
    """LazyFrameStack-compatible frame source backed by the native pool.

    Only valid for datasets whose frames the native decoders support
    (JPEG/PNG — avenue and ShanghaiTech); construct via `make_frame_stack`
    for automatic fallback.
    """

    def __init__(self, index, n_threads: Optional[int] = None):
        assert index.frame_paths is not None
        self.index = index
        self.pool = NativePool(n_threads)
        import cv2

        probe = cv2.imread(index.frame_paths[0])
        self.shape = (index.total_frames,) + probe.shape
        self.dtype = np.dtype(np.uint8)
        self._h, self._w = probe.shape[:2]

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, key):
        if isinstance(key, slice):
            idxs = list(range(*key.indices(self.shape[0])))
        elif np.isscalar(key) or isinstance(key, (int, np.integer)):
            idxs = [int(key)]
        else:
            key = np.asarray(key)
            out = self.pool.decode_batch(
                [self.index.frame_paths[int(i)] for i in key.ravel()],
                self._h, self._w,
            )
            return out.reshape(key.shape + out.shape[1:])
        out = self.pool.decode_batch(
            [self.index.frame_paths[i] for i in idxs], self._h, self._w
        )
        if np.isscalar(key) or isinstance(key, (int, np.integer)):
            return out[0]
        return out

    def __array__(self, dtype=None):
        out = self[0 : self.shape[0]]
        return out.astype(dtype) if dtype is not None else out


class NativePrefetcher:
    """Background chunk prefetcher over a file list."""

    def __init__(
        self, paths: List[str], chunk: int, h: int, w: int,
        n_threads: Optional[int] = None,
    ):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("libvadio.so unavailable")
        self.chunk, self.h, self.w = chunk, h, w
        self._paths_keepalive = _paths_array(paths)
        self._pf = self.lib.vadio_prefetcher_create(
            self._paths_keepalive, len(paths), chunk, h, w,
            n_threads or max(os.cpu_count() or 1, 1),
        )

    def __iter__(self):
        while True:
            out = np.empty((self.chunk, self.h, self.w, 3), np.uint8)
            n = self.lib.vadio_prefetcher_next(
                self._pf, out.ctypes.data_as(ctypes.c_void_p)
            )
            if n == 0:
                return
            if n < 0:
                raise IOError(f"{-n} frame(s) failed native decode in chunk")
            yield out[:n]

    def __del__(self):
        if getattr(self, "_pf", None) and self.lib is not None:
            self.lib.vadio_prefetcher_destroy(self._pf)
            self._pf = None


def make_frame_stack(index, prefer_native: bool = True):
    """Best frame source for this dataset: native pool when the format is
    supported and the library loads, else the cv2-based LazyFrameStack."""
    from vec_vad_tpu.data.readers import LazyFrameStack

    if (
        prefer_native
        and index.frame_paths
        and native_supported(index.frame_paths[0])
        and get_lib() is not None
    ):
        try:
            return NativeFrameStack(index)
        except Exception:
            pass
    return LazyFrameStack(index)
