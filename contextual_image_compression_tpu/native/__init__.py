"""Native (C++) runtime tier: adaptive range coder for real bitstreams.

Builds entropy_coder.cpp with g++ at first use (cached next to the source) and
binds via ctypes. If no toolchain is available the package still works -- callers
fall back to zlib (see ops/dct.py) -- mirroring the graceful-degradation style the
reference uses for its optional dependencies (GAN_train.py:187-195).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "entropy_coder.cpp")
_LIB_PATH = os.path.join(_HERE, "libcic_entropy.so")
_LOADER_SRC = os.path.join(_HERE, "image_loader.cpp")
_LOADER_LIB_PATH = os.path.join(_HERE, "libcic_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_loader_lib: Optional[ctypes.CDLL] = None
_loader_build_failed = False


def _run_build(cmd) -> bool:
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / sandboxed
        print(f"native build failed ({' '.join(cmd[:2])}...): {e}")
        return False


def _build() -> Optional[str]:
    ok = _run_build([
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        "-o", _LIB_PATH, _SRC,
    ])
    return _LIB_PATH if ok else None


def _is_fresh(lib_path: str, src_path: str) -> bool:
    """A prebuilt .so is used only if it is newer than its source -- editing the
    C++ must never silently keep running a stale binary."""
    try:
        return os.path.getmtime(lib_path) >= os.path.getmtime(src_path)
    except OSError:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The bound library, building it on first use (or when the source is newer
    than the cached .so); None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = _LIB_PATH if _is_fresh(_LIB_PATH, _SRC) else _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.cic_entropy_encode.restype = ctypes.c_size_t
        lib.cic_entropy_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        lib.cic_entropy_decode.restype = ctypes.c_size_t
        lib.cic_entropy_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ]
        lib.cic_entropy_encode_batch.restype = ctypes.c_size_t
        lib.cic_entropy_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_int,
        ]
        lib.cic_entropy_decode_batch.restype = ctypes.c_size_t
        lib.cic_entropy_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def entropy_encode(symbols: np.ndarray) -> bytes:
    """Encode a 1-D int16 symbol array into a range-coded bitstream."""
    lib = load()
    if lib is None:
        raise RuntimeError("native entropy coder unavailable")
    s = np.ascontiguousarray(symbols, dtype=np.int16)
    cap = max(64, s.size * 4 + 64)
    out = np.empty(cap, np.uint8)
    n = lib.cic_entropy_encode(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), s.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n == 0 and s.size:
        raise RuntimeError("entropy encode overflow")
    return out[:n].tobytes()


def entropy_decode(data: bytes, n_symbols: int) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native entropy coder unavailable")
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(n_symbols, np.int16)
    got = lib.cic_entropy_decode(
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), inp.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n_symbols,
    )
    if got != n_symbols:
        raise RuntimeError(f"entropy decode: got {got}/{n_symbols} symbols")
    return out


def entropy_encode_batch(symbols: np.ndarray, num_threads: int = 0) -> bytes:
    """Encode (B, N) int16 symbols as independent per-item streams
    ([uint32 length][bytes] framing), multithreaded in C++."""
    lib = load()
    if lib is None:
        raise RuntimeError("native entropy coder unavailable")
    s = np.ascontiguousarray(symbols, dtype=np.int16)
    assert s.ndim == 2
    if num_threads <= 0:
        num_threads = min(16, os.cpu_count() or 1)
    cap = max(64, s.size * 4 + 64 + 8 * s.shape[0])
    out = np.empty(cap, np.uint8)
    n = lib.cic_entropy_encode_batch(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), s.shape[0], s.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap, num_threads,
    )
    if n == 0 and s.size:
        raise RuntimeError("entropy batch encode overflow")
    return out[:n].tobytes()


def entropy_decode_batch(data: bytes, batch: int, n_per_item: int,
                         num_threads: int = 0) -> np.ndarray:
    """Inverse of entropy_encode_batch, multithreaded in C++."""
    lib = load()
    if lib is None:
        raise RuntimeError("native entropy coder unavailable")
    if num_threads <= 0:
        num_threads = min(16, os.cpu_count() or 1)
    inp = np.frombuffer(data, np.uint8)
    out = np.empty((batch, n_per_item), np.int16)
    got = lib.cic_entropy_decode_batch(
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), inp.size,
        batch, n_per_item,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), num_threads,
    )
    if got != batch:
        raise RuntimeError(f"entropy batch decode: {got}/{batch} items decoded")
    return out


# ---------------------------------------------------------------- image loader


def load_loader() -> Optional[ctypes.CDLL]:
    """The native multithreaded JPEG/PNG loader library; None if unavailable."""
    global _loader_lib, _loader_build_failed
    with _lock:
        if _loader_lib is not None:
            return _loader_lib
        if _loader_build_failed:
            return None
        if not _is_fresh(_LOADER_LIB_PATH, _LOADER_SRC):
            ok = _run_build([
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                "-o", _LOADER_LIB_PATH, _LOADER_SRC, "-ljpeg", "-lpng",
            ])
            if not ok:
                _loader_build_failed = True
                return None
        lib = ctypes.CDLL(_LOADER_LIB_PATH)
        lib.cic_load_images.restype = ctypes.c_size_t
        lib.cic_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _loader_lib = lib
        return _loader_lib


def loader_available() -> bool:
    return load_loader() is not None


def load_images(paths, target_size, normalization: str = "gan",
                num_threads: int = 0):
    """Threaded native decode+resize+normalize of image files.

    paths: sequence of file paths; target_size: (W, H) like cv2.resize;
    normalization: 'gan' -> [-1,1], 'unit' -> [0,1].
    Returns (batch float32 (N, H, W, 3), ok bool mask (N,)).
    """
    lib = load_loader()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    tw, th = target_size
    n = len(paths)
    out = np.empty((n, th, tw, 3), np.float32)
    ok = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(16, os.cpu_count() or 1)
    lib.cic_load_images(
        c_paths, n, th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if normalization == "gan" else 0,
        num_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok.astype(bool)
