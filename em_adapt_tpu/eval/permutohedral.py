"""ctypes binding for the native permutohedral-lattice Gaussian filter.

The denseCRF behind the reference's published 37.98% mIoU uses a
permutohedral-lattice bilateral kernel (the external tool at reference
readme.md:40-44); `native/permutohedral.cpp` is a from-scratch
implementation of that algorithm, and this module exposes it as

    permutohedral_filter(values [N, C], features [N, D]) -> [N, C]

approximating sum_j exp(-0.5 ||f_i - f_j||^2) v_j / (same with v=1)
for unit-std features. Built from source on demand like the E-step
kernel (the reference checked in an opaque prebuilt .so).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_NAME = "libemadapt_permutohedral.so"
_lock = threading.Lock()
_lib = None
_load_error: Exception | None = None


def _load():
    global _lib, _load_error
    with _lock:
        if _load_error is not None:
            # A failed build/load is CACHED: dense_crf(method="auto")
            # probes available() once per image across a full val set,
            # and re-spawning a failing `make` subprocess ~1449 times
            # adds minutes to an eval whose fallback is already chosen.
            raise _load_error
        if _lib is None:
            try:
                _lib = _load_locked()
            except Exception as e:
                _load_error = e
                raise
    return _lib


def _load_locked():
    """Build (if needed), dlopen, and declare the C ABI. Caller holds
    ``_lock``."""
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    # Always invoke make (dependency-tracked no-op when fresh) so an
    # edited permutohedral.cpp is never silently served stale; a host
    # with a prebuilt .so but no toolchain still works.
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, _LIB_NAME],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        if not os.path.exists(path):
            raise
    lib = ctypes.CDLL(path)
    lib.emadapt_permutohedral_init.restype = ctypes.c_void_p
    lib.emadapt_permutohedral_init.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # features [n, d]
        ctypes.c_int32,  # n
        ctypes.c_int32,  # d
    ]
    lib.emadapt_permutohedral_filter.restype = ctypes.c_int
    lib.emadapt_permutohedral_filter.argtypes = [
        ctypes.c_void_p,  # lattice
        ctypes.POINTER(ctypes.c_float),  # values [n, c]
        ctypes.POINTER(ctypes.c_float),  # out [n, c]
        ctypes.c_int32,  # n
        ctypes.c_int32,  # c
    ]
    # Touch the symbols eagerly: a stale .so that loads but lacks them
    # must fail HERE (and be cached as a failure) rather than at first
    # use inside an eval loop.
    lib.emadapt_permutohedral_free.restype = None
    lib.emadapt_permutohedral_free.argtypes = [ctypes.c_void_p]
    return lib


def available() -> bool:
    """True if the native library can be loaded/built on this host.
    AttributeError covers a stale/incompatible .so that CDLL loads but
    that lacks the expected symbols — the dense_crf "auto" fallback to
    the bilateral grid must engage there too, not crash."""
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, AttributeError):
        return False


class PermutohedralLattice:
    """A lattice built once from unit-std features [N, D]; ``filter``
    runs normalized Gaussian filtering of values [N, C] over it (the
    homogeneous channel is appended internally). Mean-field inference
    reuses one lattice for all its iterations."""

    def __init__(self, features: np.ndarray):
        self._lib = _load()
        features = np.ascontiguousarray(features, np.float32)
        self.n, self.d = features.shape
        self._handle = self._lib.emadapt_permutohedral_init(
            features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n,
            self.d,
        )
        if not self._handle:
            raise RuntimeError(
                f"permutohedral init failed (n={self.n}, d={self.d})"
            )

    def filter(self, values: np.ndarray) -> np.ndarray:
        values = np.ascontiguousarray(values, np.float32)
        n, c = values.shape
        if n != self.n:
            raise ValueError(f"values N={n} != lattice N={self.n}")
        homog = np.concatenate([values, np.ones((n, 1), np.float32)], axis=1)
        out = np.empty_like(homog)
        rc = self._lib.emadapt_permutohedral_filter(
            self._handle,
            homog.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            c + 1,
        )
        if rc != 0:
            raise RuntimeError(f"permutohedral filter failed with code {rc}")
        norm = np.maximum(out[:, -1:], 1e-12)
        return out[:, :-1] / norm

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.emadapt_permutohedral_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def permutohedral_filter(values: np.ndarray, features: np.ndarray) -> np.ndarray:
    """One-shot convenience wrapper around :class:`PermutohedralLattice`."""
    lat = PermutohedralLattice(features)
    try:
        return lat.filter(values)
    finally:
        lat.close()
