"""ctypes binding for the native C++ E-step (native/estep.cpp).

Host-CPU path: used by CPU data/eval pipelines and as an independent
cross-check of the device kernels. The reference binds its native kernel
the same way (ctypes over a shared library, reference estep.py:9-15,
:29-31) but marshals raw shape/stride pointers; here the ABI is explicit
sizes + an error code, and the library is built from source on demand
(the reference checked in an x86-64 binary).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_NAME = "libemadapt_estep.so"
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    # Always invoke make: the Makefile's dependency tracking makes this a
    # ~50 ms no-op when the .so is fresh, and an EDITED estep.cpp would
    # otherwise be silently served by the stale binary — breaking the
    # pixel-identical cross-check this binding exists for. A host with a
    # prebuilt .so but no toolchain still works (warn, use as-is).
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, _LIB_NAME],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        if not os.path.exists(path):
            raise
        import warnings

        warnings.warn(
            f"make failed in {_NATIVE_DIR}; using the existing {_LIB_NAME} "
            "(may be stale if native sources changed)"
        )
    return path


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.emadapt_estep.restype = ctypes.c_int
            lib.emadapt_estep.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # scores
                ctypes.POINTER(ctypes.c_float),  # out
                ctypes.POINTER(ctypes.c_int32),  # labels
                ctypes.c_int32,  # B
                ctypes.c_int32,  # H
                ctypes.c_int32,  # W
                ctypes.c_int32,  # C
                ctypes.POINTER(ctypes.c_int32),  # orders
                ctypes.c_int32,  # num_iter
                ctypes.c_int32,  # suppress
                ctypes.c_float,  # margin
                ctypes.c_double,  # bg_p (double: k = int(HW*p) must
                ctypes.c_double,  # fg_p  truncate exactly like the oracle)
            ]
            _lib = lib
    return _lib


def estep_native(
    scores: np.ndarray,
    label: np.ndarray,
    orders: np.ndarray,
    *,
    bg_p: float = 0.4,
    fg_p: float = 0.2,
    num_iter: int = 5,
    suppress_others: bool = True,
    margin_others: float = 1e-5,
) -> np.ndarray:
    """Native E-step; same signature family as the oracle. Out-of-place."""
    lib = _load()
    scores = np.ascontiguousarray(scores, np.float32)
    b, h, w, c = scores.shape
    labels = np.ascontiguousarray(label, np.int32).reshape(b, h, w)
    orders = np.ascontiguousarray(orders, np.int32)
    if orders.shape != (num_iter, c - 1):
        raise ValueError(
            f"orders must have shape (num_iter={num_iter}, C-1={c - 1}), got {orders.shape}"
        )
    out = np.empty_like(scores)
    rc = lib.emadapt_estep(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, h, w, c,
        orders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_iter,
        1 if suppress_others else 0,
        margin_others,
        bg_p,
        fg_p,
    )
    if rc != 0:
        reasons = {
            1: "null pointer",
            2: "invalid sizes",
            3: "invalid class orders",
            4: "percentile out of range",
            5: "allocation failure",
        }
        raise RuntimeError(
            f"emadapt_estep failed with code {rc}"
            f" ({reasons.get(rc, 'unknown')})"
        )
    return out
