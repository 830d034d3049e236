"""Native permutohedral lattice: sanitizer run + edge cases.

Accuracy against the exact brute-force kernel lives in tests/test_crf.py;
this module covers the memory-safety story (ASan/UBSan build — the class
of native-code defect the reference's checked-in binary shipped with) and
binding edge cases.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)

pytestmark = pytest.mark.skipif(
    subprocess.run(["which", "g++"], capture_output=True).returncode != 0,
    reason="no C++ toolchain",
)


def test_filter_constant_field_is_identity():
    """Filtering a constant value field must return that constant (the
    homogeneous normalization cancels the kernel mass exactly)."""
    from em_adapt_tpu.eval.permutohedral import permutohedral_filter

    g = np.random.default_rng(0)
    feats = g.normal(size=(200, 5)).astype(np.float32)
    vals = np.full((200, 3), 7.5, np.float32)
    out = permutohedral_filter(vals, feats)
    np.testing.assert_allclose(out, 7.5, rtol=1e-5)


def test_rejects_mismatched_sizes():
    from em_adapt_tpu.eval.permutohedral import PermutohedralLattice

    lat = PermutohedralLattice(np.zeros((10, 3), np.float32))
    try:
        with pytest.raises(ValueError, match="lattice N"):
            lat.filter(np.zeros((9, 2), np.float32))
    finally:
        lat.close()


def test_init_rejects_bad_dims():
    from em_adapt_tpu.eval.permutohedral import _load

    lib = _load()
    feats = np.zeros((4, 3), np.float32)
    import ctypes

    ptr = feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    assert lib.emadapt_permutohedral_init(ptr, 0, 3) is None  # n<=0
    assert lib.emadapt_permutohedral_init(ptr, 4, 0) is None  # d<=0
    assert lib.emadapt_permutohedral_init(ptr, 4, 99) is None  # d too big


def test_permutohedral_under_asan(tmp_path):
    """Init/filter/free a realistic bilateral lattice under ASan+UBSan in
    a subprocess (the runtime must be preloaded before python starts)."""
    r = subprocess.run(
        ["make", "-C", NATIVE_DIR, "libemadapt_permutohedral_asan.so"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    asan_lib = os.path.join(NATIVE_DIR, "libemadapt_permutohedral_asan.so")

    driver = tmp_path / "asan_driver.py"
    driver.write_text(
        f"""
import ctypes, numpy as np
lib = ctypes.CDLL({asan_lib!r})
lib.emadapt_permutohedral_init.restype = ctypes.c_void_p
lib.emadapt_permutohedral_filter.restype = ctypes.c_int
g = np.random.default_rng(0)
n, d, c = 32 * 32, 5, 4
feats = g.normal(size=(n, d)).astype(np.float32)
vals = np.concatenate([g.uniform(size=(n, c - 1)).astype(np.float32),
                       np.ones((n, 1), np.float32)], axis=1)
out = np.empty_like(vals)
h = lib.emadapt_permutohedral_init(
    feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d)
assert h
for _ in range(3):  # reuse like mean-field does
    rc = lib.emadapt_permutohedral_filter(
        ctypes.c_void_p(h),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c)
    assert rc == 0, rc
lib.emadapt_permutohedral_free(ctypes.c_void_p(h))
assert np.isfinite(out).all()
print("ASAN_OK")
"""
    )
    find = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"], capture_output=True, text=True
    )
    env = dict(os.environ, LD_PRELOAD=find.stdout.strip(),
               ASAN_OPTIONS="detect_leaks=0")
    r = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True, env=env
    )
    assert "ASAN_OK" in r.stdout, r.stdout + r.stderr


def test_tiny_lattice_reallocation_regression(tmp_path):
    """n=1, d=1 leaves keys.capacity() == keys.size() entering the
    neighbor-table build, where a raw pointer into the vector used to be
    read AFTER a reallocating resize (use-after-free; review finding).
    Run under ASan so the regression would be caught as a hard error,
    and check the filter output is still the exact constant-field
    identity."""
    r = subprocess.run(
        ["make", "-C", NATIVE_DIR, "libemadapt_permutohedral_asan.so"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    asan_lib = os.path.join(NATIVE_DIR, "libemadapt_permutohedral_asan.so")
    driver = tmp_path / "tiny_driver.py"
    driver.write_text(
        f"""
import ctypes, numpy as np
lib = ctypes.CDLL({asan_lib!r})
lib.emadapt_permutohedral_init.restype = ctypes.c_void_p
lib.emadapt_permutohedral_filter.restype = ctypes.c_int
for n, d in [(1, 1), (1, 3), (2, 1), (3, 2)]:
    feats = np.linspace(-1, 1, n * d).astype(np.float32).reshape(n, d)
    vals = np.concatenate([np.full((n, 1), 0.625, np.float32),
                           np.ones((n, 1), np.float32)], axis=1)
    out = np.empty_like(vals)
    h = lib.emadapt_permutohedral_init(
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d)
    assert h, (n, d)
    rc = lib.emadapt_permutohedral_filter(
        ctypes.c_void_p(h),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, 2)
    assert rc == 0, rc
    ratio = out[:, 0] / out[:, 1]
    assert np.allclose(ratio, 0.625, atol=1e-5), (n, d, ratio)
    lib.emadapt_permutohedral_free(ctypes.c_void_p(h))
print("TINY_OK")
"""
    )
    find = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"], capture_output=True, text=True
    )
    env = dict(os.environ, LD_PRELOAD=find.stdout.strip(),
               ASAN_OPTIONS="detect_leaks=0")
    r = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True, env=env
    )
    assert "TINY_OK" in r.stdout, r.stdout + r.stderr
