"""Native C++ E-step vs oracle and reference golden fixtures.

Also runs an ASan/UBSan build over multi-batch inputs — the class of bug
(per-batch double free) that shipped in the reference's native kernel.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import ESTEP_FIXTURES as FIXTURES
from conftest import load_estep_fixture as load
from em_adapt_tpu.ops.estep_oracle import estep_oracle

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")

pytestmark = pytest.mark.skipif(
    subprocess.run(["which", "g++"], capture_output=True).returncode != 0,
    reason="no C++ toolchain",
)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_native_matches_reference(path):
    from em_adapt_tpu.ops.estep_native import estep_native

    scores, label, orders, expected, kw = load(path)
    got = estep_native(scores, label.astype(np.int32), orders, **kw)
    np.testing.assert_array_equal(got.argmax(3), expected.argmax(3))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=0)


def test_native_matches_oracle_random(rng):
    from em_adapt_tpu.ops.estep_native import estep_native

    for (b, h, w, c) in [(1, 5, 7, 4), (4, 41, 41, 21)]:
        scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
        label = rng.integers(0, c + 2, size=(b, h, w)).astype(np.float32)
        label[label >= c] = 255.0
        orders = np.stack(
            [rng.permutation(np.arange(1, c)) for _ in range(3)]
        ).astype(np.int32)
        want = estep_oracle(scores, label, orders=orders, num_iter=3)
        got = estep_native(scores, label.astype(np.int32), orders, num_iter=3)
        np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_native_all_negative_scores(rng):
    """The reference's native kernel seeded its running max with FLT_MIN
    (smallest positive float) and broke on all-negative maps; ours must not."""
    from em_adapt_tpu.ops.estep_native import estep_native

    scores = (rng.normal(size=(2, 6, 6, 4)) - 10.0).astype(np.float32)
    label = rng.integers(0, 4, size=(2, 6, 6)).astype(np.int32)
    orders = np.stack([rng.permutation(np.arange(1, 4)) for _ in range(2)]).astype(np.int32)
    want = estep_oracle(scores, label, orders=orders, num_iter=2)
    got = estep_native(scores, label, orders, num_iter=2)
    np.testing.assert_array_equal(got.argmax(3), want.argmax(3))


def test_native_rejects_bad_args():
    from em_adapt_tpu.ops.estep_native import estep_native

    scores = np.zeros((1, 4, 4, 3), np.float32)
    label = np.zeros((1, 4, 4), np.int32)
    with pytest.raises(ValueError):
        estep_native(scores, label, np.zeros((2, 9), np.int32), num_iter=2)
    # out-of-range class id in orders -> clean error code, not UB
    bad = np.full((2, 2), 99, np.int32)
    with pytest.raises(RuntimeError):
        estep_native(scores, label, bad, num_iter=2)
    # percentiles that put k out of the buffer -> clean error, not an
    # out-of-bounds diff[k] read (round-3 review finding)
    ok_orders = np.tile(np.arange(1, 3, dtype=np.int32), (2, 1))
    for kw in ({"bg_p": 1.0}, {"fg_p": 1.5}, {"bg_p": -0.1}):
        with pytest.raises(RuntimeError):
            estep_native(scores, label, ok_orders, num_iter=2, **kw)


def test_native_percentile_truncation_matches_oracle(rng):
    """bg_p/fg_p cross the ABI as DOUBLE (round-3 review finding): a
    float32-narrowed p can land HW*p on the other side of an integer
    boundary and shift the selected order statistic by one. p = k/HW is
    exactly representable in double but not in float32 for most k, so
    this case catches a narrowing regression via the pixel-identical
    contract."""
    from em_adapt_tpu.ops.estep_native import estep_native
    from em_adapt_tpu.ops.estep_oracle import estep_oracle

    b, h, w, c = 2, 9, 9, 5
    hw = h * w
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    label = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    orders = np.stack([rng.permutation(np.arange(1, c)) for _ in range(3)])
    # k/HW for k where a float32-narrowed p truncates to k-1 (verified
    # discriminating for hw=81: int(float(float32(k/81))*81) == k-1)
    discriminating = [
        k for k in (11, 13, 15, 17, 19)
        if int(float(np.float32(k / hw)) * hw) != k
    ]
    assert discriminating, "no discriminating k for this hw — fix the test"
    for k in discriminating:
        p = k / hw
        got = estep_native(
            scores, label, orders.astype(np.int32), bg_p=p, fg_p=p,
            num_iter=3,
        )
        want = estep_oracle(
            scores, label.astype(np.float32), orders=orders, bg_p=p,
            fg_p=p, num_iter=3,
        )
        np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_native_under_asan(rng, tmp_path):
    """Run the kernel multi-batch under AddressSanitizer+UBSan in a
    subprocess (ASan must be preloaded before python starts)."""
    r = subprocess.run(["make", "-C", NATIVE_DIR, "asan"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    asan_lib = os.path.join(NATIVE_DIR, "libemadapt_estep_asan.so")

    driver = tmp_path / "asan_driver.py"
    driver.write_text(
        f"""
import ctypes, numpy as np
lib = ctypes.CDLL({asan_lib!r})
lib.emadapt_estep.restype = ctypes.c_int
b, h, w, c = 4, 9, 9, 5
g = np.random.default_rng(0)
scores = g.normal(size=(b,h,w,c)).astype(np.float32)
out = np.empty_like(scores)
labels = g.integers(0, c, size=(b,h,w)).astype(np.int32)
orders = np.stack([g.permutation(np.arange(1,c)) for _ in range(3)]).astype(np.int32)
rc = lib.emadapt_estep(
    scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    b, h, w, c,
    orders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    3, 1, ctypes.c_float(1e-5), ctypes.c_float(0.4), ctypes.c_float(0.2))
assert rc == 0, rc
print("ASAN_OK")
"""
    )
    # find libasan to preload
    find = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"], capture_output=True, text=True
    )
    asan_rt = find.stdout.strip()
    env = dict(os.environ, LD_PRELOAD=asan_rt, ASAN_OPTIONS="detect_leaks=0")
    r = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True, env=env
    )
    assert "ASAN_OK" in r.stdout, r.stdout + r.stderr
