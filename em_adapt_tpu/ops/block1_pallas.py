"""Fused Pallas TPU kernel for VGG block1 (conv1_1 -> relu -> conv1_2 ->
relu -> pool1), forward AND custom backward.

Why this kernel exists (PROFILE.md round 2, tools/bench_block1*.py):
block1 is the one conv laggard of the model — 13.5 ms of the 59 ms train
step at batch 6 (8.6 TFLOP/s vs 50-340 for blocks 2+). The XLA lowering
is structurally handicapped at this shape: conv1_2 is a 64->64 conv at
321^2 (half-empty 128-lane MXU contraction AND output, ~17-19 TFLOP/s
fwd+bwd), conv1_1's 3-channel input wastes 125/128 lanes, and pool1's
backward is a SelectAndScatter over the 79 MB activation. Every
jnp-level reformulation measured WORSE (tools/bench_pool_conv_xla.py:
the extra HBM round trips cost more than the matmul efficiency gained).
The only way to win is to keep the whole chain VMEM-resident — a fused
Pallas kernel.

Reference semantics being fused (reference deeplab.py:51-84): two 3x3
SAME stride-1 convs with bias+ReLU, then a 3x3 stride-2 ceil-SAME max
pool — 321 -> 161.

Design
------
* **Flat layout with zero pad columns.** Each (H, W, C) activation strip
  lives in VMEM as ``[rows * WPAD, C]`` with columns W..WPAD-1 zeroed
  (WPAD = next multiple of 16 > W+1). A 3x3 tap (u, v) is then ONE
  contiguous slice at flat offset ``(u+1)*WPAD + (v-1)``: the cross-row
  wrap reads land in the zeroed pad columns, which is exactly SAME
  conv's zero padding. Convs become 1 (conv1, K=9*cin im2col) + 9
  (conv2, K=64 per tap) MXU matmuls with zero gather/scatter.
* **Grid over (batch, strips of PT pooled rows).** Each program
  recomputes a small halo (y1: 2PT+5 rows, y2: 2PT+3 rows) so strips
  are independent; nothing but the input strip and the pooled output
  ever touches HBM in the forward.
* **Backward recomputes in VMEM.** Residuals are just the (tiny) input
  patches + params; y1/y2/pool are recomputed per strip, the pool
  gradient is routed by EQUALITY against the recomputed window max
  (scatter-free: x2-nearest-upsample of (pooled, dy) + 9 shifted
  compares), and dW/db accumulate across all grid steps into VMEM-
  resident output blocks. Ownership masks (each global y2 row owned by
  exactly one strip) keep overlapping halos from double-counting.
* dx is NOT computed (returned as zeros): block1 is the first layer, so
  the train step never needs a gradient w.r.t. the image.

Semantics deltas vs the XLA path (both flagged in ModelConfig docs):
* bias is added in f32 before the bf16 rounding (XLA rounds the conv
  output to bf16, then adds a bf16 bias) — differences are at bf16 ulp.
* pool-gradient TIES: none anymore — the backward routes each window's
  gradient to the FIRST (row-major) position equal to the window max
  (_pool_first_match), exactly XLA SelectAndScatter's tie-break, so
  tied-window gradients match the conv path bit-for-bit even in the
  flat/saturated regions where exact ties are the norm. (Round 2
  routed to EVERY tied position, inflating flat-region gradients up
  to 9x — advisor finding, and measurably worse EM dynamics on the
  piecewise-constant rehearsal task.)

The kernel auto-interprets off-TPU (same contract as estep_pallas.py),
so CPU tests exercise the identical program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: Scoped-VMEM ceiling requested from Mosaic. The default flag value is
#: 16 MiB; the unrolled backward's conservative stack allocation needs
#: more headroom than its true live set (v5e VMEM is large enough).
_VMEM_LIMIT = 100 * 1024 * 1024


def _wpad(w: int) -> int:
    """Columns padded to a multiple of 16 with at least one zero column
    (the zero column is what makes the flat-slice trick implement SAME
    padding) and room for the pool's 2q+1 column reads (W+2 <= WPAD)."""
    return (w + 2 + 15) // 16 * 16


def pick_pt(oh: int) -> int:
    """Strip size in pooled rows: the LARGEST divisor of OH <= 24 (fewer,
    bigger programs amortize per-strip overhead; VMEM at PT=23 fits under
    the raised scoped limit). OH=161 (production 321^2) -> 23; OH=21
    (the 41^2 test shape) -> 21; worst case PT=1 (always divides)."""
    for pt in range(min(oh, 24), 0, -1):
        if oh % pt == 0:
            return pt
    raise AssertionError("unreachable: 1 divides everything")


# ---------------------------------------------------------------------------
# geometry helpers (shared by fwd/bwd)
#
# Per strip s (PT pooled rows, unified fwd/bwd geometry):
#   pooled rows computed : P    = PT*s - 1 + Ploc,  Ploc in [0, PT+1)
#                          (fwd writes Ploc in [1, PT+1))
#   y2 rows              : r2   = 2*PT*s - 3 + t2,  t2 in [0, R2=2PT+3)
#   y1 rows              : g1   = 2*PT*s - 4 + t1,  t1 in [0, R1=2PT+5)
#   y2-row ownership     : t2 in [2, 2PT+2)  (partitions rows exactly)
# ---------------------------------------------------------------------------


def _dot_precision(dtype):
    """f32 compute must force HIGHEST like ops/conv.py does (TPU f32
    matmuls default to bf16 multi-pass); bf16 keeps the fast default."""
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _acc_dtype(dtype):
    """Inter-op working dtype: f32 for f32 compute, bf16 for bf16.

    Every dot still emits f32 (Mosaic requires 32-bit matmul
    accumulators) but is rounded to bf16 immediately, so the big strip
    intermediates take half the VMEM (VMEM is what bounds this kernel).
    For bf16 this rounds between the 9 conv2 taps — a bf16-ulp delta vs
    XLA's single-conv accumulation — and matches XLA's conv-then-bias
    rounding order."""
    return jnp.float32 if dtype == jnp.float32 else dtype


def _mask_rows_cols(x, *, base, rows, H, W, WPAD, dtype):
    """Multiply [rows*WPAD, F] by 0/1 validity along rows and cols using
    tiny per-axis masks (a flat [M, 1] mask would be lane-padded to 128
    and cost megabytes of VMEM). ``base`` = global row of local row 0
    (a traced value including the strip offset)."""
    f = x.shape[1]
    x3 = x.reshape(rows, WPAD, f)
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    g = base + ri
    rowm = ((g >= 0) & (g < H)).astype(dtype)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, WPAD, 1), 1)
    colm = (ci < W).astype(dtype)
    return (x3 * rowm * colm).reshape(rows * WPAD, f)


def _conv1(patches_ref, w1_ref, b1_ref, *, s, PT, H, W, WPAD, dtype):
    """y1p: [(R1+2)*WPAD, F] with one zero pad row front and back."""
    R1 = 2 * PT + 5
    y1 = jax.lax.dot_general(
        patches_ref[0, 0], w1_ref[:],
        (((1,), (0,)), ((), ())),
        precision=_dot_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    y1 = jnp.maximum(y1 + b1_ref[0, :], 0)
    y1 = _mask_rows_cols(y1, base=2 * PT * s - 4, rows=R1,
                         H=H, W=W, WPAD=WPAD, dtype=jnp.float32).astype(dtype)
    f = y1.shape[1]
    zrow = jnp.zeros((WPAD, f), dtype)
    return jnp.concatenate([zrow, y1, zrow], axis=0)


def _conv2(y1p, w2_ref, b2_ref, p2_ref, *, s, PT, H, W, WPAD, dtype):
    """y2r: relu'd, validity-masked conv2 output, [M2, F].

    Built as ONE K=9F im2col matmul: the 9 tap slices of y1p are staged
    into the p2 scratch ref (whose rows are tap-major, matching the
    [9F, F] weight layout), then a single fully-contracted MXU dot —
    measured ~2x the throughput of a 9-dot K=F accumulator chain."""
    R2 = 2 * PT + 3
    M2 = R2 * WPAD
    f = y1p.shape[1]
    for u in range(3):
        for v in range(3):
            off = (u + 1) * WPAD + (v - 1)
            t_ = (3 * u + v) * f
            p2_ref[0:M2, t_:t_ + f] = jax.lax.slice_in_dim(
                y1p, off, off + M2, axis=0)
    acc = jnp.dot(p2_ref[0:M2, :], w2_ref[:],
                  precision=_dot_precision(dtype),
                  preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[0, :], 0)
    y2 = _mask_rows_cols(y2, base=2 * PT * s - 3, rows=R2,
                         H=H, W=W, WPAD=WPAD, dtype=jnp.float32)
    return y2.astype(dtype)


def _pool_first_match(y2r, pooled, *, PT, WPAD, OW):
    """Row-major window-internal index (0..8) of each window's FIRST
    position equal to the window max, [PT+1, OW, F] f32.

    The pool backward routes the incoming gradient by EQUALITY against
    the recomputed window max; without a tie-break, a window whose max
    appears at k positions would send the FULL gradient to all k
    (inflating it up to 9x in flat image regions — common for
    saturated/uniform inputs, where exact ties are the norm). Routing to
    the FIRST match in row-major window order reproduces XLA's
    SelectAndScatter tie-break exactly (lax.ge select scans the window
    in iteration order), so tied-window gradients match the reference
    conv path bit-for-bit (tests/test_block1_pallas.py::
    test_pool_tie_gradient_first_match).

    Geometry mirrors :func:`_pool` exactly — window (Ploc, Q) covers y2
    local rows 2Ploc..2Ploc+2 (row terms ev/od/ev') and cols
    2Q-1..2Q+1 (flat col shifts); each of the 9 (row u, col v) slabs is
    column-subsampled with the same exact selection matmul and compared
    to the pooled max in f32 (no bf16 cmpf on TPU; the selection passes
    bf16 values through exactly). All-zero windows match their padding
    zeros, but those positions die at the ReLU mask downstream.
    """
    R2 = 2 * PT + 3
    f = y2r.shape[1]
    n = R2 * WPAD
    z1 = jnp.zeros((1, f), y2r.dtype)
    y2p = jnp.concatenate([z1, y2r, z1], axis=0)
    col_shifts = (
        jax.lax.slice_in_dim(y2p, 0, n, axis=0),   # col 2Q-1 (v=0)
        y2r,                                        # col 2Q   (v=1)
        jax.lax.slice_in_dim(y2p, 2, n + 2, axis=0),  # col 2Q+1 (v=2)
    )
    qi = jax.lax.broadcasted_iota(jnp.int32, (OW, WPAD), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (OW, WPAD), 1)
    sel = (ji == 2 * qi).astype(y2r.dtype)
    pooled32 = pooled.astype(jnp.float32)

    def row_terms(slab):
        m3 = slab.reshape(R2, WPAD, f)
        m3p = jnp.concatenate([m3, jnp.zeros((1, WPAD, f), m3.dtype)], axis=0)
        v = m3p.reshape(PT + 2, 2, WPAD, f)
        ev, od = v[:, 0], v[:, 1]
        return (ev[:PT + 1], od[:PT + 1], ev[1:PT + 2])  # rows 2P, +1, +2

    terms = [row_terms(cs) for cs in col_shifts]
    first = jnp.full((PT + 1, OW, f), jnp.float32(9.0))  # sentinel
    for u in range(3):  # window-internal row, row-major order
        for v in range(3):  # window-internal col
            rows = terms[v][u]
            ds = jnp.stack(
                [
                    jnp.dot(sel, rows[r], preferred_element_type=jnp.float32)
                    for r in range(PT + 1)
                ],
                axis=0,
            )  # [PT+1, OW, f] f32, exact selection
            o = jnp.float32(3 * u + v)
            first = jnp.where((ds == pooled32) & (first == 9.0), o, first)
    return first


def _pool(y2r, *, PT, WPAD, OW):
    """[PT+1, OW, F] pooled rows (local Ploc in [0, PT+1))."""
    R2 = 2 * PT + 3
    f = y2r.shape[1]
    # column max at full resolution via flat +-1 shifts (wrap reads hit
    # the zero pad columns; post-relu values >= 0 so max-with-0 is safe)
    zrow1 = jnp.zeros((1, f), y2r.dtype)
    y2p = jnp.concatenate([zrow1, y2r, zrow1], axis=0)
    n = R2 * WPAD
    mcol = jnp.maximum(
        jnp.maximum(jax.lax.slice_in_dim(y2p, 0, n, axis=0), y2r),
        jax.lax.slice_in_dim(y2p, 2, n + 2, axis=0),
    )
    m3 = mcol.reshape(R2, WPAD, f)
    # row max: pooled Ploc covers y2 local rows 2Ploc..2Ploc+2. Mosaic
    # has no >2D strided-slice lowering, so split row pairs by reshape
    # instead: v[:, 0] = even rows, v[:, 1] = odd rows.
    m3p = jnp.concatenate([m3, jnp.zeros((1, WPAD, f), m3.dtype)], axis=0)
    v = m3p.reshape(PT + 2, 2, WPAD, f)
    ev, od = v[:, 0], v[:, 1]
    mrow = jnp.maximum(jnp.maximum(ev[:PT + 1], od[:PT + 1]), ev[1:PT + 2])
    # even-column subsample as a selection matmul (E[q, j] = [j == 2q]):
    # exact (one nonzero per row) and a plain 2D dot Mosaic lowers.
    qi = jax.lax.broadcasted_iota(jnp.int32, (OW, WPAD), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (OW, WPAD), 1)
    sel = (ji == 2 * qi).astype(mrow.dtype)
    rows = [
        jnp.dot(sel, mrow[r], preferred_element_type=jnp.float32)
        .astype(mrow.dtype)
        for r in range(PT + 1)
    ]
    return jnp.stack(rows, axis=0)


def _pool_route_bwd(y2r, pooled, dy, *, PT, WPAD, OW, dtype):
    """Pool backward: route dy [PT+1, OW, F] (pooled grid, row Ploc=0 =
    previous strip's last row) onto the y2 grid by first-match equality,
    apply the relu mask and row ownership, and return dz2 [M2, F] in the
    accumulation dtype. Shared by the production backward kernel and the
    cost-decomposition probe (tools/bench_block1_bwd_parts.py) so probe
    timings can never drift from the shipped formulation."""
    R2 = 2 * PT + 3
    M2 = R2 * WPAD
    f = y2r.shape[1]
    adt = _acc_dtype(dtype)
    first = _pool_first_match(y2r, pooled, PT=PT, WPAD=WPAD, OW=OW)

    # x2 nearest upsample of (pooled, dy, first) onto the y2 grid, then 9
    # shifted compares. y2 local row t2 is covered by pooled local row
    # Ploc = (t2 - or - 1)/2 when that is an integer (parity mask), and
    # y2 col j by pooled col Q = (j - oc)/2.
    # column x2-upsample + padding as ONE selection matmul per row:
    # up[j, q] = [q == (j - 1) // 2] for j in [1, 2*OW+1) places pooled
    # col q at padded cols 2q+1 and 2q+2 (i.e. 1 zero pad col in front),
    # every other padded col stays zero.
    jj = jax.lax.broadcasted_iota(jnp.int32, (WPAD + 2, OW), 0)
    qq = jax.lax.broadcasted_iota(jnp.int32, (WPAD + 2, OW), 1)
    up = ((jj >= 1) & (jj < 2 * OW + 1) & (qq == (jj - 1) // 2))

    def rep2(t):  # [PT+1, OW, f] -> padded [2PT+5, WPAD+2, f]
        # rows x2 by pair-stack + leading-dim reshape (untiled dims only)
        upm = up.astype(t.dtype)
        t = jnp.stack([t, t], axis=1).reshape(2 * (PT + 1), OW, f)
        rows = [
            jnp.dot(upm, t[r], preferred_element_type=jnp.float32)
            .astype(t.dtype)
            for r in range(2 * (PT + 1))
        ]
        t = jnp.stack(rows, axis=0)  # [2PT+2, WPAD+2, f]
        zr = jnp.zeros((2, WPAD + 2, f), t.dtype)
        zr1 = jnp.zeros((1, WPAD + 2, f), t.dtype)
        return jnp.concatenate([zr, t, zr1], axis=0)  # rows: 2 front, 1 back

    ry, rdy = rep2(pooled), rep2(dy)
    rfi = rep2(first.astype(dy.dtype))
    y23 = y2r.reshape(R2, WPAD, f)
    t2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1, 1), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (1, WPAD, 1), 1)
    # All big backward intermediates live in the compute dtype (adt):
    # bf16 on TPU halves their VMEM (the kernel would not fit otherwise)
    # at bf16-ulp gradient noise; the f32 path (CPU parity tests) stays
    # exact end to end.
    dy2 = jnp.zeros((R2, WPAD, f), adt)
    for orr in (-1, 0, 1):
        for occ in (-1, 0, 1):
            par = ((t2i - orr - 1) % 2 == 0) & ((ji - occ) % 2 == 0)
            ys = jax.lax.slice(ry, (1 - orr, 1 - occ, 0),
                               (1 - orr + R2, 1 - occ + WPAD, f))
            ds_ = jax.lax.slice(rdy, (1 - orr, 1 - occ, 0),
                                (1 - orr + R2, 1 - occ + WPAD, f))
            fi_ = jax.lax.slice(rfi, (1 - orr, 1 - occ, 0),
                                (1 - orr + R2, 1 - occ + WPAD, f))
            # position p is window-internal (orr+1, occ+1) of this window
            o_idx = jnp.float32(3 * (orr + 1) + (occ + 1))
            # bf16 cmpf is unsupported on this target; f32 cast is exact
            hit = (
                (y23.astype(jnp.float32) == ys.astype(jnp.float32))
                & par
                & (fi_.astype(jnp.float32) == o_idx)
            )
            dy2 = dy2 + jnp.where(hit, ds_, jnp.zeros((), adt))

    # relu mask + ownership (each global y2 row owned by ONE strip)
    owned = (t2i >= 2) & (t2i < 2 * PT + 2)
    dz2 = jnp.where((y23.astype(jnp.float32) > 0) & owned, dy2,
                    jnp.zeros((), adt))
    return dz2.reshape(M2, f)


def _fwd_kernel(patches_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                p2_ref, *, PT, H, W, WPAD, OW, dtype):
    s = pl.program_id(1)
    y1p = _conv1(patches_ref, w1_ref, b1_ref, s=s, PT=PT, H=H, W=W,
                 WPAD=WPAD, dtype=dtype)
    y2r = _conv2(y1p, w2_ref, b2_ref, p2_ref, s=s, PT=PT, H=H, W=W,
                 WPAD=WPAD, dtype=dtype)
    pooled = _pool(y2r, PT=PT, WPAD=WPAD, OW=OW)
    out_ref[0] = pooled[1:PT + 1]


def _bwd_kernel(patches_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w2t_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, im2col_ref,
                *, PT, H, W, WPAD, OW, dtype):
    # ONE im2col scratch serves both phases: rows [0:M2) hold p2 (the
    # y1p im2col) through the recompute + dw2 dot, then the pz stores
    # (dz2 im2col, [0:M1+2*WPAD)) overwrite it.
    p2_ref = pz_ref = im2col_ref
    s = pl.program_id(1)
    b_idx = pl.program_id(0)
    R1, R2 = 2 * PT + 5, 2 * PT + 3
    M1, M2 = R1 * WPAD, R2 * WPAD

    @pl.when((b_idx == 0) & (s == 0))
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # ---- recompute forward (VMEM-resident) -----------------------------
    y1p = _conv1(patches_ref, w1_ref, b1_ref, s=s, PT=PT, H=H, W=W,
                 WPAD=WPAD, dtype=dtype)
    y2r = _conv2(y1p, w2_ref, b2_ref, p2_ref, s=s, PT=PT, H=H, W=W,
                 WPAD=WPAD, dtype=dtype)
    pooled = _pool(y2r, PT=PT, WPAD=WPAD, OW=OW)  # [PT+1, OW, f]
    dy = dy_ref[0, 0]  # [PT+1, OW, f] (row Ploc=0 is the previous
    #                     strip's last pooled row; zero-padded at s=0)
    # ---- pool backward: first-match equality routing, scatter-free -----
    dz2f = _pool_route_bwd(y2r, pooled, dy, PT=PT, WPAD=WPAD, OW=OW,
                           dtype=dtype)
    f = dz2f.shape[1]

    # ---- conv2 grads ----------------------------------------------------
    db2_ref[:] += jnp.sum(dz2f.astype(jnp.float32), axis=0, keepdims=True)
    # p2 still holds the tap-major im2col of y1p from the recompute
    dw2_ref[:] += jax.lax.dot_general(
        p2_ref[0:M2, :], dz2f, (((0,), (0,)), ((), ())),
        precision=_dot_precision(dtype),
        preferred_element_type=jnp.float32)
    # dy1 = conv_transpose(dz2, w2) as ONE K=9F dot on an im2col of dz2
    # with mirrored tap offsets (dy1p[k] = sum_uv dz2[k - off_uv] @ W2uv^T)
    sh = 3 * WPAD + 1
    nz = M1 + 2 * WPAD
    zpad = jnp.zeros((sh, f), dz2f.dtype)
    dz2pad = jnp.concatenate([zpad, dz2f, zpad], axis=0)
    for u in range(3):
        for v in range(3):
            st = sh - ((u + 1) * WPAD + (v - 1))
            t_ = (3 * u + v) * f
            # store through the scratch ref: a lane-concat of slices with
            # unaligned sublane offsets has no Mosaic lowering
            pz_ref[:, t_:t_ + f] = jax.lax.slice_in_dim(
                dz2pad, st, st + nz, axis=0)
    dy1p = jnp.dot(pz_ref[:], w2t_ref[:],
                   precision=_dot_precision(dtype),
                   preferred_element_type=jnp.float32)

    # ---- conv1 grads ----------------------------------------------------
    y1r = jax.lax.slice_in_dim(y1p, WPAD, WPAD + M1, axis=0)
    dz1 = jnp.where(y1r.astype(jnp.float32) > 0,
                    jax.lax.slice_in_dim(dy1p, WPAD, WPAD + M1, axis=0),
                    jnp.zeros((), jnp.float32))
    db1_ref[:] += jnp.sum(dz1.astype(jnp.float32), axis=0, keepdims=True)
    dz1c = dz1.astype(dtype)
    dw1_ref[:] += jax.lax.dot_general(
        patches_ref[0, 0], dz1c, (((0,), (0,)), ((), ())),
        precision=_dot_precision(dtype),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# host-side prep + pallas_call plumbing
# ---------------------------------------------------------------------------


def _prep_patches(x: jax.Array, PT: int, NS: int, WPAD: int) -> jax.Array:
    """im2col strips [B, NS, M1, 9*cin] for conv1 (built by XLA, cheap:
    x is the tiny 3-channel input). Tap (u, v) of y1 flat position m in
    strip s reads padded-x flat position 2*PT*s*WPAD + m + (u+1)*WPAD +
    (v-1); pad_top=6/pad_bottom=4 rows make every index in range."""
    b, h, w, c = x.shape
    R1 = 2 * PT + 5
    M1 = R1 * WPAD
    xp = jnp.pad(x, ((0, 0), (6, 4), (0, WPAD - w), (0, 0)))
    flat = xp.reshape(b, (h + 10) * WPAD, c)
    taps = []
    for u in range(3):
        for v in range(3):
            off = (u + 1) * WPAD + (v - 1)
            rows = [
                jax.lax.slice_in_dim(
                    flat, 2 * PT * s * WPAD + off,
                    2 * PT * s * WPAD + off + M1, axis=1)
                for s in range(NS)
            ]
            taps.append(jnp.stack(rows, axis=1))  # [B, NS, M1, c]
    return jnp.concatenate(taps, axis=3)  # [B, NS, M1, 9c]


def _specs(B, NS, M1, c9, f, PT, OW, with_dy):
    in_specs = [
        pl.BlockSpec((1, 1, M1, c9), lambda b, s: (b, s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_dy:
        in_specs.append(
            pl.BlockSpec((1, 1, PT + 1, OW, f), lambda b, s: (b, s, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    for shape in ((c9, f), (1, f), (9 * f, f), (1, f)) + (
            ((9 * f, f),) if with_dy else ()):
        in_specs.append(
            pl.BlockSpec(shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM))
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def block1_fused(x, w1, b1, w2, b2, interpret=None):
    """conv1_1 -> relu -> conv1_2 -> relu -> 3x3/s2 SAME max pool, fused.

    x: [B, H, W, cin] (H = W, odd), w1: [3, 3, cin, F], w2: [3, 3, F, F].
    Returns pooled activations [B, (H+1)//2, (W+1)//2, F] in x.dtype.
    Gradient w.r.t. x is NOT computed (returned as zeros) — this op is
    the model's first layer.
    """
    return _fwd(x, w1, b1, w2, b2, interpret)[0]


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd(x, w1, b1, w2, b2, interpret):
    b, h, w, c1 = x.shape
    f = w1.shape[3]
    if h != w or h % 2 == 0:
        raise ValueError(f"block1_fused needs square odd inputs, got {h}x{w}")
    oh = (h + 1) // 2
    pt = pick_pt(oh)
    ns = oh // pt
    wpad = _wpad(w)
    m1 = (2 * pt + 5) * wpad
    interpret = _resolve_interpret(interpret)

    patches = _prep_patches(x, pt, ns, wpad)
    w1r = w1.reshape(9 * c1, f).astype(x.dtype)
    w2r = w2.reshape(9 * f, f).astype(x.dtype)
    b1r = b1.reshape(1, f).astype(jnp.float32)
    b2r = b2.reshape(1, f).astype(jnp.float32)

    kernel = functools.partial(
        _fwd_kernel, PT=pt, H=h, W=w, WPAD=wpad, OW=oh, dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=_specs(b, ns, m1, 9 * c1, f, pt, oh, with_dy=False),
        out_specs=pl.BlockSpec((1, pt, oh, f), lambda bi, s: (bi, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, oh, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((2 * pt + 3) * wpad, 9 * f), x.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(patches, w1r, b1r, w2r, b2r)
    return out, (patches, w1r, b1r, w2r, b2r, w2)


def _fwd_rule(x, w1, b1, w2, b2, interpret):
    out, res = _fwd(x, w1, b1, w2, b2, interpret)
    return out, res


def _bwd_rule(interpret, res, dy):
    patches, w1r, b1r, w2r, b2r, w2 = res
    b, ns = patches.shape[0], patches.shape[1]
    c1 = patches.shape[3] // 9
    f = w1r.shape[1]
    oh = dy.shape[1]
    pt = oh // ns
    h = w = 2 * oh - 1
    xdtype = patches.dtype
    wpad = _wpad(w)
    m1 = (2 * pt + 5) * wpad
    interpret = _resolve_interpret(interpret)

    # per-strip dy slabs: pooled rows [PT*s - 1, PT*(s+1)) (one pad row
    # on top so strip s=0's "previous" row reads zeros)
    dyp = jnp.pad(dy.astype(xdtype), ((0, 0), (1, 0), (0, 0), (0, 0)))
    dys = jnp.stack(
        [jax.lax.slice_in_dim(dyp, pt * s, pt * s + pt + 1, axis=1)
         for s in range(ns)], axis=1)  # [B, NS, PT+1, OW, f]
    w2t = jnp.transpose(w2, (0, 1, 3, 2)).reshape(9 * f, f).astype(xdtype)

    kernel = functools.partial(
        _bwd_kernel, PT=pt, H=h, W=w, WPAD=wpad, OW=oh, dtype=xdtype)
    zeros2 = lambda r, c: jax.ShapeDtypeStruct((r, c), jnp.float32)
    dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=_specs(b, ns, m1, 9 * c1, f, pt, oh, with_dy=True),
        out_specs=[
            pl.BlockSpec((9 * c1, f), lambda bi, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bi, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * f, f), lambda bi, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bi, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            zeros2(9 * c1, f), zeros2(1, f), zeros2(9 * f, f), zeros2(1, f),
        ],
        scratch_shapes=[
            pltpu.VMEM(((2 * pt + 5) * wpad + 2 * wpad, 9 * f), xdtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(patches, dys, w1r, b1r, w2r, b2r, w2t)

    dx = jnp.zeros((b, h, w, c1), xdtype)
    return (
        dx,
        dw1.reshape(3, 3, c1, f),
        db1.reshape(f),
        dw2.reshape(3, 3, f, f),
        db2.reshape(f),
    )


block1_fused.defvjp(_fwd_rule, _bwd_rule)


def block1_supported(h: int, w: int) -> bool:
    """Whether the fused kernel handles this input size."""
    return h == w and h % 2 == 1


def block1_vmem_ok() -> bool:
    """Whether the local devices' VMEM fits this kernel's working set.

    The kernel requests a 100 MiB scoped-VMEM ceiling (``_VMEM_LIMIT``)
    and its unrolled backward conservatively stacks ~20 MB of strip
    intermediates at 321^2 — far over the 16 MiB VMEM of TPU v2/v3
    cores, where Mosaic compilation would fail outright. v4+ (128 MiB)
    fits. Non-TPU backends interpret the kernel (no VMEM), so they pass.
    """
    if jax.default_backend() != "tpu":
        return True
    kind = jax.devices()[0].device_kind.lower()
    return not ("v2" in kind or "v3" in kind)


def block1_fused_dp(x, w1, b1, w2, b2, mesh, data_axis: str = "data",
                    interpret: bool | None = None):
    """:func:`block1_fused` under ``shard_map`` over the mesh's data axis.

    GSPMD has no partitioning rule for a pallas custom-call, so on a
    multi-chip mesh the bare kernel would all-gather the sharded batch
    and run it redundantly on every chip. This wrapper makes the kernel
    compose with data parallelism: each instance runs its local batch
    shard; weights go in replicated (``P()``), and shard_map's transpose
    rule inserts the psum over ``data_axis`` for their cotangents — the
    same all-reduce the XLA conv path's gradients get. Verified against
    the unsharded kernel's gradients to f32 reduction-order tolerance
    (tests/test_block1_pallas.py).

    Inputs replicate over mesh axes other than ``data_axis``; spatial
    partitioning (a nontrivial ``space`` axis sharding H) must keep the
    XLA conv path instead — the kernel has no halo exchange, so callers
    gate on ``num_space_shards == 1`` (models/deeplab.py).
    ``check_vma=False`` because pallas_call's out_shape carries no
    varying-manual-axes annotation.
    """
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        lambda x_, w1_, b1_, w2_, b2_: block1_fused(
            x_, w1_, b1_, w2_, b2_, interpret),
        mesh=mesh,
        in_specs=(P(data_axis), P(), P(), P(), P()),
        out_specs=P(data_axis),
        check_vma=False,
    )(x, w1, b1, w2, b2)
