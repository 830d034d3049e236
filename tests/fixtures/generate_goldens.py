"""Generate golden E-step fixtures from the upstream reference implementation.

Run manually (the outputs are committed):

    python tests/fixtures/generate_goldens.py [/path/to/reference]

For each case this records inputs, the reference ``estep_py`` output
(reference estep.py:33-84, the production path), and the foreground class
orders the reference's seeded ``random.shuffle`` produced — so our
implementations can be driven with the identical visit schedule and compared
pixel-exactly. If the reference checkout is unavailable the script exits
nonzero; the committed .npz files are the source of truth for CI.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def reference_orders(seed: int, num_iter: int, num_classes: int) -> np.ndarray:
    """Reproduce the fg-class orders reference estep.py:62-66 draws.

    estep_py's only RNG consumption is one ``random.shuffle`` of
    [1..C-1] per iteration, so re-seeding and replaying the same calls
    yields the schedule it used.
    """
    random.seed(seed)
    orders = []
    for _ in range(num_iter):
        fg = list(range(1, num_classes))
        random.shuffle(fg)
        orders.append(fg)
    return np.asarray(orders, dtype=np.int32)


CASES = [
    # name, B, H, W, C, num_iter, bg_p, fg_p, suppress, margin, seed
    ("tiny", 2, 4, 4, 3, 2, 0.4, 0.2, True, 1e-5, 11),
    ("small", 3, 8, 8, 6, 5, 0.4, 0.2, True, 1e-5, 22),
    ("nosuppress", 2, 8, 8, 5, 3, 0.5, 0.25, False, 1e-5, 33),
    ("prod_shape", 2, 41, 41, 21, 5, 0.4, 0.2, True, 1e-5, 44),
    ("neg_scores", 2, 8, 8, 4, 4, 0.4, 0.2, True, 1e-5, 55),
]


def make_inputs(b, h, w, c, seed):
    g = np.random.default_rng(seed)
    scores = g.normal(size=(b, h, w, c)).astype(np.float32)
    if seed % 2:
        scores -= 3.0  # exercise all-negative score maps
    # Label maps with a few classes present + ignore regions (255).
    label = g.integers(0, c, size=(b, h, w)).astype(np.float32)
    label[:, 0, :] = 255.0  # ignore strip
    # Make one image have a restricted tag set.
    label[0] = np.where(label[0] > 1, 0.0, label[0])
    return scores, label


def main():
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    if not os.path.isdir(ref_root):
        print(f"reference not found at {ref_root}", file=sys.stderr)
        return 1
    # Import the reference estep module. Its module body resolves
    # libweaklabel.so relative to the CWD, so run from the reference root.
    os.chdir(ref_root)
    sys.path.insert(0, ref_root)
    import estep as ref  # noqa: PLC0415

    for name, b, h, w, c, it, bg, fg, sup, margin, seed in CASES:
        scores, label = make_inputs(b, h, w, c, seed)
        orders = reference_orders(seed, it, c)
        random.seed(seed)
        out = ref.estep_py(
            scores.copy(), label.copy(), sup, it, margin, bg, fg
        ).astype(np.float32)
        path = os.path.join(HERE, f"estep_{name}.npz")
        np.savez_compressed(
            path,
            scores=scores,
            label=label,
            orders=orders,
            out=out,
            bg_p=bg,
            fg_p=fg,
            num_iter=it,
            suppress=int(sup),
            margin=margin,
        )
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
