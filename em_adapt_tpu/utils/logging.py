"""Structured metric logging.

The reference logs with bare prints (loss+lr every 500 iters,
reference deeplab.py:273-275; dataset sizes, timing). Here metrics go to
stdout in one aligned line AND to a JSONL file for tooling. The train
loop's records carry the BASELINE.md scalar set: loss, lr,
images/sec/chip, E-step µs/image (measured once at start —
TrainConfig.calibrate_estep — and stamped into every record), and mIoU
as ``val_metric`` records when periodic eval is enabled
(TrainConfig.eval_every_steps).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


class MetricLogger:
    def __init__(self, jsonl_path: str | None = None, stream=None):
        self.stream = stream or sys.stdout
        self._fh = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._fh = open(jsonl_path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, metrics: dict, prefix: str = "train") -> None:
        import numpy as np

        def scalarize(v):
            # Recurse into containers first: a numpy scalar nested inside
            # a dict/list metric (e.g. {"aeroplane": np.float32(...)})
            # must convert too or json.dumps raises from inside the
            # logger — the crash this function exists to prevent.
            if isinstance(v, dict):
                return {k: scalarize(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [scalarize(x) for x in v]
            if isinstance(v, (bool, int, float, str)) or v is None:
                return v
            # Only 0-d values convert: a length-N ndarray/jax.Array also
            # defines __float__ but float(it) raises — e.g. a
            # per_class_iou vector must serialize as a list, not crash
            # the train loop's log call.
            if np.ndim(v) == 0 and hasattr(v, "__float__"):
                # Integral device/numpy scalars (step counters) keep
                # their integer identity in the JSONL.
                if hasattr(v, "dtype") and np.issubdtype(v.dtype, np.integer):
                    return int(v)
                return float(v)
            if hasattr(v, "tolist"):
                return v.tolist()
            return v

        rec = {"t": round(time.time() - self._t0, 3), "prefix": prefix}
        rec.update({k: scalarize(v) for k, v in metrics.items()})
        parts = [f"[{prefix}]"]
        for k, v in rec.items():
            if k in ("prefix",):
                continue
            if isinstance(v, float):
                parts.append(f"{k}={v:.6g}")
            else:
                parts.append(f"{k}={v}")
        print(" ".join(parts), file=self.stream)
        if self._fh:
            # json.dumps would emit bare NaN/Infinity tokens — invalid
            # JSON that jq / strict line parsers reject. A diverged loss
            # is exactly when the JSONL matters, so keep the information
            # as a parseable string ("nan", "inf", "-inf").
            def finite(v):
                if isinstance(v, float) and not math.isfinite(v):
                    return str(v)
                if isinstance(v, list):
                    return [finite(x) for x in v]
                if isinstance(v, dict):
                    return {k: finite(x) for k, x in v.items()}
                return v

            self._fh.write(
                json.dumps({k: finite(v) for k, v in rec.items()}) + "\n"
            )

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __call__(self, metrics: dict) -> None:
        self.log(metrics)
