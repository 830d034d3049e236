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
        rec = {"t": round(time.time() - self._t0, 3), "prefix": prefix}
        rec.update(
            {
                k: (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()
            }
        )
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
            self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __call__(self, metrics: dict) -> None:
        self.log(metrics)
