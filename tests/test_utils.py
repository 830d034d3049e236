"""Observability utilities: metric logger, step timer, trace context."""

import io
import json

from em_adapt_tpu.utils.logging import MetricLogger
from em_adapt_tpu.utils.profiling import StepTimer, trace_context


def test_metric_logger_stdout_and_jsonl(tmp_path):
    buf = io.StringIO()
    path = tmp_path / "metrics.jsonl"
    logger = MetricLogger(str(path), stream=buf)
    logger.log({"loss": 1.5, "step": 10}, prefix="train")
    logger.log({"miou": 0.42}, prefix="eval")
    logger.close()

    out = buf.getvalue()
    assert "[train]" in out and "loss=1.5" in out and "step=10" in out
    assert "[eval]" in out and "miou=0.42" in out

    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["prefix"] == "train"
    assert lines[1]["miou"] == 0.42
    assert all("t" in l for l in lines)


def test_metric_logger_handles_jax_scalars(tmp_path):
    import jax.numpy as jnp

    buf = io.StringIO()
    logger = MetricLogger(None, stream=buf)
    logger.log({"loss": jnp.float32(2.0)})
    assert "loss=2" in buf.getvalue()


def test_metric_logger_nonfinite_in_nested_dict_stays_valid_json(tmp_path):
    """Review finding: the NaN sanitizer recursed into lists but not
    dicts, so a dict-valued metric holding a non-finite float emitted a
    bare NaN token — invalid JSON, exactly when the JSONL matters."""
    buf = io.StringIO()
    path = tmp_path / "metrics.jsonl"
    logger = MetricLogger(str(path), stream=buf)
    logger.log({"per_class": {"cat": float("nan")},
                "curve": [1.0, float("inf")]})
    logger.close()
    (line,) = path.read_text().splitlines()
    rec = json.loads(line)  # must parse — no bare NaN/Infinity tokens
    assert rec["per_class"]["cat"] == "nan"
    assert rec["curve"][1] == "inf"


def test_metric_logger_numpy_scalars_nested_in_containers(tmp_path):
    """Review finding: scalarize only converted top-level values, so a
    numpy scalar nested inside a dict/list metric crashed json.dumps
    from inside the logger — killing the train loop at the log call."""
    import numpy as np

    buf = io.StringIO()
    path = tmp_path / "metrics.jsonl"
    logger = MetricLogger(str(path), stream=buf)
    logger.log({
        "step": np.int64(500),
        "per_class": {"aeroplane": np.float32(0.31)},
        "curve": [np.float32(1.5), np.int32(2)],
    })
    logger.close()
    (line,) = path.read_text().splitlines()
    rec = json.loads(line)  # must not raise
    assert rec["step"] == 500 and isinstance(rec["step"], int)
    assert abs(rec["per_class"]["aeroplane"] - 0.31) < 1e-6
    assert rec["curve"][1] == 2


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
    # 4 intervals recorded, first excluded -> 3 samples
    assert len(t._times) == 3
    assert t.mean_s >= 0 and t.p50_s >= 0


def test_trace_context_noop():
    with trace_context(None):
        x = 1 + 1
    assert x == 2
