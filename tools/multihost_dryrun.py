"""2-process multi-host (DCN) dryrun on CPU.

Launches N worker processes, each with its own JAX multi-controller
runtime (``jax.distributed.initialize`` against a localhost coordinator)
and 4 virtual CPU devices, and drives the REAL ``em-adapt train
--multihost`` CLI path end-to-end: per-process data sharding
(``batch_iterator(process_shard=...)``), global-array assembly
(``MeshPlan.shard_batch`` via ``jax.make_array_from_process_local_data``),
the jitted global-mesh train step (XLA inserts the cross-process gradient
psum), and the final orbax checkpoint.

This is the CPU rehearsal of the SURVEY.md §5 comm-backend equivalent:
one global mesh over multiple hosts, collectives over ICI within a host
and DCN across hosts. Usage:

    python tools/multihost_dryrun.py [--steps 2] [--processes 2]

Prints the process-0 metrics JSONL path; exits nonzero if any worker
fails.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(
    num_processes: int = 2,
    steps: int = 2,
    devices_per_process: int = 4,
    workdir: str | None = None,
    timeout: float = 1800.0,
) -> str:
    """Run the dryrun; returns the path of process 0's metrics JSONL.

    ``num_processes=1`` runs the same config single-controller with
    ``num_processes*devices_per_process`` virtual devices — the parity
    reference: with identical seeds the global batch and every RNG stream
    match, so the multi-process losses must equal the single-process ones.
    """
    workdir = workdir or tempfile.mkdtemp(prefix="emadapt_multihost_")
    os.makedirs(workdir, exist_ok=True)
    port = _free_port()
    log_path = os.path.join(workdir, "proc0_metrics.jsonl")
    total_devices = num_processes * devices_per_process
    overrides = [
        "model.num_classes=4",
        "model.input_size=(33,33)",
        "model.fc6_channels=8",
        "estep.num_iter=2",
        "optim.accum_steps=1",
        "train.batch_size=8",
        "train.log_every_steps=1",
        f"checkpoint.save_dir={os.path.join(workdir, 'saver')}",
        "checkpoint.save_every_steps=1000000",
        "checkpoint.async_save=False",
        "data.num_workers=2",
        "data.prefetch=1",
    ]
    procs = []
    for pid in range(num_processes):
        env = os.environ.copy()
        env["JAX_PLATFORMS"] = "cpu"
        local_devices = (
            devices_per_process if num_processes > 1 else total_devices
        )
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={local_devices}"
        )
        cmd = [
            sys.executable, os.path.join(REPO, "tools", "_multihost_worker.py"),
            "train",
            "--synthetic", "16",
            "--steps", str(steps),
        ]
        if num_processes > 1:
            cmd += [
                "--multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(pid),
            ]
        if pid == 0:
            cmd += ["--log-jsonl", log_path]
        cmd += overrides
        out = open(os.path.join(workdir, f"proc{pid}.log"), "w")
        procs.append(
            subprocess.Popen(cmd, env=env, cwd=REPO, stdout=out, stderr=out)
        )
    failed = []
    for pid, p in enumerate(procs):
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc = -9
        if rc != 0:
            failed.append(pid)
    if failed:
        for pid in failed:
            with open(os.path.join(workdir, f"proc{pid}.log")) as f:
                sys.stderr.write(
                    f"--- proc{pid} log tail ---\n" + "".join(f.readlines()[-40:])
                )
        raise RuntimeError(f"multihost dryrun: processes {failed} failed")
    return log_path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args(argv)
    log_path = launch(num_processes=args.processes, steps=args.steps)
    print(f"multihost dryrun OK; process-0 metrics at {log_path}")
    with open(log_path) as f:
        sys.stdout.write(f.read())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
