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
    retries: int = 2,
    overrides_extra: list[str] | None = None,
) -> str:
    """Run the dryrun; returns the path of process 0's metrics JSONL.

    ``num_processes=1`` runs the same config single-controller with
    ``num_processes*devices_per_process`` virtual devices — the parity
    reference: with identical seeds the global batch and every RNG stream
    match, so the multi-process losses must equal the single-process ones.

    ``retries``: Gloo's context-init deadlines (TCP connect timeout, and
    the ~30 s KV-store ``GetKeyValue`` rendezvous deadline) are
    compiled-in constants with no env/flag override in this jaxlib; on a
    1-core host two concurrently-compiling processes can starve them.
    The primary defense is ``Trainer._multihost_warmup`` (AOT compile +
    coordination-service barrier before the first dispatch, so the Gloo
    rendezvous starts with near-zero skew); residual failures (detected
    by the Gloo signature + a timeout word in the proc logs) are retried
    up to this many times — the shared compilation cache makes the
    retry's compile phase near-free. Any other failure raises
    immediately with the proc log tails attached.
    """
    last_err: RuntimeError | None = None
    for attempt in range(retries + 1):
        try:
            return _launch_once(
                num_processes, steps, devices_per_process, workdir, timeout,
                overrides_extra,
            )
        except RuntimeError as e:
            if num_processes <= 1 or not getattr(e, "gloo_timeout", False):
                raise
            last_err = e
            if attempt == retries:
                # Out of retries: keep the workdir so the per-process
                # logs the raised error references still exist on disk.
                break
            if workdir is not None and os.path.isdir(workdir):
                # fresh workdir per attempt: stale orbax step dirs from
                # the failed run must not collide with the retry's saves
                import shutil

                shutil.rmtree(workdir)
            sys.stderr.write(
                f"multihost dryrun: Gloo init timeout (compile-phase "
                f"skew), retry {attempt + 1}/{retries}\n"
            )
    raise last_err


_GLOO_SIGNATURES = ("Gloo", "gloo")


def _launch_once(
    num_processes: int,
    steps: int,
    devices_per_process: int,
    workdir: str | None,
    timeout: float,
    overrides_extra: list[str] | None = None,
) -> str:
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
    ] + list(overrides_extra or [])
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
        gloo_timeout = False
        for pid in failed:
            with open(os.path.join(workdir, f"proc{pid}.log")) as f:
                tail = "".join(f.readlines()[-40:])
            if any(sig in tail for sig in _GLOO_SIGNATURES) and any(
                t in tail
                for t in ("timeout", "Timeout", "timed out", "DEADLINE_EXCEEDED")
            ):
                gloo_timeout = True
            sys.stderr.write(f"--- proc{pid} log tail ---\n" + tail)
        err = RuntimeError(f"multihost dryrun: processes {failed} failed")
        err.gloo_timeout = gloo_timeout
        raise err
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
