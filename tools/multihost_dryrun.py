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
    extra_flags: list[str] | None = None,
    preempt_after_step: int | None = None,
    log_name: str = "proc0_metrics.jsonl",
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
                overrides_extra, extra_flags, preempt_after_step, log_name,
            )
        except RuntimeError as e:
            if num_processes <= 1 or not getattr(e, "gloo_timeout", False):
                raise
            last_err = e
            if attempt == retries:
                # Out of retries: keep the workdir so the per-process
                # logs the raised error references still exist on disk.
                break
            if (workdir is not None and os.path.isdir(workdir)
                    and "--resume" not in (extra_flags or [])):
                # fresh workdir per attempt: stale orbax step dirs from
                # the failed run must not collide with the retry's saves.
                # A RESUME arm must keep the workdir — it holds the very
                # checkpoints being resumed (Gloo init fails before any
                # new save, so nothing stale can collide).
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
    extra_flags: list[str] | None = None,
    preempt_after_step: int | None = None,
    log_name: str = "proc0_metrics.jsonl",
) -> str:
    """One N-process run. With ``preempt_after_step``, SIGTERM EVERY
    process once process 0's JSONL logs a step >= that value — the
    multi-host preemption scenario the uniform-shutdown flag exists for
    (utils/failure.py::requested_uniform: the save is a COLLECTIVE orbax
    save, so the stop decision must be process-uniform or the job
    deadlocks while being preempted). The SIGTERM'd run must still exit
    rc=0 on every process (clean collective save)."""
    workdir = workdir or tempfile.mkdtemp(prefix="emadapt_multihost_")
    os.makedirs(workdir, exist_ok=True)
    port = _free_port()
    log_path = os.path.join(workdir, log_name)
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
        cmd += list(extra_flags or [])
        cmd += overrides
        out = open(os.path.join(workdir, f"proc{pid}.log"), "w")
        procs.append(
            subprocess.Popen(cmd, env=env, cwd=REPO, stdout=out, stderr=out)
        )
    if preempt_after_step is not None:
        import json
        import signal
        import time

        t0 = time.time()
        sent = False
        while not sent:
            if all(p.poll() is not None for p in procs):
                raise RuntimeError(
                    "preempt arm finished before the SIGTERM trigger step "
                    f"{preempt_after_step} was logged — raise --steps"
                )
            if time.time() - t0 > timeout:
                for p in procs:
                    p.kill()
                raise RuntimeError("preempt arm timed out pre-SIGTERM")
            logged = []
            try:
                with open(log_path) as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            rec = json.loads(line)
                            if "step" in rec:
                                logged.append(rec["step"])
            except (OSError, json.JSONDecodeError):
                pass  # not created yet / record mid-write: retry
            if logged and max(logged) >= preempt_after_step:
                for p in procs:
                    if p.poll() is None:
                        p.send_signal(signal.SIGTERM)
                sent = True
            else:
                time.sleep(0.2)
    # Joint wait with dead-peer detection: when one process dies (e.g.
    # Gloo's compiled-in 30 s rendezvous deadline starving on this 1-core
    # host), its peers are left waiting in a collective that can never
    # complete — a sequential p.wait() would then burn the FULL timeout
    # before the Gloo-retry classification even runs. Kill the stragglers
    # after a short grace period instead; the originating process's log
    # keeps the Gloo signature the retry logic keys on.
    import time as _time

    deadline = _time.time() + timeout
    rcs: list[int | None] = [None] * len(procs)
    first_fail_t: float | None = None
    while any(r is None for r in rcs):
        for i, p in enumerate(procs):
            if rcs[i] is None:
                rcs[i] = p.poll()
        if any(r not in (None, 0) for r in rcs):
            now = _time.time()
            if first_fail_t is None:
                first_fail_t = now
            elif now - first_fail_t > 90:
                for i, p in enumerate(procs):
                    if rcs[i] is None:
                        p.kill()
        if _time.time() > deadline:
            for i, p in enumerate(procs):
                if rcs[i] is None:
                    p.kill()
        _time.sleep(1.0)
    failed = [i for i, r in enumerate(rcs) if r != 0]
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


def _loss_stream(path: str) -> dict[int, float]:
    import json

    out: dict[int, float] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rec = json.loads(line)
                if "loss" in rec and "step" in rec:
                    out[rec["step"]] = rec["loss"]
    return out


def launch_preempt_resume(
    num_processes: int = 2,
    steps: int = 16,
    preempt_after_step: int = 5,
    devices_per_process: int = 4,
    workdir: str | None = None,
) -> dict:
    """End-to-end multi-host preemption rehearsal (round-4 VERDICT weak
    #3): a CONTROL 2-process DCN run to completion; a PREEMPT arm where
    EVERY process takes a SIGTERM mid-run and must complete the
    COLLECTIVE orbax save without deadlocking (the exact scenario
    ``utils/failure.py::requested_uniform`` exists for — a non-uniform
    stop decision would leave some processes dispatching train steps
    while others wait in the save collective); and a RESUME arm
    (``--resume``) whose loss stream must continue BIT-EXACTLY vs the
    control at every common step. Returns the checks dict (the caller
    commits it as MULTIHOST_PREEMPT.json)."""
    workdir = workdir or tempfile.mkdtemp(prefix="emadapt_mh_preempt_")
    dir_c = os.path.join(workdir, "control")
    dir_p = os.path.join(workdir, "preempt")

    log_c = launch(num_processes=num_processes, steps=steps,
                   devices_per_process=devices_per_process, workdir=dir_c)
    log_p1 = launch(num_processes=num_processes, steps=steps,
                    devices_per_process=devices_per_process, workdir=dir_p,
                    preempt_after_step=preempt_after_step,
                    log_name="proc0_phase1.jsonl")
    norm_dir = os.path.join(dir_p, "saver", "norm")
    norm_steps = sorted(
        int(n) for n in os.listdir(norm_dir) if n.isdigit()
    ) if os.path.isdir(norm_dir) else []
    if not norm_steps:
        raise RuntimeError(
            f"preempt arm saved no norm checkpoint in {norm_dir} — the "
            "collective preemption save did not run"
        )
    resume_step = norm_steps[-1]
    log_p2 = launch(num_processes=num_processes, steps=steps,
                    devices_per_process=devices_per_process, workdir=dir_p,
                    extra_flags=["--resume"], log_name="proc0_phase2.jsonl")

    loss_c = _loss_stream(log_c)
    loss_p = {**_loss_stream(log_p1), **_loss_stream(log_p2)}
    common = sorted(set(loss_c) & set(loss_p))
    mismatches = [
        {"step": s, "control": loss_c[s], "preempt": loss_p[s]}
        for s in common if loss_c[s] != loss_p[s]
    ]
    post_resume = [s for s in common if s > resume_step]
    result = {
        "task": "2-process DCN preempt (uniform SIGTERM) + collective "
                "save + --resume, bit-exact vs uninterrupted control",
        "processes": num_processes,
        "devices_per_process": devices_per_process,
        "steps": steps,
        "preempt_trigger_step": preempt_after_step,
        "resume_step": resume_step,
        "loss_stream_control": sorted(loss_c.items()),
        "loss_stream_preempt": sorted(loss_p.items()),
        "loss_mismatches": mismatches,
        "post_resume_overlap_records": len(post_resume),
        "workdir": workdir,
    }
    result["pass"] = (
        not mismatches
        and len(common) == steps
        and len(post_resume) >= 2
    )
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--preempt", action="store_true",
                    help="run the 3-arm preempt+resume rehearsal and "
                         "write MULTIHOST_PREEMPT.json")
    ap.add_argument("--out", default="MULTIHOST_PREEMPT.json")
    args = ap.parse_args(argv)
    if args.preempt:
        import json

        result = launch_preempt_resume(
            num_processes=args.processes,
            steps=max(args.steps, 16),
        )
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: v for k, v in result.items()
                          if not isinstance(v, list)}, indent=1))
        return 0 if result["pass"] else 1
    log_path = launch(num_processes=args.processes, steps=args.steps)
    print(f"multihost dryrun OK; process-0 metrics at {log_path}")
    with open(log_path) as f:
        sys.stdout.write(f.read())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
