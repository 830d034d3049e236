"""Device mesh construction and sharding plans.

The reference is a single-process single-GPU program (its only "device
placement" is CUDA_VISIBLE_DEVICES pinning, reference deeplab.py:3). Here
distribution is first-class and TPU-native: a ``jax.sharding.Mesh`` over
the chips, batch sharded along a ``data`` axis, parameters/optimizer state
replicated, and gradient all-reduce left to XLA (jit sees sharded batch in,
replicated grads out -> it inserts the psum over ICI; no NCCL-style
backend code exists or is needed — SURVEY.md §2 parallelism table).

A second ``space`` axis is reserved for spatial sharding of large inputs
(the conv analogue of context parallelism; SURVEY.md §5) — size 1 in the
parity configuration.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from em_adapt_tpu.config import MeshConfig


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the sharding rules the trainer uses."""

    mesh: Mesh
    data_axis: str
    space_axis: str

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape[self.data_axis]

    def batch_sharding(self) -> NamedSharding:
        """Leading (batch) dim sharded over data; rest replicated."""
        return NamedSharding(self.mesh, P(self.data_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch):
        """Device_put a host pytree of [B, ...] arrays onto the mesh."""
        return jax.device_put(batch, self.batch_sharding())

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated())


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> MeshPlan:
    """Build the mesh. Axis size -1 absorbs all remaining devices."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = dict(cfg.axes)
    fixed = int(np.prod([s for s in sizes.values() if s != -1])) or 1
    for k, v in sizes.items():
        if v == -1:
            if n % fixed != 0:
                raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
            sizes[k] = n // fixed
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(f"mesh axes {sizes} use {total} devices, have {n}")
    dev_array = np.asarray(devices).reshape(tuple(sizes.values()))
    mesh = Mesh(dev_array, tuple(sizes.keys()))
    return MeshPlan(mesh=mesh, data_axis=cfg.data_axis, space_axis=cfg.space_axis)
