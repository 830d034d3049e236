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


#: Parameter leaves sharded over the ``model`` axis (tensor parallelism for
#: the wide atrous-FC head; megatron-style column-parallel fc6 then
#: row-parallel fc7 — XLA's SPMD partitioner inserts the all-gathers /
#: reduce-scatters). Maps (layer, leaf) -> dim to shard.
TP_RULES: dict[tuple[str, str], int] = {
    ("fc6", "w"): 3,  # [kh,kw,cin,cout] -> split cout (column parallel)
    ("fc6", "b"): 0,
    ("fc7", "w"): 2,  # [1,1,cin,cout]  -> split cin  (row parallel)
}


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the sharding rules the trainer uses."""

    mesh: Mesh
    data_axis: str
    space_axis: str
    model_axis: str = "model"

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def num_model_shards(self) -> int:
        return self.mesh.shape.get(self.model_axis, 1)

    @property
    def num_space_shards(self) -> int:
        return self.mesh.shape.get(self.space_axis, 1)

    def batch_sharding(self) -> NamedSharding:
        """[B, H, ...] batches: B sharded over data; H sharded over space
        when the mesh has a nontrivial space axis (spatial partitioning —
        the conv analogue of sequence/context parallelism, SURVEY.md §5:
        XLA's SPMD partitioner inserts the halo exchanges for convs and
        pools over the spatially-sharded activations)."""
        if self.num_space_shards > 1:
            return NamedSharding(self.mesh, P(self.data_axis, self.space_axis))
        return NamedSharding(self.mesh, P(self.data_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def param_sharding(self, layer: str, leaf: str, ndim: int) -> NamedSharding:
        """Sharding for one parameter leaf: TP_RULES over the model axis
        when it is nontrivial, else replicated."""
        if self.num_model_shards > 1 and (layer, leaf) in TP_RULES:
            dim = TP_RULES[(layer, leaf)]
            spec = [None] * ndim
            spec[dim] = self.model_axis
            return NamedSharding(self.mesh, P(*spec))
        return self.replicated()

    def state_sharding(self, state):
        """Per-leaf shardings for a TrainState-shaped pytree: parameter-like
        leaves (paths ending in <layer>/<'w'|'b'>) follow param_sharding —
        optimizer slots mirror their parameters — everything else is
        replicated."""
        import jax.tree_util as jtu

        def leaf_sharding(path, leaf):
            keys = [p.key for p in path if hasattr(p, "key")]
            if len(keys) >= 2 and keys[-1] in ("w", "b"):
                return self.param_sharding(keys[-2], keys[-1], getattr(leaf, "ndim", 0))
            return self.replicated()

        return jtu.tree_map_with_path(leaf_sharding, state)

    def _leaf_sharding(self, name: str, v) -> NamedSharding:
        """Batch dim over data; spatial dim 1 over space for rank>=3
        image-like arrays (1-D per-image flags stay data-sharded only).

        The image MUST divide over the space axis (that's the whole point
        of spatial sharding — an indivisible input size is a config
        error); auxiliary leaves that don't divide (e.g. a host-shrunk
        41-row label under space=3, DataConfig.train_label_size) fall back
        to data-only sharding — XLA reshards where the computation needs
        it."""
        if self.num_space_shards > 1 and getattr(v, "ndim", 0) >= 3:
            if v.shape[1] % self.num_space_shards == 0:
                return NamedSharding(self.mesh, P(self.data_axis, self.space_axis))
            if name == "image":
                raise ValueError(
                    f"spatial sharding: image height {v.shape[1]} is not "
                    f"divisible by the space axis ({self.num_space_shards}); "
                    f"pick an input size divisible by it (e.g. 321 with "
                    f"space=3) or set space=1"
                )
        return NamedSharding(self.mesh, P(self.data_axis))

    def _put(self, v, sharding: NamedSharding):
        """Single-controller: device_put the full array. Multi-controller
        (multi-host DCN runtime, SURVEY.md §5): ``v`` is this process's
        LOCAL shard of the global batch — assemble the global jax.Array
        from per-process data without any cross-host transfer."""
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, v)
        return jax.device_put(v, sharding)

    def shard_batch(self, batch):
        """Put a host pytree of [B, ...] arrays onto the mesh (multi-host:
        each process passes its local slice; B means the LOCAL batch)."""
        if isinstance(batch, dict):
            return {
                k: self._put(v, self._leaf_sharding(k, v)) for k, v in batch.items()
            }
        return self._put(batch, self.batch_sharding())

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated())

    def ensure_batch_sharded(self, batch: dict) -> dict:
        """Strip host-only leaves (lists/strs) and ``shard_batch`` the
        rest — unless every array leaf is ALREADY a jax.Array (e.g.
        ``--device-data`` cached batches), which pass through untouched.
        Re-putting a global array via make_array_from_process_local_data
        would reinterpret it as one process's LOCAL shard on multi-host
        (wrong values), and is wasted work single-host. Single source of
        truth for a rule that four call sites used to duplicate
        (Trainer.fit / _multihost_warmup / DevicePrefetcher / cli)."""
        arrays = {
            k: v for k, v in batch.items() if not isinstance(v, (list, str))
        }
        if all(isinstance(v, jax.Array) for v in arrays.values()):
            return arrays
        return self.shard_batch(arrays)


def shard_map_eligibility(
    mesh, data_axis: str, batch: int
) -> tuple[bool, int, int]:
    """Whether a Pallas kernel can compose with ``mesh`` via shard_map
    over its data axis: ``(can_shard, n_data, batch_per_shard)``.

    Shared by the E-step and block1 kernel gates (ops/estep.py,
    models/deeplab.py) so the eligibility rule cannot drift between
    them. Eligible = a mesh that spans >1 device whose data axis evenly
    divides the batch. NOTE a data axis of size 1 (e.g. a TP-only mesh)
    still qualifies: the batch is replicated there, so every chip runs
    the full-batch kernel — the same redundancy the XLA lowering would
    have on replicated input, and the kernel is the faster per-chip
    choice. The case the gates exist to AVOID is data-SHARDED input
    with no mesh to shard_map over, where GSPMD (which has no
    partitioning rule for a pallas custom-call) would all-gather the
    batch and run the whole kernel redundantly on every chip."""
    n_data = dict(mesh.shape).get(data_axis, 1) if mesh is not None else 1
    can_shard = mesh is not None and mesh.size > 1 and batch % n_data == 0
    return can_shard, n_data, batch // n_data if can_shard else batch


def shard_map_ineligibility_reason(mesh, data_axis: str, batch: int) -> str:
    """Human-readable reason why :func:`shard_map_eligibility` said no —
    shared by the forced-pallas fallback warnings (ops/estep.py,
    models/deeplab.py) so the diagnostic matches the actual failing
    clause (a size-1 mesh used to be misreported as a divisibility
    problem)."""
    if mesh is None:
        return (
            "no mesh to shard_map over — pass mesh=/data_axis= "
            "(the trainer does)"
        )
    if mesh.size <= 1:
        return (
            f"a single-device mesh that cannot cover the "
            f"{jax.device_count()} devices — build the mesh over all of "
            "them (make_mesh does)"
        )
    n_data = dict(mesh.shape).get(data_axis, 1)
    return (
        f"a mesh whose {data_axis!r} axis ({n_data}) does not divide "
        f"the batch ({batch}) — make the batch divisible"
    )


def resolve_axis_sizes(cfg: MeshConfig, n_devices: int) -> dict[str, int]:
    """Concrete axis sizes for ``n_devices``, resolving the -1 = "all
    remaining devices" convention. Raises if a -1 axis cannot divide
    evenly. Shared by :func:`make_mesh` and callers that need the sizes
    BEFORE building a mesh (e.g. the CLI's per-shard batch scaling)."""
    sizes = dict(cfg.axes)
    wild = [k for k, v in sizes.items() if v == -1]
    if len(wild) > 1:
        # Two -1 axes would BOTH resolve to n/fixed below, silently
        # over-subscribing the device count and surfacing later as a
        # misleading "mesh axes use N devices, have M" error (and a bogus
        # CLI per-shard batch auto-scale before it).
        raise ValueError(
            f"at most one mesh axis may be -1, got {wild} in {cfg.axes}"
        )
    fixed = int(np.prod([s for s in sizes.values() if s != -1])) or 1
    for k, v in sizes.items():
        if v == -1:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {fixed}"
                )
            sizes[k] = n_devices // fixed
    return sizes


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> MeshPlan:
    """Build the mesh. Axis size -1 absorbs all remaining devices."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = resolve_axis_sizes(cfg, n)
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(f"mesh axes {sizes} use {total} devices, have {n}")
    dev_array = np.asarray(devices).reshape(tuple(sizes.values()))
    mesh = Mesh(dev_array, tuple(sizes.keys()))
    return MeshPlan(mesh=mesh, data_axis=cfg.data_axis, space_axis=cfg.space_axis)
