"""Input pipeline: host decode/augment workers feeding the device.

Replaces the reference's tf.data graph + per-step ``sess.run`` fetch +
``feed_dict`` re-upload (reference dataset.py:107-145, deeplab.py:265-267)
with an explicit, PRNG-keyed pipeline:

* epoch order is a seeded numpy permutation per epoch (replacing tf.data's
  opaque ``shuffle(full_len)``, reference dataset.py:139);
* JPEG/PNG decode + TF1-exact augmentation run on a thread pool;
* batches are handed to the trainer, which device_puts them sharded over
  the mesh's data axis (overlapping H2D with compute via prefetch).

``SyntheticVOC`` generates deterministic fake VOC-shaped data so training,
tests and benchmarks run end-to-end without the 10,582-image dataset on
disk.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator

import numpy as np

from em_adapt_tpu.config import DataConfig
from em_adapt_tpu.data.augment import augment_train, preprocess_eval
from em_adapt_tpu.data.voc import read_split


class VOCSegmentation:
    """File-backed VOC+SBD dataset: decode one (image, label) pair.

    ``strong_list``: optional path to a txt file of image ids whose masks
    are REAL pixel annotations (semi-supervised EM, BASELINE.json config
    #4). Those images bypass the E-step in the loss and train with
    ignore-label masking; all others are weak (tags only).
    """

    def __init__(
        self, cfg: DataConfig, category: str = "train", strong_list: str | None = None
    ):
        self.cfg = cfg
        self.category = category
        self.ids, self.img_paths, self.label_paths = read_split(
            cfg.list_dir, category, cfg.main_path, length=cfg.length
        )
        strong_ids: set[str] = set()
        if strong_list:
            with open(strong_list) as f:
                strong_ids = {line.strip() for line in f if line.strip()}
        self.is_strong = np.array([i in strong_ids for i in self.ids], bool)

    def __len__(self) -> int:
        return len(self.ids)

    def load_raw(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        img = np.asarray(Image.open(self.img_paths[i]).convert("RGB"))
        label = np.asarray(Image.open(self.label_paths[i]))
        if label.ndim == 3:  # RGB-coded mask; normally already palette-indexed
            from em_adapt_tpu.data.voc import rgb_mask_to_index

            label = rgb_mask_to_index(label)
        return img, label


class SyntheticVOC:
    """Deterministic fake VOC-shaped data (variable image sizes like the
    real corpus) for tests and benchmarks."""

    def __init__(self, n: int = 64, num_classes: int = 21, seed: int = 0,
                 category: str = "train", strong_fraction: float = 0.0):
        self.n = n
        self.num_classes = num_classes
        self.seed = seed
        self.category = category
        self.ids = [f"synth_{i:06d}" for i in range(n)]
        self.is_strong = (
            np.random.default_rng(seed).uniform(size=n) < strong_fraction
        )

    def __len__(self) -> int:
        return self.n

    def load_raw(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        g = np.random.default_rng(self.seed * 100003 + i)
        h = int(g.integers(200, 500))
        w = int(g.integers(200, 500))
        img = g.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        label = g.integers(0, self.num_classes, size=(h, w)).astype(np.uint8)
        label[: h // 8] = 255  # void band, like VOC object boundaries
        return img, label


class LearnableSyntheticVOC:
    """A *learnable* weak-supervision rehearsal task (color-coded blobs).

    Each foreground class has a distinctive color; every image is a
    textured background (class 0) with 1-2 elliptical class blobs. The
    pixel masks exist only for evaluation — training consumes nothing but
    the images and the tag set the E-step derives from the (downsampled)
    mask, exactly like VOC weak supervision. EM training must lift val
    mIoU well above chance in a few hundred steps; this is the end-to-end
    EM-dynamics signal behind the reference's only quality metric
    (reference readme.md:40), rehearsable without the real dataset.
    """

    #: distinctive mean RGB per foreground class (class 0 = background).
    CLASS_COLORS = np.array(
        [[128, 128, 128], [210, 60, 60], [60, 190, 60], [60, 80, 210],
         [220, 200, 60], [190, 60, 200], [60, 200, 200]], np.float32
    )

    def __init__(self, n: int = 64, num_classes: int = 4, seed: int = 0,
                 category: str = "train", image_size: int = 33,
                 strong_fraction: float = 0.0):
        assert 2 <= num_classes <= len(self.CLASS_COLORS)
        self.n = n
        self.num_classes = num_classes
        self.seed = seed + (0 if category == "train" else 10_000)
        self.category = category
        self.image_size = image_size
        self.ids = [f"blob_{category}_{i:06d}" for i in range(n)]
        # First ceil(f*n) images are strongly labeled (deterministic so
        # the strong subset is identical across runs/arms of a comparison).
        self.is_strong = np.arange(n) < int(np.ceil(strong_fraction * n))

    def __len__(self) -> int:
        return self.n

    def load_raw(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        g = np.random.default_rng(self.seed * 100003 + i)
        s = self.image_size
        label = np.zeros((s, s), np.uint8)
        img = np.empty((s, s, 3), np.float32)
        img[:] = self.CLASS_COLORS[0] + g.normal(0, 18, (s, s, 3))
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        max_blobs = min(2, self.num_classes - 1)
        for cls in g.choice(
            np.arange(1, self.num_classes),
            size=g.integers(1, max_blobs + 1),
            replace=False,
        ):
            cy, cx = g.uniform(0.25 * s, 0.75 * s, 2)
            ry, rx = g.uniform(0.18 * s, 0.32 * s, 2)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            label[mask] = cls
            img[mask] = self.CLASS_COLORS[cls] + g.normal(0, 18, (int(mask.sum()), 3))
        return np.clip(img, 0, 255).astype(np.uint8), label


class DatasetShard:
    """Contiguous per-process view of a dataset for PROCESS-SHARDED
    evaluation (multi-host): process ``shard`` of ``num_shards`` sees only
    its block of images, computes its partial confusion matrix
    (``Evaluator.confusion_voc``/``confusion_fixed``), and the integer
    matrices sum across processes to exactly the full-set matrix —
    replacing the fully-replicated multihost eval protocol (every process
    scoring all N images; round-3 VERDICT missing #2). Contiguous blocks
    (np.array_split semantics) keep each process's decode I/O sequential.
    """

    def __init__(self, dataset, shard: int, num_shards: int):
        if not 0 <= shard < num_shards:
            raise ValueError(f"shard {shard} not in [0, {num_shards})")
        self._dataset = dataset
        self._idxs = np.array_split(np.arange(len(dataset)), num_shards)[shard]
        self.ids = [dataset.ids[int(i)] for i in self._idxs]
        strong = getattr(dataset, "is_strong", None)
        self.is_strong = (
            np.asarray(strong)[self._idxs]
            if strong is not None
            else np.zeros(len(self._idxs), bool)
        )

    def __len__(self) -> int:
        return len(self._idxs)

    def load_raw(self, i: int):
        return self._dataset.load_raw(int(self._idxs[i]))


def batch_iterator(
    dataset,
    cfg: DataConfig,
    *,
    batch_size: int,
    seed: int = 0,
    epochs: int | None = None,
    train: bool = True,
    num_workers: int | None = None,
    drop_remainder: bool = True,
    pad_remainder: bool = False,
    process_shard: tuple[int, int] | None = None,
    start_step: int = 0,
) -> Iterator[dict]:
    """Yield {"image" [B,H,W,3] f32, "label" [B,H,W,1] f32, "id" list} batches.

    Epoch shuffling uses a per-epoch child PRNG; each sample's augmentation
    gets its own child keyed by (epoch, index) so results are independent
    of worker scheduling.

    ``start_step`` fast-forwards the stream to just after its first
    ``start_step`` batches WITHOUT decoding the skipped images (epoch
    permutations are seeded, so only index bookkeeping is needed): batch
    ``start_step`` onward is bit-identical to a fresh iterator drained
    that far. This is what makes ``em-adapt train --resume`` deterministic
    in DATA ORDER too, not just in model/optimizer state — the reference
    could not resume at all (warm-start restarted its tf.data shuffle from
    scratch, reference deeplab.py:229-234). With finite ``epochs`` the end
    point stays absolute (the stream ends where the un-resumed run would).

    ``pad_remainder`` (evaluation): a final partial batch is padded to
    ``batch_size`` with all-void (255) labels and ids ``"__pad__"`` so no
    image is dropped from a metric AND the batch shape stays static (no
    tail-shape recompile — remote TPU compiles cost minutes here). It takes
    precedence over ``drop_remainder``.

    ``process_shard=(pid, nprocs)`` (multi-host DCN): every process draws
    the SAME seeded epoch permutation and global batch indices, then keeps
    only its contiguous block of each batch — process pid loads rows
    [pid*B/n, (pid+1)*B/n) of the global batch, matching the mesh's
    data-axis device order so ``MeshPlan.shard_batch`` can assemble the
    global array from purely local data.
    """
    n = len(dataset)
    num_workers = num_workers if num_workers is not None else cfg.num_workers
    pid, nprocs = process_shard or (0, 1)
    if batch_size % nprocs:
        raise ValueError(
            f"global batch_size {batch_size} not divisible by "
            f"{nprocs} processes"
        )
    local_bs = batch_size // nprocs
    if n < batch_size and drop_remainder and not pad_remainder:
        # Every epoch's only (partial) batch would be dropped: with
        # epochs=None the generator would spin forever without yielding
        # (hanging the trainer inside the prefetcher with no diagnostic),
        # with finite epochs it would silently yield nothing.
        raise ValueError(
            f"dataset has {n} images < batch_size {batch_size} and "
            "drop_remainder=True would drop every batch; lower the batch "
            "size or pass pad_remainder=True"
        )
    if process_shard is not None and not (drop_remainder or pad_remainder):
        # A partial final batch would slice into UNEVEN per-process
        # blocks (some empty -> np.stack crash on only those processes,
        # desyncing the collective step). Static shapes per process are
        # the multi-host contract.
        raise ValueError(
            "process_shard requires drop_remainder or pad_remainder "
            "(a partial batch cannot be split evenly across processes)"
        )
    if start_step < 0:
        raise ValueError(f"start_step must be >= 0, got {start_step}")
    # Batches yielded per epoch (must mirror the yield logic below);
    # max(1) only guards the degenerate empty-dataset divide (an n=0
    # stream yields nothing regardless of where it starts).
    if pad_remainder or not drop_remainder:
        batches_per_epoch = max(-(-n // batch_size), 1)
    else:
        batches_per_epoch = max(n // batch_size, 1)
    epoch = start_step // batches_per_epoch
    to_skip = start_step % batches_per_epoch

    def load_one(epoch: int, idx: int) -> tuple[np.ndarray, np.ndarray]:
        img, label = dataset.load_raw(idx)
        if train:
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, epoch, idx, 0xA46])
            )
            img_p, lab_p = augment_train(
                img,
                label,
                rng,
                input_size=cfg.input_size,
                scale_range=cfg.scale_range,
                random_scale=cfg.random_scale,
                flip=cfg.flip,
                wire_dtype=cfg.wire_dtype,
            )
            if cfg.train_label_size is not None:
                # Host-side label shrink to score-map resolution: the same
                # TF1 nearest grid the device path applies (reference
                # deeplab.py:110), so training is bit-identical — just
                # ~60x fewer label bytes over the wire.
                from em_adapt_tpu.data.augment import resize_nearest_np

                lab_p = resize_nearest_np(lab_p, tuple(cfg.train_label_size))
            return img_p, lab_p
        img_p, lab_p = preprocess_eval(
            img, label, input_size=cfg.input_size, wire_dtype=cfg.wire_dtype
        )
        return img_p, lab_p

    pool = cf.ThreadPoolExecutor(max_workers=max(1, num_workers))
    try:
        while epochs is None or epoch < epochs:
            if train:
                perm = np.random.default_rng(
                    np.random.SeedSequence([seed, epoch])
                ).permutation(n)
            else:
                perm = np.arange(n)
            strong = getattr(dataset, "is_strong", None)
            # Dataset-level (not per-batch) presence check so every batch
            # has the same key set -> one jit signature.
            include_strong = strong is not None and strong.any()
            for start in range(0, n, batch_size):
                gidxs = perm[start : start + batch_size]
                if len(gidxs) < batch_size and drop_remainder and not pad_remainder:
                    continue
                if to_skip > 0:  # fast-forward: skip before any decode work
                    to_skip -= 1
                    continue
                # -1 marks a pad row (all-void label, zero image).
                if len(gidxs) < batch_size and pad_remainder:
                    gidxs = np.concatenate(
                        [gidxs, np.full(batch_size - len(gidxs), -1, gidxs.dtype)]
                    )
                idxs = gidxs[pid * local_bs : (pid + 1) * local_bs]
                results = list(
                    pool.map(
                        lambda i: load_one(epoch, int(i))
                        if i >= 0
                        else (None, None),
                        idxs,
                    )
                )
                proto = next((r for r in results if r[0] is not None), None)
                if proto is None:  # all-pad local block: build from specs
                    h, w = cfg.input_size
                    lh, lw = (
                        cfg.train_label_size
                        if train and cfg.train_label_size is not None
                        else (h, w)
                    )
                    dt = np.uint8 if cfg.wire_dtype == "uint8" else np.float32
                    proto = (
                        np.zeros((h, w, 3), dt),
                        np.full((lh, lw, 1), 255, dt),
                    )
                results = [
                    r
                    if r[0] is not None
                    else (np.zeros_like(proto[0]), np.full_like(proto[1], 255))
                    for r in results
                ]
                ids = [
                    dataset.ids[int(i)] if i >= 0 else "__pad__" for i in idxs
                ]
                imgs = np.stack([r[0] for r in results])
                labels = np.stack([r[1] for r in results])
                out = {"image": imgs, "label": labels, "id": ids}
                if include_strong:
                    out["is_strong"] = np.array(
                        [bool(strong[int(i)]) if i >= 0 else False for i in idxs]
                    )
                yield out
            epoch += 1
    finally:
        # Non-blocking teardown: consumers (e.g. Trainer.fit) may abandon
        # the generator mid-epoch; a blocking join at GC time races
        # interpreter shutdown (where module globals may already be gone —
        # hence the broad except).
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:
            pass


class DevicePrefetcher:
    """Overlap host batch assembly + H2D transfer with device compute.

    Wraps a host batch iterator; a background thread device_puts the next
    ``depth`` batches with the trainer's batch sharding while the current
    step runs.
    """

    def __init__(self, it: Iterator[dict], plan, depth: int = 2):
        import queue

        self._queue_mod = queue
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._it = it
        self._plan = plan
        self._done = object()
        self._stop = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        import jax

        try:
            for batch in self._it:
                if self._stop:
                    break
                arrays = self._plan.ensure_batch_sharded(batch)
                dev = dict(arrays)
                for k, v in batch.items():  # pass host-only leaves through
                    if k not in dev:
                        dev[k] = v
                while not self._stop:
                    try:
                        self._q.put(dev, timeout=0.1)
                        break
                    except self._queue_mod.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — re-raised in __next__
            # A decode/augment/shard error must surface in the CONSUMER:
            # swallowing it here would deliver the end-of-data sentinel
            # and the train loop would stop cleanly as if the dataset
            # were exhausted — silently checkpointing a partial run.
            self._error = e
        finally:
            # The sentinel MUST be delivered (or the consumer blocks in
            # get() forever once the queue drains) — retry past a
            # transiently full queue just like the data puts.
            while not self._stop:
                try:
                    self._q.put(self._done, timeout=0.1)
                    break
                except self._queue_mod.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise RuntimeError(
                    "DevicePrefetcher: the fill thread died on an error "
                    "in the source pipeline (decode/augment/shard)"
                ) from self._error
            raise StopIteration
        return item

    def close(self, timeout: float = 60.0) -> None:
        """Stop the fill thread (consumers that exit early — e.g. a step cap
        or preemption — must call this so the thread doesn't keep decoding
        and uploading batches forever on an endless iterator). Waits until
        the thread is actually dead — a silently-leaked thread still inside
        the source generator would race the next consumer of that
        generator ('generator already executing')."""
        import time as _time

        self._stop = True
        deadline = _time.monotonic() + timeout
        while self._thread.is_alive():
            while True:  # unblock a put-in-progress
                try:
                    self._q.get_nowait()
                except self._queue_mod.Empty:
                    break
            self._thread.join(timeout=0.2)
            if _time.monotonic() > deadline:
                raise RuntimeError(
                    "DevicePrefetcher.close: fill thread still alive after "
                    f"{timeout}s (stuck in decode or H2D transfer?)"
                )
