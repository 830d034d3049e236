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
) -> Iterator[dict]:
    """Yield {"image" [B,H,W,3] f32, "label" [B,H,W,1] f32, "id" list} batches.

    Epoch shuffling uses a per-epoch child PRNG; each sample's augmentation
    gets its own child keyed by (epoch, index) so results are independent
    of worker scheduling.
    """
    n = len(dataset)
    num_workers = num_workers if num_workers is not None else cfg.num_workers
    root = np.random.SeedSequence([seed, 0xDA7A])
    epoch = 0

    def load_one(epoch: int, idx: int) -> tuple[np.ndarray, np.ndarray]:
        img, label = dataset.load_raw(idx)
        if train:
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, epoch, idx, 0xA46])
            )
            return augment_train(
                img,
                label,
                rng,
                input_size=cfg.input_size,
                scale_range=cfg.scale_range,
                random_scale=cfg.random_scale,
                flip=cfg.flip,
            )
        img_p, lab_p = preprocess_eval(img, label, input_size=cfg.input_size)
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
            for start in range(0, n, batch_size):
                idxs = perm[start : start + batch_size]
                if len(idxs) < batch_size and drop_remainder:
                    continue
                results = list(pool.map(lambda i: load_one(epoch, int(i)), idxs))
                imgs = np.stack([r[0] for r in results])
                labels = np.stack([r[1] for r in results])
                out = {
                    "image": imgs,
                    "label": labels,
                    "id": [dataset.ids[int(i)] for i in idxs],
                }
                strong = getattr(dataset, "is_strong", None)
                if strong is not None and strong.any():
                    out["is_strong"] = strong[idxs]
                yield out
            epoch += 1
    finally:
        # Non-blocking teardown: consumers (e.g. Trainer.fit) may abandon
        # the generator mid-epoch; a blocking join at GC time races
        # interpreter shutdown.
        pool.shutdown(wait=False, cancel_futures=True)


class DevicePrefetcher:
    """Overlap host batch assembly + H2D transfer with device compute.

    Wraps a host batch iterator; a background thread device_puts the next
    ``depth`` batches with the trainer's batch sharding while the current
    step runs.
    """

    def __init__(self, it: Iterator[dict], plan, depth: int = 2):
        import queue

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._it = it
        self._plan = plan
        self._done = object()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for batch in self._it:
                ids = batch.pop("id", None)
                dev = self._plan.shard_batch(batch)
                if ids is not None:
                    dev["id"] = ids
                self._q.put(dev)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item
