"""Prediction and evaluation driver.

The reference's predict path is a dead stub (reference network.py:57-75
references undefined classes) but its intent is recoverable: bilinear
upsample of logits to image resolution + channel argmax (reference
network.py:39-41), optional denseCRF refinement with the hyperparameters
preserved at reference network.py:63, mIoU computed externally. Here the
whole path is in-repo:

* fixed-size fast path: jitted batched predict at the training input
  resolution, streaming confusion matrix on device;
* exact VOC protocol: per-image upsample of the 41x41 score map to the
  ORIGINAL image resolution before argmax (host loop — original sizes are
  dynamic), optional CRF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from em_adapt_tpu.config import EvalConfig, ExperimentConfig
from em_adapt_tpu.eval.miou import ConfusionAccumulator


class Evaluator:
    """``plan`` (optional ``parallel.mesh.MeshPlan``): shard evaluation
    over the mesh's data axis so eval rides EVERY chip instead of leaving
    n-1 idle — batches are device_put batch-sharded (and spatially sharded
    when the mesh has a space axis) before each jitted call, and XLA's
    SPMD partitioner splits the network + post-process across the mesh.
    Any batch size works: batches whose size the data axis can't divide
    are zero-padded up to the next multiple before sharding and the extra
    rows sliced off the result (padding an eval batch is already the
    static-shape discipline of this module, see flush()). Single-
    controller only (multi-host eval stays replicated per process — see
    cli.py's multihost eval_fn rationale). Results are identical to
    unsharded eval (pinned by tests/test_parallel.py)."""

    def __init__(self, cfg: ExperimentConfig, model, plan=None):
        self.cfg = cfg
        self.model = model
        if plan is not None and jax.process_count() > 1:
            raise ValueError(
                "Evaluator(plan=...) is single-controller only; multi-host "
                "runs evaluate replicated per process (cli.py eval_fn)"
            )
        self.plan = plan if plan is not None and plan.mesh.size > 1 else None
        self._jit_logits = jax.jit(
            lambda params, img: model.apply(params, img, train=False)
        )
        self._jit_predict = jax.jit(lambda params, img: model.predict(params, img)[1])

    def _padded_size(self, n: int) -> int:
        """Smallest batch size >= n the mesh's data axis divides evenly
        (n itself without a plan)."""
        if self.plan is None:
            return n
        d = self.plan.num_data_shards
        return -(-n // d) * d

    @staticmethod
    def _pad_rows(stack: np.ndarray, target: int) -> np.ndarray:
        """Zero-pad dim 0 up to ``target`` rows (shared by predict_batch
        and both evaluate_voc flushes — one place to fix pad semantics)."""
        n = stack.shape[0]
        if n >= target:
            return stack
        return np.concatenate(
            [stack, np.zeros((target - n,) + stack.shape[1:], stack.dtype)]
        )

    def _shard(self, array, *, image_like: bool = True):
        """Batch-shard a host array over the mesh when a plan is set (the
        no-plan path keeps plain jnp.asarray placement)."""
        if self.plan is None:
            return jnp.asarray(array)
        if image_like:
            # dict path = _leaf_sharding: space-axis sharding with the
            # divisibility diagnostics (and data-only fallback for
            # non-image ranks)
            return self.plan.shard_batch({"image": array})["image"]
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            array, NamedSharding(self.plan.mesh, P(self.plan.data_axis))
        )

    def predict_batch(self, params, images: jax.Array) -> jax.Array:
        """[B,H,W] int32 hard predictions at input resolution."""
        n = images.shape[0]
        m = self._padded_size(n)
        if m != n:
            images = self._pad_rows(np.asarray(images), m)
        pred = self._jit_predict(self._ensure_params(params), self._shard(images))
        return pred[:n] if m != n else pred

    def _ensure_params(self, params):
        """Replicate params onto the mesh once per evaluation. Params that
        already live on the FULL mesh — e.g. straight from training,
        possibly TP-sharded — pass through untouched; anything else (host
        numpy, or arrays committed to a single device like freshly
        calibrated int8 qparams) would make jit raise an incompatible-
        devices error against mesh-sharded batch inputs."""
        if self.plan is None:
            return params
        mesh_devices = set(self.plan.mesh.devices.flat)
        ok = all(
            isinstance(leaf, jax.Array)
            and set(leaf.sharding.device_set) == mesh_devices
            for leaf in jax.tree_util.tree_leaves(params)
        )
        return params if ok else self.plan.replicate(params)

    def evaluate_fixed(self, params, batches) -> tuple[float, np.ndarray]:
        """Fast mIoU at the fixed input resolution (labels resized the same
        way the train pipeline resizes them)."""
        from em_adapt_tpu.eval.miou import miou_from_confusion

        return miou_from_confusion(self.confusion_fixed(params, batches))

    def confusion_fixed(self, params, batches) -> np.ndarray:
        """[C, C] int64 confusion matrix of the fixed-resolution protocol —
        the shardable partial result for distributed eval (matrices from
        disjoint dataset shards SUM to the full-set matrix exactly)."""
        params = self._ensure_params(params)
        acc = ConfusionAccumulator(self.cfg.model.num_classes)
        for batch in batches:
            pred = self.predict_batch(params, batch["image"])
            gt = jnp.asarray(batch["label"][..., 0])
            acc.update(pred, gt)
        return acc.matrix()

    def evaluate_voc(
        self, params, dataset, *, use_crf: bool | None = None, batch_size: int | None = None
    ) -> tuple[float, np.ndarray]:
        """Exact VOC protocol: compare at each image's original resolution.

        Runs the network at the training input size, then bilinearly
        upsamples each image's probability map to its original (h, w)
        before the argmax.
        """
        from em_adapt_tpu.eval.miou import miou_from_confusion

        return miou_from_confusion(
            self.confusion_voc(
                params, dataset, use_crf=use_crf, batch_size=batch_size
            )
        )

    def confusion_voc(
        self, params, dataset, *, use_crf: bool | None = None, batch_size: int | None = None
    ) -> np.ndarray:
        """[C, C] int64 confusion matrix of the exact VOC protocol — the
        shardable partial result for distributed eval (each process scores
        a disjoint dataset shard; the integer matrices sum exactly)."""
        from em_adapt_tpu.data.augment import preprocess_eval

        params = self._ensure_params(params)

        eval_cfg: EvalConfig = self.cfg.eval
        use_crf = eval_cfg.use_crf if use_crf is None else use_crf
        # Round the chunk size itself up to a data-axis multiple: padding
        # only the dispatch (not the accumulation) would waste the pad
        # lanes of EVERY batch, not just the tail's.
        bs = self._padded_size(batch_size or eval_cfg.batch_size)
        if eval_cfg.crf_impl not in ("host", "tpu"):
            # Validate eagerly: a typo ("device", "TPU", ...) would
            # otherwise silently select the host worker-pool CRF.
            raise ValueError(
                f"eval.crf_impl must be 'host' or 'tpu', got "
                f"{eval_cfg.crf_impl!r}"
            )
        if use_crf and eval_cfg.crf_impl == "tpu":
            return self._evaluate_voc_device(params, dataset, bs)
        acc = ConfusionAccumulator(self.cfg.model.num_classes)

        # Per-image post-processing (TF1 bilinear upsample to the original
        # resolution + optional denseCRF) runs on a worker pool: the CRF
        # is host compute (numpy/scipy + the native permutohedral lattice,
        # whose ctypes calls release the GIL), so images refine in
        # parallel while the accumulator consumes results in order on the
        # main thread. Round-2 finding: this loop was single-threaded and
        # its cost unmeasured (tools/bench_crf.py has the numbers now).
        from concurrent.futures import ThreadPoolExecutor

        def _post(lg, raw_img, raw_label):
            # Pure HOST compute (round-3 review finding): the previous
            # version ran the upsample and softmax eagerly on the default
            # device with per-image dynamic shapes — a fresh compile per
            # distinct VOC image size plus two ~16 MB round trips per
            # image through the relay. resize_bilinear_np is the exact
            # TF1-grid twin of ops/resize.py (golden-tested), and the
            # softmax is 3 lines of numpy.
            from em_adapt_tpu.data.augment import resize_bilinear_np

            oh, ow = raw_label.shape[:2]
            up = resize_bilinear_np(np.asarray(lg, np.float32), (oh, ow))
            if use_crf:
                from em_adapt_tpu.eval.crf import dense_crf

                e = np.exp(up - up.max(axis=-1, keepdims=True))
                probs = e / e.sum(axis=-1, keepdims=True)
                up = np.asarray(dense_crf(probs, raw_img, eval_cfg))
            return up.argmax(-1)

        pend_imgs, pend_raw = [], []
        futures = []

        def flush(pool):
            if not pend_imgs:
                return
            n = len(pend_imgs)
            # Pad the tail chunk to the full batch shape: a smaller final
            # batch would retrace _jit_logits — a fresh multi-minute
            # remote compile for one leftover shape (same rationale as
            # pipeline.py's pad_remainder); bs is already a data-axis
            # multiple under a mesh plan.
            stack = self._pad_rows(np.stack(pend_imgs), bs)
            logits = jax.device_get(self._jit_logits(params, self._shard(stack)))
            for lg, (raw_img, raw_label) in zip(logits[:n], pend_raw):
                futures.append(
                    (pool.submit(_post, lg, raw_img, raw_label), raw_label)
                )
            pend_imgs.clear()
            pend_raw.clear()

        def drain(keep: int):
            # bound in-flight results (a full val set of prediction maps
            # would hold ~0.7 GB); order does not matter to the confusion
            # sum, but FIFO keeps the oldest from pinning memory.
            # update_host: per-image ORIGINAL shapes are all distinct —
            # the jitted device accumulator would recompile per shape.
            while len(futures) > keep:
                fut, raw_label = futures.pop(0)
                acc.update_host(fut.result(), raw_label)

        workers = max(1, eval_cfg.crf_workers if use_crf else 2)
        if use_crf:
            from em_adapt_tpu.eval.permutohedral import available

            if not available():
                # The bilateral-grid fallback allocates a dense 5-D grid
                # whose size is data-dependent (~250 MB for a typical VOC
                # image at the reference srgb=5) — running several in
                # parallel threads multiplies that peak. The native
                # lattice streams (and releases the GIL); the fallback
                # runs serial.
                workers = 1
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for i in range(len(dataset)):
                raw_img, raw_label = dataset.load_raw(i)
                img, _ = preprocess_eval(
                    raw_img, None, input_size=self.cfg.model.input_size
                )
                pend_imgs.append(img)
                pend_raw.append((raw_img, raw_label))
                if len(pend_imgs) == bs:
                    flush(pool)
                    drain(4 * workers)
            flush(pool)
            drain(0)
        return acc.matrix()

    def _make_device_voc_post(self, bucket: tuple[int, int]):
        """One jitted batched graph for the whole VOC post-process:
        TF1 bilinear upsample of the 41x41 score map to each image's
        ORIGINAL size (traced, inside a static bucket), softmax,
        mean-field denseCRF, argmax. Device-side twin of the host
        _post() above (reference network.py:39-41 + :63); only uint8
        guide images go up and uint8 label maps come back — no
        probability maps cross the host link."""
        import functools

        from em_adapt_tpu.eval.crf_tpu import _crf_refine_one
        from em_adapt_tpu.ops.resize import resize_bilinear_tf_dynamic

        cfg = self.cfg.eval
        refine = functools.partial(
            _crf_refine_one,
            bi_sxy=float(cfg.crf_bi_sxy),
            bi_srgb=float(cfg.crf_bi_srgb),
            bi_compat=float(cfg.crf_bi_compat),
            g_sxy=float(cfg.crf_g_sxy),
            g_compat=float(cfg.crf_g_compat),
            iterations=int(cfg.crf_iterations),
        )
        bh, bw = bucket

        def one(args):
            lg, rgb, size = args
            up = resize_bilinear_tf_dynamic(lg, size, (bh, bw))
            mask = (
                (jnp.arange(bh)[:, None] < size[0])
                & (jnp.arange(bw)[None, :] < size[1])
            )
            e = jnp.exp(up - up.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
            q = refine(probs, rgb, mask.astype(jnp.float32))
            return jnp.argmax(q, axis=-1).astype(jnp.uint8)

        # lax.map (sequential per-image), NOT vmap: the batched-scatter
        # program vmap makes of the bilateral-grid splat reproducibly
        # FAULTS the TPU runtime ("TPU worker process crashed / kernel
        # fault") on specific guide-image combinations — bisected to one
        # 6-image batch whose images each pass individually
        # (tools/repro_crf_tpu_fault.py keeps the repro; v5e via the
        # axon relay, jax 0.8.x). The CRF is compute-bound with flat
        # batch scaling (PROFILE.md: 0.289 s/img at batch 4 vs 0.280 at
        # batch 8), so serializing the batch dim costs ~nothing and the
        # per-image program demonstrably does not hit the bug.
        return jax.jit(
            lambda lgs, rgbs, sizes: jax.lax.map(one, (lgs, rgbs, sizes))
        )

    def _evaluate_voc_device(
        self, params, dataset, bs: int
    ) -> np.ndarray:
        """VOC protocol (original-resolution compare) with the
        post-process ON DEVICE (EvalConfig.crf_impl="tpu"): logits stay
        on the accelerator, the CRF runs batched in jit, and only [H,W]
        uint8 label maps return to the host for the confusion sum. Not
        bit-identical to the host protocol: the dynamic-size bilinear
        grid is computed on device, where XLA's reciprocal-multiply f32
        division can sit 1 ulp off TF1's IEEE divide (see
        ops/resize.py::resize_bilinear_tf_dynamic); label agreement with
        the host path is pinned at >99.9% per image.

        Images route to the smallest EvalConfig.crf_buckets shape that
        fits them (falling back to crf_bucket), batching per bucket, so a
        mostly-landscape dataset doesn't pay the square worst case per
        image. One compile per bucket that actually receives images; the
        masked CRF is padding-invariant, so labels don't depend on which
        bucket an image lands in (tests/test_crf_tpu.py pins both)."""
        from em_adapt_tpu.data.augment import preprocess_eval

        # params already ensured by evaluate_voc (the only caller)
        eval_cfg: EvalConfig = self.cfg.eval
        acc = ConfusionAccumulator(self.cfg.model.num_classes)
        max_bucket = tuple(eval_cfg.crf_bucket)
        # Smallest-area-first routing; crf_bucket is the fallback and the
        # authority on "image too big" (the element-wise check in route()).
        # Extra buckets may swap aspect (a portrait bucket under a
        # landscape ceiling is fine) but never exceed the ceiling's AREA —
        # a bigger one could only receive images the ceiling already
        # rejects, so it would be dead weight plus a wasted compile.
        max_area = max_bucket[0] * max_bucket[1]
        extra = {
            tuple(b) for b in eval_cfg.crf_buckets if b[0] * b[1] <= max_area
        }
        buckets = sorted(extra | {max_bucket}, key=lambda b: (b[0] * b[1], b))
        posts: dict[tuple[int, int], object] = {}
        pending: dict[tuple[int, int], list[tuple[np.ndarray, ...]]] = {
            b: [] for b in buckets
        }

        def route(oh: int, ow: int) -> tuple[int, int]:
            # The ceiling check comes first so an aspect-swapped extra
            # bucket can't admit an image crf_bucket would reject.
            if oh > max_bucket[0] or ow > max_bucket[1]:
                raise ValueError(
                    f"image {oh}x{ow} exceeds eval.crf_bucket "
                    f"({max_bucket[0]}, {max_bucket[1]}); raise the bucket"
                )
            for b in buckets:
                if oh <= b[0] and ow <= b[1]:
                    return b
            raise AssertionError("unreachable: max_bucket admits the image")

        def flush(bucket: tuple[int, int]):
            pend = pending[bucket]
            if not pend:
                return
            bh, bw = bucket
            n = len(pend)
            stack = self._pad_rows(np.stack([p[0] for p in pend]), bs)
            logits = self._jit_logits(params, self._shard(stack))
            rgbs = np.zeros((bs, bh, bw, 3), np.uint8)
            # Padded tail images keep size (1,1): a nonzero size keeps the
            # dynamic-resize division finite (0 would put NaNs through that
            # lane's CRF); their outputs are never read.
            sizes = np.ones((bs, 2), np.int32)
            for i, (_, raw_img, raw_label) in enumerate(pend):
                oh, ow = raw_label.shape[:2]
                rgbs[i, :oh, :ow] = raw_img
                sizes[i] = (oh, ow)
            if bucket not in posts:
                posts[bucket] = self._make_device_voc_post(bucket)
            # Data-axis-only sharding for the post-process inputs: the
            # per-image CRF has no spatial halo exchange, so the guide
            # image must stay whole on its shard.
            labels = np.asarray(
                posts[bucket](
                    logits,
                    self._shard(rgbs, image_like=False),
                    self._shard(sizes, image_like=False),
                )
            )
            for i, (_, _, raw_label) in enumerate(pend):
                oh, ow = raw_label.shape[:2]
                acc.update_host(labels[i, :oh, :ow].astype(np.int32), raw_label)
            pend.clear()

        for i in range(len(dataset)):
            raw_img, raw_label = dataset.load_raw(i)
            img, _ = preprocess_eval(
                raw_img, None, input_size=self.cfg.model.input_size
            )
            bucket = route(*raw_label.shape[:2])
            pending[bucket].append((img, raw_img, raw_label))
            if len(pending[bucket]) == bs:
                flush(bucket)
        for bucket in buckets:
            flush(bucket)
        return acc.matrix()
