"""Data layer: TF1-exact numpy resizes, palette conversion, convert tool,
augmentation semantics, pipeline determinism."""

import os

import numpy as np
import pytest

from em_adapt_tpu.config import DataConfig
from em_adapt_tpu.data.augment import (
    BGR_MEAN,
    augment_train,
    preprocess_eval,
    resize_bilinear_np,
    resize_nearest_np,
)
from em_adapt_tpu.data.pipeline import SyntheticVOC, batch_iterator
from em_adapt_tpu.data.voc import (
    VOC_PALETTE,
    convert_dataset,
    index_to_rgb,
    read_split,
    rgb_mask_to_index,
)

from conftest import RESIZE_CASES  # noqa: E402


@pytest.mark.parametrize("name,size", RESIZE_CASES)
def test_numpy_resizes_match_tf(tf_ops, name, size):
    img = tf_ops[f"resize_{name}_img"][0]
    lab = tf_ops[f"resize_{name}_lab"][0]
    np.testing.assert_allclose(
        resize_bilinear_np(img, size),
        tf_ops[f"resize_{name}_bi"][0],
        atol=1e-5,
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        resize_nearest_np(lab, size), tf_ops[f"resize_{name}_nn"][0]
    )


def test_palette_roundtrip():
    label = np.arange(21, dtype=np.uint8).reshape(3, 7)
    rgb = index_to_rgb(label)
    back = rgb_mask_to_index(rgb)
    np.testing.assert_array_equal(back, label)
    # void boundary color -> 255
    rgb2 = np.full((2, 2, 3), (224, 224, 192), np.uint8)
    assert (rgb_mask_to_index(rgb2) == 255).all()


def test_read_split(tmp_path):
    (tmp_path / "txt").mkdir()
    (tmp_path / "txt" / "train.txt").write_text("2007_000738\n2007_000739\n\n")
    ids, imgs, labels = read_split(str(tmp_path / "txt"), "train", "root")
    assert ids == ["2007_000738", "2007_000739"]
    assert imgs[0].endswith(os.path.join("JPEGImages", "2007_000738.jpg"))
    assert labels[1].endswith(os.path.join("SegmentationClassAug", "2007_000739.png"))
    ids, _, _ = read_split(str(tmp_path / "txt"), "train", "root", length=1)
    assert ids == ["2007_000738"]


def test_convert_dataset(tmp_path):
    from PIL import Image
    from scipy import io as scipy_io

    voc = tmp_path / "SegmentationClass"
    sbd = tmp_path / "cls"
    out = tmp_path / "SegmentationClassAug"
    voc.mkdir()
    sbd.mkdir()

    # RGB-coded VOC mask: class 3 square on background + void border.
    rgb = np.zeros((10, 10, 3), np.uint8)
    rgb[2:6, 2:6] = VOC_PALETTE[3]
    rgb[0, :] = (224, 224, 192)
    Image.fromarray(rgb).save(voc / "2007_000001.png")

    # SBD .mat with GTcls.Segmentation.
    seg = np.zeros((8, 8), np.uint8)
    seg[1:4, 1:4] = 7
    scipy_io.savemat(sbd / "2008_000002.mat", {"GTcls": {"Segmentation": seg}})

    n = convert_dataset(str(voc), str(sbd), str(out), log=lambda *a: None)
    assert n == 2
    a = np.asarray(Image.open(out / "2007_000001.png"))
    assert a[3, 3] == 3 and a[0, 0] == 255 and a[9, 9] == 0
    b = np.asarray(Image.open(out / "2008_000002.png"))
    np.testing.assert_array_equal(b, seg)


def test_convert_dataset_names_unsupported_mask_mode(tmp_path):
    """Review finding: an LA-mode (gray+alpha) mask crashed deep inside
    rgb_mask_to_index with a numpy broadcast error; it must fail with an
    error naming the offending file and mode."""
    import pytest
    from PIL import Image

    voc = tmp_path / "SegmentationClass"
    out = tmp_path / "SegmentationClassAug"
    voc.mkdir()
    la = Image.fromarray(np.zeros((6, 6, 2), np.uint8), mode="LA")
    la.save(voc / "2007_000009.png")
    with pytest.raises(ValueError, match="2007_000009.*mode 'LA'"):
        convert_dataset(str(voc), None, str(out), log=lambda *a: None)


def test_augment_shapes_and_flip_sharing():
    g = np.random.default_rng(0)
    img = g.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
    label = g.integers(0, 21, size=(200, 300)).astype(np.uint8)
    # find a seed that flips: flip coin drawn after scale
    img_a, lab_a = augment_train(img, label, np.random.default_rng(1))
    assert img_a.shape == (321, 321, 3) and img_a.dtype == np.float32
    assert lab_a.shape == (321, 321, 1) and lab_a.dtype == np.float32
    # determinism
    img_b, lab_b = augment_train(img, label, np.random.default_rng(1))
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(lab_a, lab_b)
    # flip shared (reference dataset.py:187-192 single coin): scan seeds
    # until one actually flips — a hard-coded seed silently stops testing
    # anything if an upstream RNG draw shifts the coin — and require the
    # label to flip exactly when the image does.
    saw_flip = False
    for seed in range(1, 33):
        img_f, lab_f = augment_train(img, label, np.random.default_rng(seed))
        img_nf, lab_nf = augment_train(
            img, label, np.random.default_rng(seed), flip=False
        )
        flipped_img = not np.array_equal(img_f, img_nf)
        flipped_lab = not np.array_equal(lab_f, lab_nf)
        assert flipped_img == flipped_lab, f"flip desync at seed {seed}"
        if flipped_img:
            saw_flip = True
            break
    assert saw_flip, "no seed in 1..32 flipped: the flip coin never engages"


def test_preprocess_eval_matches_manual():
    g = np.random.default_rng(0)
    img = g.integers(0, 256, size=(100, 80, 3), dtype=np.uint8)
    out, lab = preprocess_eval(img, None, input_size=(50, 40))
    manual = resize_bilinear_np(img, (50, 40))[:, :, ::-1] - BGR_MEAN
    np.testing.assert_allclose(out, manual, atol=1e-5)
    assert lab is None


def test_batch_iterator_epochs_and_determinism():
    ds = SyntheticVOC(n=10, seed=3)
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    batches = list(
        batch_iterator(ds, cfg, batch_size=4, seed=5, epochs=2, train=True)
    )
    # 10 imgs, batch 4, drop remainder -> 2 per epoch x 2 epochs
    assert len(batches) == 4
    assert batches[0]["image"].shape == (4, 33, 33, 3)
    assert batches[0]["label"].shape == (4, 33, 33, 1)
    assert len(batches[0]["id"]) == 4
    # deterministic across re-runs
    again = list(batch_iterator(ds, cfg, batch_size=4, seed=5, epochs=2, train=True))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])
    assert batches[0]["id"] == again[0]["id"]
    # different epochs shuffle differently
    assert batches[0]["id"] != batches[2]["id"]


def test_batch_iterator_start_step_resumes_data_order():
    """start_step=k == draining k batches: bit-identical stream, absolute
    end point, across an epoch boundary (10 imgs / batch 4 -> 2/epoch)."""
    ds = SyntheticVOC(n=10, seed=3)
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    kw = dict(batch_size=4, seed=5, epochs=3, train=True)
    full = list(batch_iterator(ds, cfg, **kw))
    assert len(full) == 6
    for k in (1, 3, 5):  # mid-epoch, boundary-crossing, last
        resumed = list(batch_iterator(ds, cfg, **kw, start_step=k))
        assert len(resumed) == len(full) - k  # absolute end point
        for a, b in zip(full[k:], resumed):
            assert a["id"] == b["id"]
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])
    # pad_remainder counts the padded tail batch as a step
    kw_pad = dict(batch_size=4, seed=5, epochs=2, train=True,
                  pad_remainder=True)
    full_pad = list(batch_iterator(ds, cfg, **kw_pad))
    assert len(full_pad) == 6
    resumed_pad = list(batch_iterator(ds, cfg, **kw_pad, start_step=4))
    assert [b["id"] for b in resumed_pad] == [b["id"] for b in full_pad[4:]]
    with pytest.raises(ValueError, match="start_step"):
        next(batch_iterator(ds, cfg, **kw, start_step=-1))


def test_batch_iterator_eval_order():
    ds = SyntheticVOC(n=6, seed=3, category="val")
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    batches = list(
        batch_iterator(ds, cfg, batch_size=3, seed=5, epochs=1, train=False)
    )
    assert [i for b in batches for i in b["id"]] == ds.ids


def test_batch_iterator_pad_remainder():
    """Eval padding: the tail batch keeps the static shape, pads with
    all-void labels (ignored by the confusion matrix) and '__pad__' ids."""
    ds = SyntheticVOC(n=7, seed=3, category="val")
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    batches = list(
        batch_iterator(ds, cfg, batch_size=3, seed=0, epochs=1, train=False,
                       drop_remainder=False, pad_remainder=True)
    )
    assert len(batches) == 3
    assert all(b["image"].shape == (3, 33, 33, 3) for b in batches)
    tail = batches[-1]
    assert tail["id"] == [ds.ids[6], "__pad__", "__pad__"]
    assert (tail["label"][1:] == 255).all()
    # every real image appears exactly once
    real = [i for b in batches for i in b["id"] if i != "__pad__"]
    assert real == ds.ids


def test_semi_supervised_flags_in_batches():
    ds = SyntheticVOC(n=12, seed=3, strong_fraction=0.5)
    assert 0 < ds.is_strong.sum() < 12
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    b = next(iter(batch_iterator(ds, cfg, batch_size=6, seed=5, epochs=1, train=True)))
    assert "is_strong" in b and b["is_strong"].shape == (6,)
    # all-weak dataset omits the key (pure weak supervision fast path)
    ds2 = SyntheticVOC(n=12, seed=3)
    b2 = next(iter(batch_iterator(ds2, cfg, batch_size=6, seed=5, epochs=1, train=True)))
    assert "is_strong" not in b2


def test_device_prefetcher_roundtrip_and_close():
    import jax

    from em_adapt_tpu.data.pipeline import DevicePrefetcher
    from em_adapt_tpu.parallel.mesh import make_mesh

    ds = SyntheticVOC(n=16, seed=3)
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    plan = make_mesh()
    host = list(batch_iterator(ds, cfg, batch_size=8, seed=5, epochs=1, train=True))
    pf = DevicePrefetcher(iter(host), plan, depth=2)
    dev = list(pf)
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        assert isinstance(d["image"], jax.Array)
        np.testing.assert_array_equal(np.asarray(d["image"]), h["image"])
        assert d["id"] == h["id"]

    # close() on an endless iterator stops the fill thread
    pf2 = DevicePrefetcher(
        batch_iterator(ds, cfg, batch_size=8, seed=5, epochs=None, train=True),
        plan, depth=2,
    )
    next(pf2)
    pf2.close()
    assert not pf2._thread.is_alive()


def test_device_prefetcher_propagates_source_errors():
    """Round-3 review finding: an exception in the source pipeline
    (corrupt image decode, shard failure) killed the fill thread, whose
    finally block delivered the normal end-of-data sentinel — the train
    loop stopped cleanly as if the dataset were exhausted and a partial
    run was checkpointed with exit code 0. The error must surface in the
    consumer."""
    from em_adapt_tpu.data.pipeline import DevicePrefetcher
    from em_adapt_tpu.parallel.mesh import make_mesh

    ds = SyntheticVOC(n=16, seed=3)
    cfg = DataConfig(input_size=(33, 33), num_workers=2)
    good = list(batch_iterator(ds, cfg, batch_size=8, seed=5, epochs=1,
                               train=True))

    def broken():
        yield good[0]
        raise OSError("truncated JPEG")

    pf = DevicePrefetcher(broken(), make_mesh(), depth=2)
    got = [next(pf)]
    with pytest.raises(RuntimeError, match="fill thread died") as ei:
        while True:
            got.append(next(pf))
    assert isinstance(ei.value.__cause__, OSError)
    assert len(got) == 1


def test_jpeg_decoder_parity_vs_tf():
    """Quantify PIL-vs-TF JPEG decode drift (SURVEY §7 flag; the reference
    decodes with tf.io.decode_image, reference dataset.py:118-124; our
    loader uses PIL). Measured on synthetic natural-ish JPEGs (q75):
    max |d| = 3, mean ~0.8 intensity levels — different IDCT roundings,
    not a bug. This bound is the noise floor under any future
    real-data mIoU comparison between the two pipelines."""
    tf = pytest.importorskip("tensorflow")
    import io

    from PIL import Image
    from scipy import ndimage

    rng = np.random.default_rng(0)
    for q in (75, 95):
        img = ndimage.gaussian_filter(rng.uniform(0, 255, (120, 160, 3)), (6, 6, 0))
        img[30:90, 40:120] = ndimage.gaussian_filter(
            rng.uniform(0, 255, (60, 80, 3)), (2, 2, 0)
        )
        buf = io.BytesIO()
        Image.fromarray(img.astype(np.uint8)).save(buf, format="JPEG", quality=q)
        data = buf.getvalue()
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.int32)
        tfd = tf.io.decode_image(data, channels=3).numpy().astype(np.int32)
        d = np.abs(pil - tfd)
        assert d.max() <= 6, (q, d.max())
        assert d.mean() <= 1.5, (q, d.mean())


def test_voc_strong_list(tmp_path):
    from em_adapt_tpu.data.pipeline import VOCSegmentation

    (tmp_path / "txt").mkdir()
    (tmp_path / "txt" / "train.txt").write_text("a\nb\nc\n")
    (tmp_path / "strong.txt").write_text("b\n")
    cfg = DataConfig(list_dir=str(tmp_path / "txt"), main_path="root")
    ds = VOCSegmentation(cfg, "train", strong_list=str(tmp_path / "strong.txt"))
    assert ds.is_strong.tolist() == [False, True, False]


def test_batch_iterator_rejects_dataset_smaller_than_batch():
    """n < batch_size with drop_remainder would yield NOTHING — and with
    epochs=None would spin forever inside the prefetcher (review
    finding): must raise up front instead."""
    ds = SyntheticVOC(n=4, num_classes=4, seed=0)
    cfg = DataConfig(input_size=(33, 33))
    with pytest.raises(ValueError, match="drop_remainder"):
        next(batch_iterator(ds, cfg, batch_size=8, seed=0, epochs=1))
    # pad_remainder makes the small dataset legal
    b = next(batch_iterator(ds, cfg, batch_size=8, seed=0, epochs=1,
                            train=False, drop_remainder=False,
                            pad_remainder=True))
    assert b["image"].shape[0] == 8


def test_batch_iterator_rejects_process_shard_without_static_batches():
    """process_shard slices each batch into equal per-process blocks; a
    partial final batch would slice unevenly (empty on some processes) —
    must raise instead of desyncing a multi-host run."""
    ds = SyntheticVOC(n=10, num_classes=4, seed=0)
    cfg = DataConfig(input_size=(33, 33))
    with pytest.raises(ValueError, match="process_shard"):
        next(batch_iterator(ds, cfg, batch_size=8, seed=0, epochs=1,
                            drop_remainder=False, pad_remainder=False,
                            process_shard=(0, 2)))
