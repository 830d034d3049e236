"""PASCAL VOC 2012 (+SBD) dataset utilities.

Covers the reference's offline prep tool and palette helpers:
* ``convert_dataset`` — the one-shot conversion of VOC RGB masks and SBD
  .mat files into index-PNG ``SegmentationClassAug`` (reference
  convert.py:23-51).
* ``rgb_mask_to_index`` / ``index_to_rgb`` — exact-color palette matching
  (reference convert.py:8-21, dataset.py:79-105).
* ``read_split`` — id lists from ``pascal/txt/{split}.txt`` resolved to
  JPEG/PNG paths (reference dataset.py:25-46).
"""

from __future__ import annotations

import os

import numpy as np

#: The 21-color VOC class palette (class id -> RGB).
VOC_PALETTE: tuple[tuple[int, int, int], ...] = (
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0),
    (0, 0, 128), (128, 0, 128), (0, 128, 128), (128, 128, 128),
    (64, 0, 0), (192, 0, 0), (64, 128, 0), (192, 128, 0),
    (64, 0, 128), (192, 0, 128), (64, 128, 128), (192, 128, 128),
    (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
    (0, 64, 128),
)

VOC_CLASS_NAMES: tuple[str, ...] = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
    "tvmonitor",
)

IGNORE_LABEL = 255


def rgb_mask_to_index(rgb: np.ndarray, ignore: int = IGNORE_LABEL) -> np.ndarray:
    """RGB mask [H,W,3+] -> index mask [H,W] uint8 by exact palette match;
    unmatched pixels (e.g. the white void boundary) become ``ignore``."""
    out = np.full(rgb.shape[:2], ignore, dtype=np.uint8)
    rgb3 = rgb[:, :, :3]
    for idx, color in enumerate(VOC_PALETTE):
        hit = np.all(rgb3 == np.asarray(color, rgb3.dtype), axis=-1)
        out[hit] = idx
    return out


def index_to_rgb(
    label: np.ndarray,
    ignore: int = IGNORE_LABEL,
    ignore_color: tuple[int, int, int] = (255, 255, 255),
) -> np.ndarray:
    """Index mask [H,W] -> RGB [H,W,3] uint8 for visual inspection."""
    out = np.zeros(label.shape + (3,), dtype=np.uint8)
    for idx, color in enumerate(VOC_PALETTE):
        out[label == idx] = color
    out[label == ignore] = ignore_color
    return out


def read_split(
    list_dir: str,
    category: str,
    main_path: str,
    *,
    length: int | None = None,
) -> tuple[list[str], list[str], list[str]]:
    """Read ``{list_dir}/{category}.txt`` of bare ids; resolve image/label
    paths under ``main_path`` (JPEGImages / SegmentationClassAug).

    ``length`` truncates for smoke runs (reference dataset.py:38-42).
    """
    ids: list[str] = []
    with open(os.path.join(list_dir, f"{category}.txt")) as f:
        for line in f:
            line = line.strip()
            if line:
                ids.append(line)
    if length is not None:
        ids = ids[:length]
    imgs = [os.path.join(main_path, "JPEGImages", f"{i}.jpg") for i in ids]
    labels = [os.path.join(main_path, "SegmentationClassAug", f"{i}.png") for i in ids]
    return ids, imgs, labels


def convert_dataset(
    voc_seg_dir: str | None,
    sbd_cls_dir: str | None,
    out_dir: str,
    *,
    progress_every: int = 500,
    log=print,
) -> int:
    """Build ``SegmentationClassAug``: VOC RGB masks -> index PNGs, SBD
    ``GTcls.Segmentation`` matrices -> PNGs (reference convert.py:23-51).
    Palette-mode VOC PNGs (already indexed) are passed through unchanged.

    Returns the number of files written.
    """
    import glob

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    written = 0

    if voc_seg_dir:
        files = sorted(glob.glob(os.path.join(voc_seg_dir, "*.png")))
        for i, path in enumerate(files):
            if progress_every and i % progress_every == 0:
                log(f"voc: {i}/{len(files)}")
            img = Image.open(path)
            arr = np.asarray(img)
            if arr.ndim == 3 and arr.shape[2] >= 3:
                arr = rgb_mask_to_index(arr)
            elif arr.ndim == 3 and arr.shape[2] == 1:
                arr = arr[:, :, 0]  # single-channel 3-D: already indices
            elif arr.ndim != 2:
                # e.g. an LA (gray+alpha) PNG: neither an index mask nor
                # a palette-color mask — name the file instead of dying
                # mid-dataset on a numpy broadcast error inside
                # rgb_mask_to_index.
                raise ValueError(
                    f"{path}: unsupported mask layout {arr.shape} (PIL "
                    f"mode {img.mode!r}); expected a palette/grayscale "
                    "index mask or an RGB(A) palette-color mask"
                )
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(out_dir, os.path.basename(path))
            )
            written += 1

    if sbd_cls_dir:
        from scipy import io as scipy_io

        files = sorted(glob.glob(os.path.join(sbd_cls_dir, "*.mat")))
        for i, path in enumerate(files):
            if progress_every and i % progress_every == 0:
                log(f"sbd: {i}/{len(files)}")
            mat = scipy_io.loadmat(path)
            seg = mat["GTcls"]["Segmentation"][0][0].astype(np.uint8)
            stem = os.path.splitext(os.path.basename(path))[0]
            Image.fromarray(seg).save(os.path.join(out_dir, f"{stem}.png"))
            written += 1

    log(f"convert finished: {written} masks -> {out_dir}")
    return written
