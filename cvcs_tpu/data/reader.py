"""Host-side scene raster reader.

Mirrors the reference's GID15 directory layout (`dataset.py:256-261`):

    <root>/Image__8bit_NirRGB/<stem>.<ext>          full scenes
    <root>/Annotation__index/<stem>_15label.png     per-pixel class labels
    <root>/Annotation__color/<stem>_15label.tif     palette-colored masks

The host only *decodes* scenes to numpy; all cropping, augmentation and
normalization happen on device (:mod:`cvcs_tpu.data.extract`), replacing the
reference's eager CPU patch materialization (`dataset.py:136-198`, its main
bottleneck per SURVEY §3.1).

Color masks are not read on the hot path: they are a pure function of the
index mask via the palette (:mod:`cvcs_tpu.data.palette`), so the framework
synthesizes them on device when needed (debug plots, exports).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

try:  # PIL is the baseline decoder; tests synthesize data through it too.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGE_DIR = "Image__8bit_NirRGB"
INDEX_DIR = "Annotation__index"
COLOR_DIR = "Annotation__color"
MASK_SUFFIX = "_15label"
RASTER_SUFFIXES = {".png", ".jpg", ".jpeg", ".tif", ".tiff"}
# formats the native C++ tier decodes (strict sub-format contracts inside;
# native.take returns None -> PIL fallback)
NATIVE_SUFFIXES = {".png", ".tif", ".tiff"}


class SceneDataset:
    """Lists and decodes the scenes of a GID15-style dataset root."""

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.image_dir = self.root / IMAGE_DIR
        self.index_dir = self.root / INDEX_DIR
        self.color_dir = self.root / COLOR_DIR
        if not self.image_dir.is_dir():
            raise FileNotFoundError(f"no {IMAGE_DIR} under {self.root}")
        # raster files only: a stray .DS_Store / swap file / subdirectory
        # would crash decode and shift scene<->mask index pairing
        self.image_paths = sorted(
            p for p in self.image_dir.iterdir()
            if p.is_file() and p.suffix.lower() in RASTER_SUFFIXES)
        if not self.image_paths:
            raise FileNotFoundError(f"no scenes under {self.image_dir}")
        self._shape: tuple[int, int] | None = None
        self._class_counts: dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.image_paths)

    def _mask_path(self, directory: Path, i: int, preferred: str) -> Path:
        """`<stem>_15label.<ext>` — the reference hardcodes .png for index
        masks and .tif for color masks (`dataset.py:216-217`); tolerate the
        other raster extensions when the preferred one is absent (GIS
        exports vary)."""
        stem = self.image_paths[i].stem + MASK_SUFFIX
        first = directory / (stem + preferred)
        if first.exists():
            return first
        for ext in sorted(RASTER_SUFFIXES - {preferred}):
            p = directory / (stem + ext)
            if p.exists():
                return p
        return first  # let the decode raise with the canonical name

    def index_mask_path(self, i: int) -> Path:
        # `<stem>_15label.png` (`dataset.py:216`)
        return self._mask_path(self.index_dir, i, ".png")

    def color_mask_path(self, i: int) -> Path:
        # `<stem>_15label.tif` (`dataset.py:217`)
        return self._mask_path(self.color_dir, i, ".tif")

    @property
    def image_shape(self) -> tuple[int, int]:
        """(H, W), probed from the first scene (`dataset.py:273-278`) —
        via a lazy header read, not a full raster decode (which also used
        to consume scene 0's prefetched cache entry)."""
        if self._shape is None:
            with Image.open(self.image_paths[0]) as im:
                self._shape = (im.height, im.width)
        return self._shape

    def _decode(self, path) -> np.ndarray:
        """Native C++ decoder (libpng/libtiff + background prefetch thread,
        :mod:`cvcs_tpu.native`) with PIL fallback."""
        if Path(path).suffix.lower() in NATIVE_SUFFIXES:
            from cvcs_tpu import native

            arr = native.take(path)
            if arr is not None:
                return arr
        return np.asarray(Image.open(path))

    def prefetch(self, scene_ids) -> None:
        """Queue background decodes of the given scenes' rasters so the
        next chunk's I/O overlaps device compute (no-op without the
        native library)."""
        from cvcs_tpu import native

        for i in scene_ids:
            if self.image_paths[i].suffix.lower() in NATIVE_SUFFIXES:
                native.prefetch(self.image_paths[i])
            p = self.index_mask_path(i)
            if p.suffix.lower() in NATIVE_SUFFIXES:
                native.prefetch(p)

    def load_image(self, i: int) -> np.ndarray:
        """Scene image as (H, W, C) uint8."""
        arr = self._decode(self.image_paths[i])
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr

    def load_index_mask(self, i: int) -> np.ndarray:
        """Index mask as (H, W) uint8. 3-channel masks collapse to channel 0
        (the reference's `mask_reshape`, `utils.py:557-567`)."""
        arr = self._decode(self.index_mask_path(i))
        if arr.ndim == 3:
            arr = arr[..., 0]
        return arr

    def load_color_mask(self, i: int) -> np.ndarray:
        return self._decode(self.color_mask_path(i))

    def class_counts(self, num_classes: int) -> np.ndarray:
        """Per-class pixel counts over all index masks (`dataset.py:346-358`),
        cached like the reference's ``self.count`` — per instance (an
        lru_cache on the method would pin every SceneDataset alive for
        the process lifetime)."""
        if num_classes in self._class_counts:
            return self._class_counts[num_classes]
        counts = np.zeros(num_classes, dtype=np.int64)
        for i in range(len(self)):
            mask = self.load_index_mask(i)
            counts += np.bincount(
                mask.reshape(-1), minlength=num_classes
            )[:num_classes]
        self._class_counts[num_classes] = counts
        return counts


def class_weights(counts: np.ndarray, ignore_background: bool = False) -> np.ndarray:
    """Class-balanced weights w_j = total / (bins * count_j)
    (`dataset.py:360-384`). Zero-count classes get weight 0; with
    ``ignore_background`` class 0 is excluded from the statistics and given
    weight 0."""
    counts = np.asarray(counts, dtype=np.float64)
    active = counts[1:] if ignore_background else counts
    total = active.sum()
    bins = len(active)
    w = np.where(active > 0, total / (bins * np.maximum(active, 1)), 0.0)
    if ignore_background:
        w = np.concatenate([[0.0], w])
    return w.astype(np.float32)


def class_priors(counts: np.ndarray) -> np.ndarray:
    """total / count_j (`dataset.py:386-388`)."""
    counts = np.asarray(counts, dtype=np.float64)
    return (counts.sum() / counts).astype(np.float32)
