"""Pure tile-grid geometry.

All patch addressing in the framework goes through these functions, which
reproduce the reference's row-major tile math (`dataset.py:136-143` for
training chunks, `dataset.py:81-86` for inference) as pure, trivially
testable integer functions.

Windows that matter:

* **tile** — the p x p patch at row-major ``tile_idx``.
* **context** — a 3p x 3p window whose top-left is (tly - p, tlx - p)
  (`dataset.py:11-16`), later resized to p x p.
* **border-correction** — a bc x bc window around the tile used to kill
  tiling seams at inference. The reference anchors it so the true patch sits
  at the *bottom-right* (the full margin bc - p is subtracted from the
  top-left, `dataset.py:18-23`) while the output is center-cropped
  (`utils.py:146,154`), baking a systematic (bc - p)/2 offset into its
  figures (SURVEY appendix quirk 2). We center the window by default and keep
  ``centered=False`` for bug-parity with the reference.

Out-of-range coordinates are legal: crops are taken from zero-padded scenes
(torchvision's ``crop`` zero-pads out-of-image regions, which the device-side
extractor replicates by pre-padding the scene).
"""

from __future__ import annotations

import dataclasses

import numpy as np

#: Patch sizes the reference "supports or recommends" (`dataset.py:268`).
REFERENCE_PATCH_SIZES = (224, 256, 512)


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Row-major tiling of an H x W scene into p x p tiles (`dataset.py:125`)."""

    image_shape: tuple[int, int]  # (H, W)
    patch_size: int

    @property
    def rows(self) -> int:
        return self.image_shape[0] // self.patch_size

    @property
    def cols(self) -> int:
        return self.image_shape[1] // self.patch_size

    @property
    def tiles_per_image(self) -> int:
        return self.rows * self.cols

    def tile_origin(self, tile_idx: int | np.ndarray) -> tuple:
        """(tly, tlx) of row-major ``tile_idx`` (`dataset.py:139-140`)."""
        row = tile_idx // self.cols
        col = tile_idx % self.cols
        return row * self.patch_size, col * self.patch_size

    def origins(self) -> np.ndarray:
        """All tile origins, shape (tiles_per_image, 2), row-major order."""
        idx = np.arange(self.tiles_per_image)
        tly, tlx = self.tile_origin(idx)
        return np.stack([tly, tlx], axis=-1)


def context_window(tly, tlx, patch_size: int):
    """Top-left and size of the 3p x 3p context window (`dataset.py:11-16`)."""
    return tly - patch_size, tlx - patch_size, 3 * patch_size


def border_window(tly, tlx, patch_size: int, border_correction: int,
                  centered: bool = True):
    """Top-left and size of the bc x bc border-corrected window.

    ``centered=True`` places the true patch at the center of the window so
    the center-crop of the network output aligns exactly with the tile.
    ``centered=False`` reproduces the reference's bottom-right anchoring
    (`dataset.py:18-23`) for bit-parity with its published figures.
    """
    margin = border_correction - patch_size
    off = margin // 2 if centered else margin
    return tly - off, tlx - off, border_correction


def random_shift(tly, tlx, offset: int, rng: np.random.Generator):
    """Uniform +-offset jitter of a tile origin (`dataset.py:25-26`).

    The training loader uses offset=20 (`dataset.py:143`).
    """
    return (
        tly + rng.integers(-offset, offset + 1),
        tlx + rng.integers(-offset, offset + 1),
    )


def chunk_partition(indices: list[int], chunk_size: int) -> list[list[int]]:
    """Partition scene indices into consecutive fixed-size chunks
    (`dataset.py:331-332`). Requires len(indices) % chunk_size == 0, as the
    reference asserts (`dataset.py:269`)."""
    if len(indices) % chunk_size != 0:
        raise ValueError(
            f"number of scenes ({len(indices)}) not divisible by chunk size "
            f"({chunk_size})"
        )
    return [
        list(indices[off * chunk_size:(off + 1) * chunk_size])
        for off in range(len(indices) // chunk_size)
    ]
