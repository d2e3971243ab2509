"""GID15 class labels and the RGB <-> label palette codec.

The 16-entry palette and label names mirror the reference's canonical tables
(`converters.py:5-22`, `utils.py:23-58`). Decoding runs on device as a single
gather from a (16, 3) palette table — the TPU replacement for the reference's
per-class boolean-masking loop (`converters.py:23-37`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LABELS = {
    0: "unlabeled",
    1: "industrial land",
    2: "urban residential",
    3: "rural residential",
    4: "traffic land",
    5: "paddy field",
    6: "irrigated cropland",
    7: "dry cropland",
    8: "garden plot",
    9: "arbor forest",
    10: "shrub land",
    11: "natural grassland",
    12: "artificial grassland",
    13: "river",
    14: "lake",
    15: "pond",
}

SHORT_LABELS = [
    "B", "IL", "UL", "RL", "TL", "PF", "IC", "DC",
    "GP", "AF", "SL", "NG", "AG", "R", "L", "P",
]

NUM_CLASSES = 16  # 15 land-cover classes + background (`utils.py:77`)

# label -> RGB, order matches `converters.py:5-22`.
PALETTE = np.array(
    [
        (0, 0, 0),        # 0 unlabeled
        (200, 0, 0),      # 1 industrial land
        (250, 0, 150),    # 2 urban residential
        (200, 150, 150),  # 3 rural residential
        (250, 150, 150),  # 4 traffic land
        (0, 200, 0),      # 5 paddy field
        (150, 250, 0),    # 6 irrigated cropland
        (150, 200, 150),  # 7 dry cropland
        (200, 0, 200),    # 8 garden plot
        (150, 0, 250),    # 9 arbor forest
        (150, 150, 250),  # 10 shrub land
        (250, 200, 0),    # 11 natural grassland
        (200, 200, 0),    # 12 artificial grassland
        (0, 0, 200),      # 13 river
        (0, 150, 200),    # 14 lake
        (0, 200, 250),    # 15 pond
    ],
    dtype=np.uint8,
)


class GID15Palette:
    """Label-mask <-> color-mask codec (capability of `converters.py`)."""

    num_classes = NUM_CLASSES

    def __init__(self):
        self.color_to_label = {tuple(int(c) for c in rgb): i
                               for i, rgb in enumerate(PALETTE)}

    def decode(self, mask):
        """Label mask (...,) int -> float RGB (..., 3) in [0, 1].

        Out-of-palette labels render white, matching the reference's
        ones-initialized output (`converters.py:33`, quirk 9).

        Implemented as one-hot x (16, 3) palette matmul — per-pixel table
        gathers are pathologically slow on TPU (same lesson as the CE loss,
        see ops/losses.py); the one-hot contraction streams on the MXU.
        """
        mask = jnp.asarray(mask)
        table = jnp.asarray(PALETTE, jnp.float32) / 255.0
        valid = (mask >= 0) & (mask < NUM_CLASSES)
        onehot = jax.nn.one_hot(
            jnp.clip(mask, 0, NUM_CLASSES - 1), NUM_CLASSES,
            dtype=jnp.float32)
        rgb = onehot @ table
        return jnp.where(valid[..., None], rgb, 1.0)

    def decode_u8(self, mask):
        """Label mask -> uint8 RGB (for PNG export)."""
        return jnp.round(self.decode(mask) * 255.0).astype(jnp.uint8)

    def decode_u8_host(self, mask) -> np.ndarray:
        """Host-side LUT decode: label mask (...,) -> uint8 RGB (..., 3).

        The export paths move the *uint8 label* canvas off-device
        (1 byte/px) and expand it through this 17-entry numpy LUT instead
        of transferring device-decoded RGB (3 bytes/px) — 3x less
        device->host traffic per scene, and the LUT is memory-bound-cheap
        next to the PNG encode that follows. Out-of-palette labels render
        white (`converters.py:33`, quirk 9), same as :meth:`decode`.
        """
        mask = np.asarray(mask)
        table = np.concatenate(
            [PALETTE, np.full((1, 3), 255, np.uint8)], axis=0)
        idx = np.where((mask >= 0) & (mask < NUM_CLASSES),
                       mask, NUM_CLASSES).astype(np.int64)
        return table[idx]

    def encode(self, rgb):
        """uint8 RGB color mask (..., 3) -> label mask (...,) int32.

        Unknown colors map to 0 (background).
        """
        rgb = np.asarray(rgb)
        flat = rgb.reshape(-1, 3).astype(np.int64)
        key = flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]
        pal = PALETTE.astype(np.int64)
        pal_key = pal[:, 0] * 65536 + pal[:, 1] * 256 + pal[:, 2]
        out = np.zeros(flat.shape[0], dtype=np.int32)
        for label, k in enumerate(pal_key):
            out[key == k] = label
        return out.reshape(rgb.shape[:-1])
