"""Per-index patch access for inference — the reference's ``GID15``
map-style dataset (`dataset.py:36-102`).

The sliding-window engine (:mod:`cvcs_tpu.infer.engine`) is the fast path
(whole scenes in one jitted program); this class exists for the
reference's *per-patch* access pattern — tools, notebooks, spot checks:
``ds[i]`` returns ``(patch, index_mask, context, padded_patch)`` for
global row-major patch index ``i``, with a lazy single-scene cache
(`dataset.py:70-79`).

Differences from the reference, on purpose:

* scene shape is probed, not hardcoded to (6800, 7200) (quirk 8);
* ``random_shift=True`` works (the reference's crashes on a missing
  offset argument — quirk 1);
* the border-correction window is centered by default (quirk 2);
  ``bug_parity=True`` restores bottom-right anchoring.
"""

from __future__ import annotations

import numpy as np

from cvcs_tpu.data import geometry
from cvcs_tpu.data.reader import SceneDataset


class InferenceDataset:
    """Map-style per-patch view over a GID15-style root."""

    def __init__(
        self,
        root: str,
        patch_size: int = 224,
        border_correction: int | None = None,
        load_context: bool = True,
        random_shift: bool = False,
        shift_offset: int = 20,
        bug_parity: bool = False,
        seed: int = 0,
    ):
        self.scenes = SceneDataset(root)
        self.patch_size = patch_size
        self.border_correction = border_correction
        self.load_context = load_context
        self.random_shift = random_shift
        self.shift_offset = shift_offset
        self.bug_parity = bug_parity
        self.rng = np.random.default_rng(seed)
        self.grid = geometry.TileGrid(self.scenes.image_shape, patch_size)
        self._cache_idx: int | None = None
        self._cache: tuple | None = None

    def __len__(self) -> int:
        return len(self.scenes) * self.grid.tiles_per_image

    def _scene(self, scene_idx: int):
        """Lazy single-scene cache (`dataset.py:70-79`), pre-padded so all
        windows read zeros out of bounds."""
        if self._cache_idx != scene_idx:
            p = self.patch_size
            # margins ADD under random_shift: a shifted tile sits up to
            # shift_offset outside the grid and its context window (p) or
            # border window (bc-p) reaches beyond THAT — max() would let
            # corner-tile context slices go negative (empty numpy slice →
            # ZeroDivisionError in the resize) or silently truncate.
            # Same additive rule as ChunkLoader._pad.
            pad = max(p, (self.border_correction or p) - p)
            if self.random_shift:
                pad += self.shift_offset
            img = np.pad(self.scenes.load_image(scene_idx),
                         ((pad, pad), (pad, pad), (0, 0)))
            msk = np.pad(self.scenes.load_index_mask(scene_idx),
                         ((pad, pad), (pad, pad)))
            self._cache_idx = scene_idx
            self._cache = (img, msk, pad)
        return self._cache

    def __getitem__(self, index: int):
        tpi = self.grid.tiles_per_image
        scene_idx, tile_idx = divmod(index, tpi)
        img, msk, pad = self._scene(scene_idx)
        p = self.patch_size
        tly, tlx = self.grid.tile_origin(tile_idx)
        if self.random_shift:
            tly, tlx = geometry.random_shift(
                tly, tlx, self.shift_offset, self.rng)
        y, x = tly + pad, tlx + pad

        patch = img[y:y + p, x:x + p]
        mask = msk[y:y + p, x:x + p]

        context = None
        if self.load_context:
            from cvcs_tpu.data.extract import resize_context_host

            cy, cx, cs = geometry.context_window(y, x, p)
            big = img[cy:cy + cs, cx:cx + cs]
            # same bilinear+antialias semantics as the training path
            # (extract.extract_context) — one input distribution everywhere
            context = resize_context_host(big, p)

        padded = None
        if self.border_correction:
            wy, wx, ws = geometry.border_window(
                y, x, p, self.border_correction,
                centered=not self.bug_parity)
            padded = img[wy:wy + ws, wx:wx + ws]
        return patch, mask, context, padded
