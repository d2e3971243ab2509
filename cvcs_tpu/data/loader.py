"""Chunked training/eval data driver.

Capability-parity with the reference's `Loader`/`IterableChunk`
(`dataset.py:105-388`), re-architected TPU-first:

* The host only decodes the chunk's scenes once (PIL -> numpy uint8) and
  ships them to HBM; every crop/resize/augmentation happens on device
  (:mod:`cvcs_tpu.data.extract`, :mod:`cvcs_tpu.data.augment`).
* A chunk materializes all of its patches into contiguous uint8 device
  buffers (tile patches + optional ``random_tps`` multi-scale patches +
  optional context windows), then serves shuffled fixed-shape batches as
  device-side gathers — no per-batch host work, no retracing.
* Randomness is explicit: scene shuffling / shifts / sampling use a seeded
  `numpy.random.Generator`; device augmentation uses `jax.random` keys.

Reference semantics kept: row-major tile addressing, per-epoch scene
shuffling into fixed-size chunks (`dataset.py:289-291,331-332`), +-20 px
random shift (`dataset.py:143`), 3p x 3p context resized to p
(`dataset.py:152-156`), ``random_tps`` appended multi-scale crops that skip
the photometric/rotation transforms (`dataset.py:173-198`), class-balanced
weight computation over the full dataset (`dataset.py:346-384`), and
`specify()` debug restriction (`dataset.py:337-344`).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.data import extract, geometry, reader
from cvcs_tpu.data.augment import AugmentConfig, augment_batch

SHIFT_OFFSET = 20  # `dataset.py:143`
# Slab size for materializing patches (bounds peak VMEM/HBM of one gather).
_SLAB = 256


@dataclasses.dataclass
class Batch:
    """One training/eval micro-batch (device arrays, NHWC uint8 imagery)."""

    image: jnp.ndarray            # (B, p, p, C) uint8
    mask: jnp.ndarray             # (B, p, p) int32
    context: jnp.ndarray | None   # (B, p, p, C) uint8 or None
    valid: jnp.ndarray | None = None  # (B,) bool — False for padding samples


class DeviceChunk:
    """A chunk's patches, materialized on device."""

    def __init__(
        self,
        images: jnp.ndarray,          # (B, p, p, C) uint8
        masks: jnp.ndarray,           # (B, p, p) int32
        contexts: jnp.ndarray | None,
    ):
        self.images = images
        self.masks = masks
        self.contexts = contexts

    def __len__(self) -> int:
        return int(self.images.shape[0])

    def batches(
        self, batch_size: int, drop_last: bool = True,
        pad_tail: bool = True,
    ) -> Iterator[Batch]:
        """Fixed-shape batches. With ``drop_last=False`` the final partial
        batch is padded by repeating sample 0 and flagged via ``valid``
        (for masked accumulation, e.g. confusion folds), or — with
        ``pad_tail=False`` — yielded at its natural size, exactly like the
        reference DataLoader's final partial batch (`train.py:110`); the
        tail size is constant per run so it costs one extra cached
        compile."""
        n = len(self)
        full = n // batch_size
        for b in range(full):
            sl = slice(b * batch_size, (b + 1) * batch_size)
            yield Batch(
                image=self.images[sl],
                mask=self.masks[sl],
                context=None if self.contexts is None else self.contexts[sl],
                valid=None,
            )
        rem = n - full * batch_size
        if rem and not drop_last:
            if pad_tail:
                yield self._tail_batch(batch_size, full, rem)
            else:
                sl = slice(full * batch_size, n)
                yield Batch(
                    image=self.images[sl],
                    mask=self.masks[sl],
                    context=(None if self.contexts is None
                             else self.contexts[sl]),
                    valid=None,
                )

    def _tail_batch(self, batch_size: int, full: int, rem: int) -> Batch:
        n = len(self)
        idx = np.concatenate(
            [np.arange(full * batch_size, n),
             np.zeros(batch_size - rem, dtype=np.int64)]
        )
        valid = jnp.asarray(np.arange(batch_size) < rem)
        return Batch(
            image=jnp.take(self.images, idx, axis=0),
            mask=jnp.take(self.masks, idx, axis=0),
            context=None if self.contexts is None
            else jnp.take(self.contexts, idx, axis=0),
            valid=valid,
        )

    def stacked_batches(self, batch_size: int, k: int):
        """(K, B, ...) stacks for the compiled multi-step train path —
        zero-copy reshapes of the contiguous chunk buffers. Yields
        ``(images, masks, contexts, n_micro)`` tuples covering the first
        ``(len // (B*K)) * B*K`` samples; callers run the remaining
        micro-batches through the single-step path."""
        n = len(self)
        span = batch_size * k
        full = n // span
        for b in range(full):
            sl = slice(b * span, (b + 1) * span)
            images = self.images[sl].reshape(
                k, batch_size, *self.images.shape[1:])
            masks = self.masks[sl].reshape(
                k, batch_size, *self.masks.shape[1:])
            ctx = (jnp.zeros((k, 1), jnp.uint8) if self.contexts is None
                   else self.contexts[sl].reshape(
                       k, batch_size, *self.contexts.shape[1:]))
            yield images, masks, ctx, k


class ChunkLoader:
    """Drives chunked loading of a GID15-style dataset root."""

    def __init__(
        self,
        root: str,
        chunk_size: int = 2,
        patch_size: int = 224,
        random_shift: bool = False,
        augment: AugmentConfig | None = None,
        load_context: bool = True,
        in_channels: int = 3,
        seed: int = 0,
        strict_patch_sizes: bool = False,
    ):
        self.dataset = reader.SceneDataset(root)
        self.patch_size = patch_size
        self.chunk_size = chunk_size
        self.random_shift = random_shift
        self.augment = augment
        self.load_context = load_context
        self.in_channels = in_channels
        self.rng = np.random.default_rng(seed)
        self._aug_key = jax.random.key(seed ^ 0x5EED)

        if strict_patch_sizes and patch_size not in geometry.REFERENCE_PATCH_SIZES:
            raise ValueError(
                f"patch size {patch_size} not in {geometry.REFERENCE_PATCH_SIZES}"
            )

        self.image_shape = self.dataset.image_shape
        self.grid = geometry.TileGrid(self.image_shape, patch_size)
        self.idxs = list(range(len(self.dataset)))
        self.chunks = geometry.chunk_partition(self.idxs, chunk_size)

    # -- reference-parity surface ------------------------------------------
    @property
    def tpi(self) -> int:
        return self.grid.tiles_per_image

    def __len__(self) -> int:
        return len(self.chunks)

    def shuffle(self) -> None:
        """Reshuffle scene -> chunk assignment (`dataset.py:289-291`)."""
        self.rng.shuffle(self.idxs)
        self.chunks = geometry.chunk_partition(self.idxs, self.chunk_size)

    def specify(self, targets: list[int]) -> None:
        """Restrict to the given positions (debug; `dataset.py:337-344`)."""
        self.idxs = [self.idxs[i] for i in targets]
        self.chunks = geometry.chunk_partition(
            self.idxs, min(self.chunk_size, len(self.idxs)))

    def class_weights(self, num_classes: int, ignore_background: bool = False):
        counts = self.dataset.class_counts(num_classes)
        return reader.class_weights(counts, ignore_background)

    def class_priors(self, num_classes: int):
        return reader.class_priors(self.dataset.class_counts(num_classes))

    # -- chunk materialization ---------------------------------------------
    def _pad(self) -> int:
        # paddings ADD when both features are on: a shifted tile sits up
        # to SHIFT_OFFSET outside the grid, and its context window
        # reaches another patch_size beyond that — max() of the two
        # would let edge-tile context windows clamp inside
        # lax.dynamic_slice and silently misalign
        pad = self.patch_size if self.load_context else 0
        if self.random_shift:
            pad += SHIFT_OFFSET + 12
        return pad

    def _load_scene_stack(self, scene_ids: list[int], pad: int):
        imgs, msks = [], []
        for i in scene_ids:
            img = self.dataset.load_image(i)[..., : self.in_channels]
            imgs.append(img)
            msks.append(self.dataset.load_index_mask(i))
        images = extract.pad_scenes(np.stack(imgs), pad)
        masks = extract.pad_scenes(np.stack(msks), pad)
        return jnp.asarray(images), jnp.asarray(masks)

    def _next_aug_key(self):
        self._aug_key, key = jax.random.split(self._aug_key)
        return key

    def get_chunk(
        self,
        c: int,
        random_tps: list[tuple[int, float]] | None = None,
        shuffle_patches: bool = True,
    ) -> DeviceChunk:
        """Materialize chunk ``c`` on device (reference
        `Loader.get_iterable_chunk`, `dataset.py:293-313`)."""
        scene_ids = self.chunks[c]
        # queue background decode of the NEXT chunk's rasters (native C++
        # prefetch thread) so its I/O overlaps this chunk's device compute
        if c + 1 < len(self.chunks):
            self.dataset.prefetch(self.chunks[c + 1])
        pad = self._pad()
        images, masks = self._load_scene_stack(scene_ids, pad)

        p = self.patch_size
        origins = self.grid.origins()  # (tpi, 2)
        n_scenes = len(scene_ids)
        coords = np.concatenate(
            [
                np.concatenate(
                    [np.full((self.tpi, 1), s), origins], axis=1)
                for s in range(n_scenes)
            ]
        ).astype(np.int32)
        if self.random_shift:
            coords[:, 1:] += self.rng.integers(
                -SHIFT_OFFSET, SHIFT_OFFSET + 1, size=(len(coords), 2)
            ).astype(np.int32)
        coords[:, 1:] += pad

        img_parts, msk_parts, ctx_parts = [], [], []
        for s in range(0, len(coords), _SLAB):
            cc = jnp.asarray(coords[s:s + _SLAB])
            img_parts.append(extract.slice_windows(images, cc, p))
            msk_parts.append(extract.slice_windows(masks, cc, p))
            if self.load_context:
                ctx_parts.append(extract.extract_context(images, cc, p))

        patch_imgs = jnp.concatenate(img_parts)
        patch_msks = jnp.concatenate(msk_parts)
        contexts = jnp.concatenate(ctx_parts) if self.load_context else None

        if self.augment is not None:
            if getattr(self.augment, "mode", "reference") == "fused":
                from cvcs_tpu.data.augment import fused_dihedral_augment
                patch_imgs, patch_msks = fused_dihedral_augment(
                    patch_imgs, patch_msks, self._next_aug_key(),
                    self.augment)
            else:
                patch_imgs, patch_msks = augment_batch(
                    patch_imgs, patch_msks, self._next_aug_key(),
                    self.augment)

        # random_tps multi-scale crops (skip the photometric/rotation
        # transforms, as the reference does — `dataset.py:173-198`).
        if random_tps:
            h, w = self.image_shape
            n_tiles = len(coords)
            for aug_size, pct in random_tps:
                n_extra = int(pct * n_tiles)
                if n_extra == 0:
                    continue
                if aug_size >= min(h, w):
                    # the reference dies the same way (randint(0, <0),
                    # `dataset.py:180-181`) — fail with a clear message
                    raise ValueError(
                        f"random_tps size {aug_size} must be smaller "
                        f"than the scene ({h}x{w})")
                sc = self.rng.integers(0, n_scenes, size=(n_extra, 1))
                # origin range [0, h-1-aug_size] — exactly the
                # reference's `random.randint(0, h-1-aug_size)`
                # (`dataset.py:180-181`, inclusive)
                ys = self.rng.integers(0, h - aug_size, size=(n_extra, 1))
                xs = self.rng.integers(0, w - aug_size, size=(n_extra, 1))
                tcoords = np.concatenate([sc, ys + pad, xs + pad], axis=1)
                tcoords = jnp.asarray(tcoords.astype(np.int32))
                timg, tmsk = extract.extract_resized(
                    images, masks, tcoords, aug_size, p)
                patch_imgs = jnp.concatenate([patch_imgs, timg])
                patch_msks = jnp.concatenate([patch_msks, tmsk])
                if self.load_context:
                    # the reference computes tps context with the FIXED
                    # patch-size window at the crop origin, NOT a
                    # 3*aug_size surround (`dataset.py:192` passes
                    # self.p) — geometric inconsistency kept as parity
                    tctx = extract.extract_context(images, tcoords, p)
                    contexts = jnp.concatenate([contexts, tctx])

        if shuffle_patches:
            perm = jnp.asarray(self.rng.permutation(patch_imgs.shape[0]))
            patch_imgs = jnp.take(patch_imgs, perm, axis=0)
            patch_msks = jnp.take(patch_msks, perm, axis=0)
            if contexts is not None:
                contexts = jnp.take(contexts, perm, axis=0)

        return DeviceChunk(patch_imgs, patch_msks.astype(jnp.int32), contexts)
