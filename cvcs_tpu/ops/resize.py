"""Resize / upsample ops with torch-matching semantics.

The reference leans on ``nn.Upsample(mode='bilinear')`` (align_corners=False)
inside the UNet decoder (`blocks.py:29-31`) and 4x bilinear upsampling in
SegFormer (`nets.py:348`). `jax.image.resize(method="bilinear")` implements
the same half-pixel-center convention, so these are thin, shape-polymorphic
wrappers that keep dtype (bf16 in, bf16 out — the interpolation weights are
exact in bf16's dynamic range for 2x upsampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_bilinear(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """NHWC bilinear upsample by an integer factor (align_corners=False)."""
    b, h, w, c = x.shape
    out = jax.image.resize(
        x.astype(jnp.float32), (b, h * scale, w * scale, c), method="bilinear"
    )
    return out.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize to an explicit (H, W)."""
    b, _, _, c = x.shape
    out = jax.image.resize(
        x.astype(jnp.float32), (b, size[0], size[1], c), method="bilinear"
    )
    return out.astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize (label masks; torchvision NEAREST_EXACT
    analogue used by the reference for mask resizing, `dataset.py:131-132`)."""
    shape = (x.shape[0], size[0], size[1]) + x.shape[3:]
    return jax.image.resize(x, shape, method="nearest")
