"""Device-resident augmentation.

The reference augments on the host CPU with torchvision v2 transforms at
chunk-construction time (`dataset.py:158-168`, presets at `utils.py:509-524`):

* image-only: ``ColorJitter(contrast=0.6)`` then ``GaussianBlur(5, sigma in
  [0.01, 20])``;
* joint image+mask: ``RandomRotation(30)`` applied to a channel-concatenated
  (image, index mask, color mask) tensor — one angle per patch, torch's
  default NEAREST interpolation, zero fill.

Here the same semantics run as jitted JAX ops on the accelerator, vmapped
over the patch batch with per-patch PRNG draws. Inputs and outputs are uint8
(the reference also keeps uint8 through its transform stack; the float cast
happens in the train step, `train.py:121`), computed internally in f32.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Matches the reference's `load_basic_transforms` preset.

    ``mode="reference"`` reproduces the torchvision preset (contrast jitter
    + gaussian blur + free-angle joint rotation). ``mode="fused"`` runs the
    Pallas one-pass dihedral preset instead (flip/rot90 + contrast jitter,
    :mod:`cvcs_tpu.ops.pallas_augment`) with the label masks transformed by
    the same draws — the TPU-native fast path (0.32 ms / 64 patches
    measured on v5e vs several fused XLA kernels for the reference preset).
    """

    contrast: float = 0.6
    blur_kernel: int = 5
    blur_sigma: tuple[float, float] = (0.01, 20.0)
    rotation_degrees: float = 30.0
    mode: str = "reference"   # "reference" | "fused"


def adjust_contrast(image: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """torchvision ``adjust_contrast``: blend with the mean of the grayscale
    image. ``image`` is (H, W, C) f32 in [0, 255]; the grayscale mean uses the
    ITU-R 601 weights over the first 3 bands."""
    rgb = image[..., :3]
    gray = 0.2989 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    # torchvision FLOORS the integer-image grayscale before the mean
    # (v2 `grayscale_image.floor_()`; v1 truncates via .to(uint8)) and
    # truncates the blended result back to uint8 — round() here diverged
    # by up to one gray level per pixel
    mean = jnp.mean(jnp.floor(gray))
    out = factor * image + (1.0 - factor) * mean
    return jnp.floor(jnp.clip(out, 0.0, 255.0))


def gaussian_blur(image: jnp.ndarray, sigma: jnp.ndarray, kernel: int = 5) -> jnp.ndarray:
    """Separable k-tap Gaussian blur with reflect padding, (H, W, C) f32."""
    half = kernel // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    k = k / jnp.sum(k)

    def conv_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (half, half)
        padded = jnp.pad(img, pad, mode="reflect")
        out = jnp.zeros_like(img)
        for i in range(kernel):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + k[i] * padded[tuple(sl)]
        return out

    return conv_axis(conv_axis(image, 0), 1)


def rotate_nearest(image: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) by ``angle_deg`` CCW about the center, nearest
    neighbor, zero fill — torch ``RandomRotation``'s default semantics."""
    h, w = image.shape[0], image.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    a = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(a), jnp.sin(a)
    # Inverse mapping: output pixel (y, x) samples source rotated by -angle.
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    gathered = image[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


def fused_dihedral_augment(
    images: jnp.ndarray,   # (B, p, p, C) uint8
    masks: jnp.ndarray,    # (B, p, p) integer labels
    key: jax.Array,
    config: AugmentConfig = AugmentConfig(mode="fused"),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-pass Pallas dihedral + contrast preset; label masks get the
    identical geometric transform (pure jnp — int labels, tiny traffic)."""
    from cvcs_tpu.ops.pallas_augment import fused_augment

    b = images.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    flips = jax.random.randint(k1, (b,), 0, 4)
    rots = jax.random.randint(k2, (b,), 0, 4)
    lo = max(0.0, 1.0 - config.contrast)
    factors = jax.random.uniform(k3, (b,), minval=lo,
                                 maxval=1.0 + config.contrast)
    c = images.shape[-1]
    interpret = jax.default_backend() != "tpu"
    out = fused_augment(images, flips, rots, factors,
                        jnp.zeros((c,)), jnp.ones((c,)),
                        interpret=interpret)
    out_u8 = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    def one_mask(m, f, r):
        m = jax.lax.cond(f & 1, lambda a: a[:, ::-1], lambda a: a, m)
        m = jax.lax.cond((f >> 1) & 1, lambda a: a[::-1], lambda a: a, m)
        return jax.lax.switch(
            jnp.clip(r, 0, 3),
            [lambda a: a,
             lambda a: jnp.rot90(a, 1),
             lambda a: jnp.rot90(a, 2),
             lambda a: jnp.rot90(a, 3)],
            m)

    masks_out = jax.vmap(one_mask)(masks, flips, rots)
    return out_u8, masks_out


@partial(jax.jit, static_argnames=("config",))
def augment_batch(
    images: jnp.ndarray,   # (B, p, p, C) uint8
    masks: jnp.ndarray,    # (B, p, p) integer labels
    key: jax.Array,
    config: AugmentConfig = AugmentConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the full reference preset to a batch on device.

    Returns (images uint8, masks) with the joint rotation applied to both.
    """
    b = images.shape[0]
    k_contrast, k_sigma, k_angle = jax.random.split(key, 3)
    lo = max(0.0, 1.0 - config.contrast)
    factors = jax.random.uniform(
        k_contrast, (b,), minval=lo, maxval=1.0 + config.contrast)
    sigmas = jax.random.uniform(
        k_sigma, (b,), minval=config.blur_sigma[0], maxval=config.blur_sigma[1])
    angles = jax.random.uniform(
        k_angle, (b,),
        minval=-config.rotation_degrees, maxval=config.rotation_degrees)

    def one(img_u8, mask, factor, sigma, angle):
        img = img_u8.astype(jnp.float32)
        img = adjust_contrast(img, factor)
        img = gaussian_blur(img, sigma, config.blur_kernel)
        img = rotate_nearest(img, angle)
        mask = rotate_nearest(mask[..., None].astype(jnp.float32), angle)[..., 0]
        return (
            jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8),
            mask.astype(masks.dtype),
        )

    return jax.vmap(one)(images, masks, factors, sigmas, angles)
