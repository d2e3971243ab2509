"""Fused augmentation kernel vs numpy reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.ops.pallas_augment import fused_augment, random_fused_augment

B, P, C = 3, 32, 3


def _ref(images, flips, rots, factors, mean, std):
    out = []
    for i in range(images.shape[0]):
        x = images[i].astype(np.float32)   # (P, P, C)
        if flips[i] & 1:
            x = x[:, ::-1]
        if flips[i] & 2:
            x = x[::-1]
        x = np.rot90(x, k=int(rots[i]), axes=(0, 1))
        gray = (0.2989 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])
        # torchvision floors the integer grayscale before the mean and
        # truncates the blend back to uint8 (data/augment.py)
        m = np.floor(gray).mean()
        x = np.floor(np.clip(factors[i] * x + (1 - factors[i]) * m, 0, 255))
        x = (x - mean) / std
        out.append(x)
    return np.stack(out)


def _data(seed=0, c=C):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (B, P, P, c), np.uint8)
    flips = rng.integers(0, 4, B).astype(np.int32)
    rots = rng.integers(0, 4, B).astype(np.int32)
    factors = rng.uniform(0.4, 1.6, B).astype(np.float32)
    return images, flips, rots, factors


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_numpy_reference(seed):
    images, flips, rots, factors = _data(seed)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([2.0, 3.0, 4.0], np.float32)
    ours = np.asarray(fused_augment(
        jnp.asarray(images), jnp.asarray(flips), jnp.asarray(rots),
        jnp.asarray(factors), jnp.asarray(mean), jnp.asarray(std),
        interpret=True))
    ref = _ref(images, flips, rots, factors, mean, std)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_identity_transform_is_normalize_only():
    images, _, _, _ = _data(2)
    zeros = jnp.zeros((B,), jnp.int32)
    ones = jnp.ones((B,), jnp.float32)
    out = np.asarray(fused_augment(
        jnp.asarray(images), zeros, zeros, ones,
        jnp.zeros((C,)), jnp.ones((C,)), interpret=True))
    np.testing.assert_allclose(out, images.astype(np.float32), atol=1e-4)


def test_fused_dihedral_masks_follow_images():
    """Image dihedral (pallas) and mask dihedral (jnp) must agree: encode
    the mask into the image's channel 0 and compare transforms."""
    from cvcs_tpu.data.augment import AugmentConfig, fused_dihedral_augment

    rng = np.random.default_rng(5)
    masks = rng.integers(0, 16, (B, P, P)).astype(np.int32)
    images = np.repeat(masks[..., None], 3, axis=-1).astype(np.uint8)
    cfg = AugmentConfig(mode="fused", contrast=0.0)  # factor == 1: identity
    out_img, out_msk = fused_dihedral_augment(
        jnp.asarray(images), jnp.asarray(masks), jax.random.key(4), cfg)
    np.testing.assert_array_equal(
        np.asarray(out_img[..., 0]).astype(np.int32), np.asarray(out_msk))


def test_loader_fused_mode(gid15_root):
    from cvcs_tpu.data.augment import AugmentConfig
    from cvcs_tpu.data.loader import ChunkLoader
    from tests.conftest import PATCH

    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                         augment=AugmentConfig(mode="fused"),
                         load_context=False, seed=0)
    chunk = loader.get_chunk(0)
    assert chunk.images.dtype == jnp.uint8
    assert chunk.images.shape[1:] == (PATCH, PATCH, 3)


def test_random_wrapper_shapes_and_determinism():
    images, _, _, _ = _data(3)
    a = random_fused_augment(jnp.asarray(images), jax.random.key(0),
                             interpret=True)
    b = random_fused_augment(jnp.asarray(images), jax.random.key(0),
                             interpret=True)
    assert a.shape == (B, P, P, C) and a.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
