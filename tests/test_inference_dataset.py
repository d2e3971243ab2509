"""Per-index InferenceDataset (reference GID15 map-style) geometry tests."""

import numpy as np

from cvcs_tpu.data.inference_dataset import InferenceDataset
from tests.conftest import PATCH, SCENE_SHAPE, NUM_SCENES


def test_len_and_indexing(gid15_root):
    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          border_correction=PATCH + 16)
    rows = SCENE_SHAPE[0] // PATCH
    cols = SCENE_SHAPE[1] // PATCH
    assert len(ds) == NUM_SCENES * rows * cols
    patch, mask, context, padded = ds[0]
    assert patch.shape == (PATCH, PATCH, 3)
    assert mask.shape == (PATCH, PATCH)
    assert context.shape == (PATCH, PATCH, 3)
    assert padded.shape == (PATCH + 16, PATCH + 16, 3)


def test_patch_matches_scene_pixels(gid15_root):
    from cvcs_tpu.data.reader import SceneDataset

    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          load_context=False)
    scenes = SceneDataset(str(gid15_root))
    img = scenes.load_image(1)
    cols = SCENE_SHAPE[1] // PATCH
    tile = 1 * cols + 2  # row 1, col 2 of scene 1
    idx = 1 * ds.grid.tiles_per_image + tile
    patch, mask, _, _ = ds[idx]
    np.testing.assert_array_equal(
        patch, img[PATCH:2 * PATCH, 2 * PATCH:3 * PATCH])
    np.testing.assert_array_equal(
        mask, scenes.load_index_mask(1)[PATCH:2 * PATCH,
                                        2 * PATCH:3 * PATCH])


def test_centered_window_contains_patch_at_center(gid15_root):
    bc = PATCH + 8
    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          border_correction=bc, load_context=False)
    patch, _, _, padded = ds[5]
    off = (bc - PATCH) // 2
    np.testing.assert_array_equal(
        padded[off:off + PATCH, off:off + PATCH], patch)


def test_bug_parity_window_anchors_bottom_right(gid15_root):
    bc = PATCH + 8
    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          border_correction=bc, load_context=False,
                          bug_parity=True)
    patch, _, _, padded = ds[5]
    margin = bc - PATCH
    np.testing.assert_array_equal(padded[margin:, margin:], patch)


def test_random_shift_does_not_crash(gid15_root):
    """Reference quirk 1: GID15 + random_shift=True raises TypeError."""
    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          random_shift=True, load_context=False)
    patch, mask, _, _ = ds[0]
    assert patch.shape == (PATCH, PATCH, 3)


def test_context_resize_matches_training_path(gid15_root):
    """Golden parity (round-1 Weak #5): the per-patch tool context and the
    device training-path context use ONE resize semantic — bilinear with
    antialias — and agree exactly on the same window."""
    import jax.numpy as jnp

    from cvcs_tpu.data.extract import extract_context, pad_scenes
    from cvcs_tpu.data.reader import SceneDataset

    ds = InferenceDataset(str(gid15_root), patch_size=PATCH)
    scenes = SceneDataset(str(gid15_root))
    img = scenes.load_image(0)

    cols = SCENE_SHAPE[1] // PATCH
    tile = 1 * cols + 1
    _, _, ctx_tool, _ = ds[tile]

    # training path: padded scene stack + vmapped device gather/resize
    stack = pad_scenes(img[None], PATCH)
    coords = jnp.array([[0, PATCH + PATCH, PATCH + PATCH]], jnp.int32)
    ctx_train = np.asarray(extract_context(jnp.asarray(stack), coords,
                                           PATCH))[0]
    np.testing.assert_array_equal(ctx_tool, ctx_train)


def test_shift_plus_context_every_tile_well_formed(gid15_root):
    """random_shift + load_context: padding must ADD the shift margin —
    max() under-padded the scene, so shifted corner tiles produced empty
    context slices (ZeroDivisionError in the resize) and edge tiles
    silently truncated/misaligned ones (round-3 review finding). Every
    tile of every scene must yield full-shape patch AND context."""
    ds = InferenceDataset(str(gid15_root), patch_size=PATCH,
                          border_correction=PATCH + 16,
                          random_shift=True, load_context=True, seed=0)
    for i in range(len(ds)):
        patch, mask, context, padded = ds[i]
        assert patch.shape == (PATCH, PATCH, 3), i
        assert context.shape == (PATCH, PATCH, 3), i
        assert padded.shape == (PATCH + 16, PATCH + 16, 3), i
