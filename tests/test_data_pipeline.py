import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.data import extract, reader
from cvcs_tpu.data.augment import AugmentConfig, augment_batch
from cvcs_tpu.data.loader import ChunkLoader


def test_scene_dataset_listing(gid15_root):
    ds = reader.SceneDataset(gid15_root)
    assert len(ds) == 4
    assert ds.image_shape == (96, 128)
    img = ds.load_image(0)
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8
    mask = ds.load_index_mask(0)
    assert mask.shape == (96, 128)
    assert mask.max() < 16


def test_class_weights_formula():
    counts = np.array([10, 0, 30, 60], dtype=np.int64)
    w = reader.class_weights(counts)
    total, bins = 100.0, 4
    np.testing.assert_allclose(
        w, [total / (bins * 10), 0.0, total / (bins * 30), total / (bins * 60)],
        rtol=1e-6)
    wib = reader.class_weights(counts, ignore_background=True)
    assert wib[0] == 0.0
    total, bins = 90.0, 3
    np.testing.assert_allclose(
        wib[1:], [0.0, total / (bins * 30), total / (bins * 60)], rtol=1e-6)


def test_slice_windows_matches_numpy(gid15_root):
    ds = reader.SceneDataset(gid15_root)
    stack = np.stack([ds.load_image(i) for i in range(2)])
    padded = extract.pad_scenes(stack, 8)
    coords = jnp.array([[0, 8, 8], [1, 16 + 8, 32 + 8]], dtype=jnp.int32)
    out = np.asarray(extract.slice_windows(jnp.asarray(padded), coords, 16))
    np.testing.assert_array_equal(out[0], stack[0][:16, :16])
    np.testing.assert_array_equal(out[1], stack[1][16:32, 32:48])


def test_pad_zero_fill_out_of_image(gid15_root):
    ds = reader.SceneDataset(gid15_root)
    stack = np.stack([ds.load_image(0)])
    padded = extract.pad_scenes(stack, 8)
    coords = jnp.array([[0, 0, 0]], dtype=jnp.int32)  # window starts in pad
    out = np.asarray(extract.slice_windows(jnp.asarray(padded), coords, 16))
    assert (out[0][:8, :8] == 0).all()
    np.testing.assert_array_equal(out[0][8:, 8:], stack[0][:8, :8])


def test_context_shape_and_downscale(gid15_root):
    ds = reader.SceneDataset(gid15_root)
    stack = extract.pad_scenes(np.stack([ds.load_image(0)]), 32)
    coords = jnp.array([[0, 32, 32]], dtype=jnp.int32)
    ctx = extract.extract_context(jnp.asarray(stack), coords, 32)
    assert ctx.shape == (1, 32, 32, 3)
    assert ctx.dtype == jnp.uint8


def test_extract_resized_mask_is_nearest(gid15_root):
    ds = reader.SceneDataset(gid15_root)
    imgs = jnp.asarray(np.stack([ds.load_image(0)]))
    msks = jnp.asarray(np.stack([ds.load_index_mask(0)]))
    coords = jnp.array([[0, 0, 0]], dtype=jnp.int32)
    img, msk = extract.extract_resized(imgs, msks, coords, 64, 32)
    assert img.shape == (1, 32, 32, 3)
    assert msk.shape == (1, 32, 32)
    # nearest resize must not invent labels
    assert set(np.unique(np.asarray(msk))) <= set(np.unique(np.asarray(msks)))


def test_augment_batch_shapes_and_dtypes():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    msks = jnp.asarray(rng.integers(0, 16, (4, 32, 32), dtype=np.int32))
    out_i, out_m = augment_batch(imgs, msks, jax.random.key(0), AugmentConfig())
    assert out_i.shape == imgs.shape and out_i.dtype == jnp.uint8
    assert out_m.shape == msks.shape and out_m.dtype == msks.dtype
    # rotation must not invent labels
    assert set(np.unique(np.asarray(out_m))) <= set(
        np.unique(np.asarray(msks))) | {0}


def test_augment_rotation_is_joint():
    # a distinctive stripe in both image and mask must stay aligned
    imgs = np.zeros((1, 33, 33, 3), dtype=np.uint8)
    msks = np.zeros((1, 33, 33), dtype=np.int32)
    imgs[0, 16, :, :] = 255
    msks[0, 16, :] = 5
    cfg = AugmentConfig(contrast=0.0, blur_sigma=(0.01, 0.011),
                        rotation_degrees=30.0)
    out_i, out_m = augment_batch(
        jnp.asarray(imgs), jnp.asarray(msks), jax.random.key(1), cfg)
    bright = np.asarray(out_i)[0, :, :, 0] > 100
    labeled = np.asarray(out_m)[0] == 5
    # overlap of the rotated stripe in image vs mask should be near-total
    inter = (bright & labeled).sum()
    union = (bright | labeled).sum()
    assert inter / union > 0.8


def test_chunk_loader_end_to_end(gid15_root):
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=32,
                         load_context=True, seed=0)
    assert loader.tpi == (96 // 32) * (128 // 32)  # 3*4 = 12
    assert len(loader) == 2
    chunk = loader.get_chunk(0)
    assert len(chunk) == 2 * 12
    batches = list(chunk.batches(8))
    assert len(batches) == 3
    b = batches[0]
    assert b.image.shape == (8, 32, 32, 3) and b.image.dtype == jnp.uint8
    assert b.mask.shape == (8, 32, 32) and b.mask.dtype == jnp.int32
    assert b.context.shape == (8, 32, 32, 3)


def test_chunk_loader_random_tps(gid15_root):
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=32,
                         load_context=False, seed=0)
    chunk = loader.get_chunk(0, random_tps=[(64, 0.5)])
    assert len(chunk) == 24 + 12
    assert chunk.contexts is None


def test_chunk_loader_shuffle_and_specify(gid15_root):
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=32, seed=3)
    before = [list(c) for c in loader.chunks]
    loader.shuffle()
    assert sorted(sum(loader.chunks, [])) == [0, 1, 2, 3]
    loader.specify([0, 1])
    assert len(sum(loader.chunks, [])) == 2
    _ = before


def test_partial_batch_padding(gid15_root):
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=32,
                         load_context=False, seed=0)
    chunk = loader.get_chunk(0)
    batches = list(chunk.batches(5, drop_last=False))
    assert len(batches) == 5
    last = batches[-1]
    assert last.image.shape[0] == 5
    assert np.asarray(last.valid).sum() == 24 - 4 * 5


def test_strict_patch_sizes_ctor(gid15_root):
    with pytest.raises(ValueError):
        ChunkLoader(str(gid15_root), chunk_size=2, patch_size=32,
                    strict_patch_sizes=True)


def test_shift_plus_context_padding_is_additive(gid15_root, monkeypatch):
    """random_shift + load_context: the scene padding must cover a
    SHIFTED tile's context window (patch_size + SHIFT_OFFSET beyond the
    grid). max() of the two paddings let edge-tile context windows clamp
    inside lax.dynamic_slice and silently misalign (round-3 review
    finding); every slice must stay in range, never clamp."""
    from cvcs_tpu.data import extract
    from cvcs_tpu.data.loader import SHIFT_OFFSET, ChunkLoader

    p = 32
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=p,
                         random_shift=True, load_context=True, seed=0)
    assert loader._pad() == p + SHIFT_OFFSET + 12

    real = extract.extract_context
    seen = []

    def checked(scenes, coords, patch_size):
        c = np.asarray(coords)
        h, w = scenes.shape[1], scenes.shape[2]
        # window [y-p, y+2p) x [x-p, x+2p) must be inside the padded scene
        assert (c[:, 1] - patch_size >= 0).all()
        assert (c[:, 2] - patch_size >= 0).all()
        assert (c[:, 1] + 2 * patch_size <= h).all()
        assert (c[:, 2] + 2 * patch_size <= w).all()
        seen.append(len(c))
        return real(scenes, coords, patch_size)

    monkeypatch.setattr(extract, "extract_context", checked)
    # draw several shuffles so shifts hit both extremes
    for c in range(len(loader)):
        chunk = loader.get_chunk(c)
        assert chunk.contexts is not None
    assert seen
