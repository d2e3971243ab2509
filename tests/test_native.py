"""Native C++ decoder/prefetcher tests (built on demand with g++ + libpng;
skipped if the toolchain is unavailable)."""

import numpy as np
import pytest
from PIL import Image

from cvcs_tpu import native


@pytest.fixture(scope="module")
def lib():
    handle = native.load()
    if handle is None:
        pytest.skip("native tile_reader could not be built")
    return handle


def _png(tmp_path, name, arr):
    path = tmp_path / name
    Image.fromarray(arr).save(path)
    return path


def test_decode_rgb_matches_pil(lib, tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (37, 53, 3), np.uint8)
    path = _png(tmp_path, "rgb.png", arr)
    out = native.decode_png(path)
    np.testing.assert_array_equal(out, arr)


def test_decode_gray_matches_pil(lib, tmp_path):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    path = _png(tmp_path, "gray.png", arr)
    out = native.decode_png(path)
    np.testing.assert_array_equal(out, arr)


def test_prefetch_then_take(lib, tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(3)]
    paths = [_png(tmp_path, f"p{i}.png", a) for i, a in enumerate(arrs)]
    for p in paths:
        native.prefetch(p)
    for p, a in zip(paths, arrs):
        np.testing.assert_array_equal(native.take(p), a)


def test_take_cold_miss_decodes_inline(lib, tmp_path):
    arr = np.zeros((4, 4, 3), np.uint8)
    path = _png(tmp_path, "cold.png", arr)
    np.testing.assert_array_equal(native.take(path), arr)


def test_decode_missing_returns_none(lib, tmp_path):
    assert native.decode_png(tmp_path / "nope.png") is None


def test_write_png_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(2)
    for shape in [(9, 13, 3), (6, 6), (5, 7, 4)]:
        arr = rng.integers(0, 256, shape, np.uint8)
        path = tmp_path / f"w{len(shape)}_{shape[-1]}.png"
        assert native.write_png(path, arr)
        back = native.decode_png(path)
        np.testing.assert_array_equal(back, arr if len(shape) == 3
                                      else arr)


def test_async_writes_flush(lib, tmp_path):
    rng = np.random.default_rng(3)
    arrs = [rng.integers(0, 256, (8, 8, 3), np.uint8) for _ in range(5)]
    for i, a in enumerate(arrs):
        assert native.write_png_async(tmp_path / f"a{i}.png", a)
    assert native.flush_writes() == 0
    for i, a in enumerate(arrs):
        np.testing.assert_array_equal(
            native.decode_png(tmp_path / f"a{i}.png"), a)


def test_async_write_failure_counted(lib, tmp_path):
    arr = np.zeros((4, 4, 3), np.uint8)
    native.write_png_async(tmp_path / "no_dir" / "x.png", arr)
    assert native.flush_writes() == 1


def test_export_patches_native_path(lib, gid15_root, tmp_path):
    """engine.export_patches through the async writer must equal PIL."""
    import jax.numpy as jnp

    from cvcs_tpu.data.palette import PALETTE
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
    from PIL import Image

    labels = np.kron(np.arange(16).reshape(4, 4),
                     np.ones((8, 8), np.int32))
    seg = SceneSegmenter(lambda *a, **k: None, {},
                         InferenceConfig(patch_size=16,
                                         border_correction=None))
    paths = seg.export_patches(jnp.asarray(labels), tmp_path / "out")
    assert len(paths) == 4
    t0 = np.asarray(Image.open(paths[0]))
    np.testing.assert_array_equal(t0, PALETTE[labels[:16, :16]])


def test_scene_dataset_uses_native(lib, gid15_root):
    """SceneDataset must produce identical arrays through the native path."""
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(gid15_root)
    ds.prefetch(range(len(ds)))
    img = ds.load_image(0)
    pil = np.asarray(Image.open(ds.image_paths[0]))
    np.testing.assert_array_equal(img, pil)
    mask = ds.load_index_mask(0)
    pil_mask = np.asarray(Image.open(ds.index_mask_path(0)))
    np.testing.assert_array_equal(mask, pil_mask)


def test_palette_png_falls_back_to_pil_consistently(lib, tmp_path):
    """Palette PNGs decode to INDICES in the PIL fallback; the native
    decoder used to report the pre-expansion channel count from
    tr_png_info while decoding post-expansion RGB — every palette load
    over-ran the buffer and silently disabled the native tier (round-3
    review finding). Policy now: tr_png_info rejects unsupported formats
    up front (no wasted prefetch decode) and the PIL fallback is the
    single source of truth for them."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, (16, 16), np.uint8)
    img = Image.fromarray(idx, mode="P")
    img.putpalette([v for i in range(4) for v in (i * 50, i * 60, i * 70)]
                   + [0] * (256 - 4) * 3)
    path = tmp_path / "pal.png"
    img.save(path)
    assert native.decode_png(path) is None          # clean fast rejection
    native.prefetch(path)
    assert native.take(path) is None                # prefetched path too
    np.testing.assert_array_equal(
        np.asarray(Image.open(path)), idx)          # PIL yields indices


def test_concurrent_take_same_path_no_deadlock(lib, tmp_path):
    """Two threads taking the same prefetched path must both return (the
    old cache-only wait predicate hung the loser forever once the winner
    erased the cache entry)."""
    import threading

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
    path = _png(tmp_path, "race.png", arr)
    native.prefetch(path)
    results = [None, None]

    def worker(i):
        results[i] = native.take(path)

    threads = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "take() deadlocked"
    for r in results:
        np.testing.assert_array_equal(r, arr)
