import numpy as np
import pytest

from cvcs_tpu.data import geometry


def test_tile_grid_reference_constants():
    # GID15 scene 6800x7200 @ p=224 -> 30x32 = 960 tiles (`dataset.py:63-64`)
    g = geometry.TileGrid((6800, 7200), 224)
    assert (g.rows, g.cols) == (30, 32)
    assert g.tiles_per_image == 960


def test_tile_origin_row_major():
    g = geometry.TileGrid((96, 128), 32)
    assert g.tile_origin(0) == (0, 0)
    assert g.tile_origin(1) == (0, 32)
    assert g.tile_origin(g.cols) == (32, 0)
    origins = g.origins()
    assert origins.shape == (g.tiles_per_image, 2)
    assert tuple(origins[5]) == g.tile_origin(5)


def test_context_window():
    tly, tlx, size = geometry.context_window(64, 96, 32)
    assert (tly, tlx, size) == (32, 64, 96)


def test_border_window_centered_vs_parity():
    # centered: margin split both sides; the crop of the output aligns.
    assert geometry.border_window(100, 200, 224, 256) == (84, 184, 256)
    # bug-parity: full margin subtracted (reference `dataset.py:18-23`).
    assert geometry.border_window(100, 200, 224, 256, centered=False) == (
        68, 168, 256)


def test_chunk_partition():
    chunks = geometry.chunk_partition(list(range(6)), 2)
    assert chunks == [[0, 1], [2, 3], [4, 5]]
    with pytest.raises(ValueError):
        geometry.chunk_partition(list(range(5)), 2)


def test_random_shift_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        y, x = geometry.random_shift(100, 100, 20, rng)
        assert 80 <= y <= 120 and 80 <= x <= 120
