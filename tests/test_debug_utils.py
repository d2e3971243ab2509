"""Debug plotting utilities (reference debug_plot + notebook activation
visualization)."""

import numpy as np

from cvcs_tpu.utils.debug import debug_plot, plot_activations


def test_debug_plot(tmp_path):
    img = np.zeros((2, 16, 16, 3), np.uint8)
    mask = np.zeros((2, 16, 16), np.int32)
    ctx = np.zeros((2, 16, 16, 3), np.uint8)
    p = debug_plot(tmp_path, 0, 1, 2, img, mask, ctx)
    assert p.name == "debug_e0_c1_b2.png" and p.stat().st_size > 0
    p2 = debug_plot(tmp_path, 1, 0, 0, img, mask, None)
    assert p2.stat().st_size > 0


def test_plot_activations(tmp_path):
    feats = np.random.default_rng(0).normal(size=(1, 8, 8, 20))
    p = plot_activations(feats, tmp_path / "act.png", title="encode5")
    assert p.stat().st_size > 0
