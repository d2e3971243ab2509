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


def test_debug_plot_fires_on_stacked_path(gid15_root, tmp_path):
    """steps_per_call > 1 consumes batch 0 in the stacked multi-step loop
    — the first-sample-per-chunk debug dump (`train.py:119` parity) must
    still be written (round-3 review finding: it silently stopped)."""
    import jax.numpy as jnp
    import numpy as np

    from cvcs_tpu.data.loader import ChunkLoader
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import (
        TrainConfig, Trainer, build_optimizer, create_train_state,
    )

    p = 32
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=p,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=p,
                      load_context=False, seed=1)
    loader.specify([0, 1])
    val.specify([0, 1])
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((4, p, p, 3), jnp.uint8))
    cfg = TrainConfig(epochs=1, batch_size=4, steps_per_call=2,
                      debug_plot=True, debug_dir=str(tmp_path / "dbg"),
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=lambda s: None)
    trainer.train()
    dumps = list((tmp_path / "dbg").glob("debug_e*_c*_b*.png"))
    assert dumps, "stacked path must still write the per-chunk debug dump"
    assert np.isfinite(trainer.training_loss_values).all()
