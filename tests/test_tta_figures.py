"""TTA and figure-export paths of the inference engine."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
from tests.test_inference import NUM_CLASSES, P, _scene, identity_apply


def test_tta_is_invariant_for_symmetric_model():
    """identity_apply is flip-equivariant, so TTA must not change output."""
    scene, lab = _scene(seed=9)
    cfg = InferenceConfig(patch_size=P, border_correction=P + 8,
                          batch_tiles=4, num_classes=NUM_CLASSES, tta=True)
    seg = SceneSegmenter(identity_apply, {}, cfg)
    out = np.asarray(seg.predict_scene(scene))
    np.testing.assert_array_equal(out, lab)


def test_tta_averages_logits():
    """A model sensitive to orientation must differ with TTA on/off."""

    def oriented_apply(variables, x, context=None, train=False):
        b, h, w, _ = x.shape
        row = jnp.arange(h)[None, :, None]
        bias = jnp.where(row < h // 2, 5.0, 0.0)[..., None]
        logits = jax.nn.one_hot(
            jnp.zeros((b, h, w), jnp.int32), NUM_CLASSES) * 0.0
        logits = logits.at[..., 1].set(bias[..., 0])
        return logits

    scene, _ = _scene(seed=10)
    base = SceneSegmenter(oriented_apply, {}, InferenceConfig(
        patch_size=P, border_correction=None, batch_tiles=4,
        num_classes=NUM_CLASSES))
    tta = SceneSegmenter(oriented_apply, {}, InferenceConfig(
        patch_size=P, border_correction=None, batch_tiles=4,
        num_classes=NUM_CLASSES, tta=True))
    out_base = np.asarray(base.predict_scene(scene))
    out_tta = np.asarray(tta.predict_scene(scene))
    # base: top halves class 1; TTA averages top/bottom -> uniform class 1
    # wherever any flip sees the bias (here: everywhere equally -> ties)
    assert not np.array_equal(out_base, out_tta)


def test_export_figures(tmp_path):
    scene, lab = _scene(seed=11)
    cfg = InferenceConfig(patch_size=P, border_correction=None,
                          batch_tiles=4, num_classes=NUM_CLASSES,
                          mask_only=False)
    seg = SceneSegmenter(identity_apply, {}, cfg)
    out = seg.predict_scene(scene)
    paths = seg.export_figures(out, scene, tmp_path / "figs", gt_mask=lab)
    assert len(paths) == (64 // P) * (96 // P)
    assert all(p.stat().st_size > 0 for p in paths)
