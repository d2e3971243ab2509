"""Multi-scene batched inference (ROADMAP item 7): one jitted program over
a same-shape scene stack must equal per-scene runs, and the ESA CLI accepts
a list of rasters."""

import numpy as np

from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
from tests.test_inference import NUM_CLASSES, P, _scene, identity_apply


def test_predict_scenes_matches_per_scene():
    scenes = [_scene(seed=s)[0] for s in (31, 32, 33)]
    cfg = InferenceConfig(patch_size=P, border_correction=P + 8,
                          batch_tiles=5, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(identity_apply, {}, cfg)
    batched = np.asarray(seg.predict_scenes(scenes))
    assert batched.shape[0] == 3
    for i, sc in enumerate(scenes):
        single = np.asarray(seg.predict_scene(sc))
        np.testing.assert_array_equal(batched[i], single)


def test_esa_cli_multi_image(tmp_path):
    from PIL import Image

    from cvcs_tpu.cli import esa as esa_cli

    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        img = rng.integers(0, 255, (P * 2, P * 2, 3), np.uint8)
        f = tmp_path / f"esa{i}.png"
        Image.fromarray(img).save(f)
        paths.append(str(f))
    out = tmp_path / "esa_out.png"
    esa_cli.run(dict(image=paths, net="Unet", patch_size=P,
                     num_classes=15, precision="f32",
                     out_image=str(out)))
    for i in range(2):
        got = np.asarray(Image.open(tmp_path / f"esa_out_{i}.png"))
        assert got.shape == (P * 2, P * 2, 3)
