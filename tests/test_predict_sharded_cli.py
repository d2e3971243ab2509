"""Predict CLI with mesh: {spatial: 8} — scene rows sharded over the
8-virtual-device mesh with halo exchange, bit-identical to single-device."""

import numpy as np
import pytest
from PIL import Image

from cvcs_tpu.data.palette import PALETTE

PATCH = 32  # UNet needs window sizes divisible by 16 (4 poolings)


@pytest.fixture(scope="module")
def tall_root(tmp_path_factory):
    """Scene with 8 tile rows so the spatial axis divides evenly."""
    root = tmp_path_factory.mktemp("gid_tall")
    for d in ("Image__8bit_NirRGB", "Annotation__index", "Annotation__color"):
        (root / d).mkdir()
    rng = np.random.default_rng(0)
    mask = np.kron(rng.integers(0, 16, (32, 8), dtype=np.uint8),
                   np.ones((8, 8), np.uint8))      # 256 x 64 = 8 x 2 tiles
    img = np.repeat(mask[..., None], 3, axis=-1)
    Image.fromarray(img).save(root / "Image__8bit_NirRGB" / "s0.png")
    Image.fromarray(mask).save(root / "Annotation__index" / "s0_15label.png")
    Image.fromarray(PALETTE[mask]).save(
        root / "Annotation__color" / "s0_15label.tif")
    return root


def test_predict_cli_spatial_mesh(tall_root, tmp_path):
    from cvcs_tpu.cli import predict as predict_cli

    out_single = tmp_path / "single.png"
    out_sharded = tmp_path / "sharded.png"
    base = dict(
        dataset=str(tall_root), net="Unet", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        mask_only=True, output=str(tmp_path / "p1"),
    )
    predict_cli.predict(dict(base, out_image=str(out_single)))
    predict_cli.predict(dict(base, out_image=str(out_sharded),
                             output=str(tmp_path / "p2"),
                             mesh={"data": 1, "spatial": 8}))
    a = np.asarray(Image.open(out_single))
    b = np.asarray(Image.open(out_sharded))
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def multi_root(tmp_path_factory):
    """Four 2x2-tile scenes for data-axis scene grouping."""
    root = tmp_path_factory.mktemp("gid_multi")
    for d in ("Image__8bit_NirRGB", "Annotation__index", "Annotation__color"):
        (root / d).mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        mask = np.kron(rng.integers(0, 16, (8, 8), dtype=np.uint8),
                       np.ones((8, 8), np.uint8))      # 64 x 64 = 2 x 2 tiles
        img = np.repeat(mask[..., None], 3, axis=-1)
        Image.fromarray(img).save(root / "Image__8bit_NirRGB" / f"s{i}.png")
        Image.fromarray(mask).save(
            root / "Annotation__index" / f"s{i}_15label.png")
        Image.fromarray(PALETTE[mask]).save(
            root / "Annotation__color" / f"s{i}_15label.tif")
    return root


def test_predict_cli_scene_parallel_mesh(multi_root, tmp_path):
    """`mesh: {data: 4, spatial: 2}` groups scenes into one batched
    sharded program (scenes over data, rows over spatial); every per-scene
    stitched map and patch PNG must be bit-identical to the meshless run."""
    from cvcs_tpu.cli import predict as predict_cli

    base = dict(
        dataset=str(multi_root), net="Unet", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        mask_only=True,
    )
    predict_cli.predict(dict(base, out_image=str(tmp_path / "m1.png"),
                             output=str(tmp_path / "g1")))
    predict_cli.predict(dict(base, out_image=str(tmp_path / "m2.png"),
                             output=str(tmp_path / "g2"),
                             mesh={"data": 4, "spatial": 2}))
    tiles1 = sorted((tmp_path / "g1").glob("*.png"))
    tiles2 = sorted((tmp_path / "g2").glob("*.png"))
    assert [t.name for t in tiles1] == [t.name for t in tiles2]
    assert len(tiles1) == 4 * 4   # 4 scenes x 2x2 tiles
    for a, b in zip(tiles1, tiles2):
        np.testing.assert_array_equal(np.asarray(Image.open(a)),
                                      np.asarray(Image.open(b)),
                                      err_msg=a.name)
    for i in range(4):
        a = np.asarray(Image.open(tmp_path / f"m1_{i}.png"))
        b = np.asarray(Image.open(tmp_path / f"m2_{i}.png"))
        np.testing.assert_array_equal(a, b, err_msg=f"scene {i}")


def test_predict_cli_ensemble_mesh(tall_root, tmp_path):
    """`net: Ensemble` composes with `mesh`: the sharded scene program
    takes the ensemble's member-variables pytree as its traced weights
    and `Ensemble.apply` (vote) as the forward — bit-identical to the
    single-device ensemble run. The reference cannot run its ensemble on
    more than one device at all (`utils.py:499-507` votes on the CPU)."""
    import yaml

    from cvcs_tpu.cli import predict as predict_cli

    members = tmp_path / "ensemble.yaml"
    members.write_text(yaml.safe_dump({"Unet": None, "Unetv2": None}))
    out_single = tmp_path / "ens_single.png"
    out_sharded = tmp_path / "ens_sharded.png"
    base = dict(
        dataset=str(tall_root), net="Ensemble", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        ensemble_config=str(members), mask_only=True,
    )
    predict_cli.predict(dict(base, out_image=str(out_single),
                             output=str(tmp_path / "e1")))
    predict_cli.predict(dict(base, out_image=str(out_sharded),
                             output=str(tmp_path / "e2"),
                             mesh={"data": 1, "spatial": 8}))
    a = np.asarray(Image.open(out_single))
    b = np.asarray(Image.open(out_sharded))
    np.testing.assert_array_equal(a, b)


def test_predict_cli_fullconv_mesh(tall_root, tmp_path):
    """fullconv_bands + mesh routes to the ppermute-halo sharded fullconv
    path; on a tile-grid-aligned scene it must be bit-identical to the
    single-device fullconv CLI with band_rows = rows/n (= 1 here)."""
    from cvcs_tpu.cli import predict as predict_cli

    out_single = tmp_path / "fc_single.png"
    out_sharded = tmp_path / "fc_sharded.png"
    base = dict(
        dataset=str(tall_root), net="Unet", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        mask_only=True, fullconv_bands=1,
    )
    predict_cli.predict(dict(base, out_image=str(out_single),
                             output=str(tmp_path / "f1")))
    predict_cli.predict(dict(base, out_image=str(out_sharded),
                             output=str(tmp_path / "f2"),
                             mesh={"data": 1, "spatial": 8}))
    a = np.asarray(Image.open(out_single))
    b = np.asarray(Image.open(out_sharded))
    np.testing.assert_array_equal(a, b)
