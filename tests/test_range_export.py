"""Reference `range: [lb, ub]` parity: only the selected global patch
indices are exported (`inference.py:30-37`)."""

from tests.conftest import PATCH


def test_predict_range_limits_patch_export(gid15_root, tmp_path):
    from cvcs_tpu.cli import predict as predict_cli
    from cvcs_tpu.data.geometry import TileGrid
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(str(gid15_root))
    tpi = TileGrid(ds.image_shape, PATCH).tiles_per_image
    out_dir = tmp_path / "out"
    # select 3 patches starting inside scene 0 and crossing into scene 1
    lb, ub = tpi - 2, tpi + 1
    predict_cli.predict(dict(
        dataset=str(gid15_root), net="Unet", patch_size=PATCH,
        num_classes=15, precision="f32",
        range=[lb, ub], mask_only=True, output=str(out_dir)))
    written = sorted(int(p.stem) for p in out_dir.glob("*.png"))
    assert written == list(range(lb, ub))
