"""``python -m cvcs_tpu.cli.predict <config.yaml>`` — the reference's
`inference.py` surface: whole-scene sliding-window segmentation with border
correction, per-patch color-mask PNGs in ``output/``, and an optional
stitched ``out_image`` (`inference.py:1-57`).

TPU-first: each scene runs as one jitted gather/forward/stitch program; the
stitched map is written straight from the device canvas instead of
re-reading 960 tile PNGs (SURVEY §3.3). ``range: [lb, ub]`` selects the
reference's global patch indices (scene = index // tiles_per_scene);
``mesh: {spatial: N}`` shards scene rows over N devices with halo exchange.
"""

from __future__ import annotations

import sys
from pathlib import Path

from cvcs_tpu.cli import common
from cvcs_tpu.config.loader import INFER_KEYS, validate_keys
from cvcs_tpu.data.geometry import TileGrid
from cvcs_tpu.data.reader import SceneDataset
from cvcs_tpu.infer import InferenceConfig, SceneSegmenter


def predict(config: dict) -> None:
    validate_keys(config, INFER_KEYS,
                  {"dataset", "net", "patch_size"}, "inference")
    p = int(config["patch_size"])
    dataset = SceneDataset(config["dataset"])
    grid = TileGrid(dataset.image_shape, p)
    tpi = grid.tiles_per_image

    model, spec, num_classes = common.build_net(config)
    variables = common.restore_variables(config, model, p)
    infer_cfg = InferenceConfig(
        patch_size=p,
        border_correction=config.get("border_correction"),
        batch_tiles=int(config.get("batch_tiles", 16)),
        num_classes=num_classes,
        bug_parity=bool(config.get("bug_parity")),
        mask_only=bool(config.get("mask_only", True)),
        tta=bool(config.get("tta")))
    seg = SceneSegmenter(model.apply, variables, infer_cfg,
                         returns_logits=spec.returns_logits,
                         requires_context=spec.requires_context)
    mesh = common.mesh_from_config(config)

    if "range" in config and config["range"]:
        lb, ub = config["range"]
    else:
        lb, ub = 0, len(dataset) * tpi
    scenes = sorted({i // tpi for i in range(lb, ub)})

    out_dir = Path(config.get("output", "output"))
    # pipeline: decode+upload scene s+1 while scene s computes (dispatch is
    # async; the export below is the only sync point)
    staged = None
    for idx, s in enumerate(scenes):
        if mesh is not None:
            labels = seg.predict_scene_sharded(dataset.load_image(s), mesh)
        else:
            if staged is None:
                staged = seg.pad_scene(dataset.load_image(s))
            labels = seg.predict_padded(*staged)
            staged = (seg.pad_scene(dataset.load_image(scenes[idx + 1]))
                      if idx + 1 < len(scenes) else None)
        if infer_cfg.mask_only:
            seg.export_patches(labels, out_dir, start_index=s * tpi,
                               keep=range(lb, ub))
        else:
            # 3-panel figures with ground truth when masks exist
            try:
                gt = dataset.load_index_mask(s)[
                    :labels.shape[0], :labels.shape[1]]
            except FileNotFoundError:
                gt = None
            seg.export_figures(labels, scene, out_dir, gt_mask=gt,
                               start_index=s * tpi)
        if config.get("out_image"):
            out_path = config["out_image"]
            if len(scenes) > 1:
                stem = Path(out_path)
                out_path = stem.with_name(f"{stem.stem}_{s}{stem.suffix}")
            seg.export_map(labels, out_path)
        print(f"Scene {s}: {tpi} patches -> {out_dir}", flush=True)


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        predict(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
