"""``python -m cvcs_tpu.cli.esa <config.yaml>`` — the reference's `esa.py`
capability: run a trained net on arbitrary-size external imagery (its
hardcoded example is an ESA Modena PNG at patch 512, `esa.py:20-26`), no
ground truth, no border correction, stitched color output.

Config keys: ``image`` (path to any RGB raster), ``net``,
``load_checkpoint``, ``patch_size`` (default 512 like the reference),
``out_image`` (default ``output_esa.png``), optional ``output`` dir for
per-patch PNGs, ``border_correction`` (the reference lacks it; here it
is available cross-domain too) and ``mesh`` (same semantics as the
predict CLI: rows strip over ``spatial``, same-shape raster groups batch
over ``data``)."""

from __future__ import annotations

import sys

import numpy as np

from cvcs_tpu.cli import common
from cvcs_tpu.infer import InferenceConfig, SceneSegmenter


def run(config: dict) -> None:
    from pathlib import Path

    from PIL import Image

    from cvcs_tpu.config.loader import ESA_KEYS, validate_keys

    validate_keys(config, ESA_KEYS, {"image", "net"}, "esa")
    Image.MAX_IMAGE_PIXELS = None
    paths = config["image"]
    if not isinstance(paths, (list, tuple)):
        paths = [paths]
    rasters = [np.asarray(Image.open(f).convert("RGB")) for f in paths]
    p = int(config.get("patch_size", 512))

    (apply_fn, variables, num_classes,
     returns_logits, requires_context,
     stride_product) = common.build_apply(config, p)
    seg = SceneSegmenter(
        apply_fn, variables,
        InferenceConfig(
            patch_size=p,
            border_correction=config.get("border_correction"),
            # the measured window-path optimum (BASELINE.md bt sweep);
            # clamped to the tile count for small rasters
            batch_tiles=int(config.get("batch_tiles", 128)),
            num_classes=num_classes,
            tta=bool(config.get("tta"))),
        returns_logits=returns_logits,
        requires_context=requires_context,
        stride_product=stride_product)

    out_image = config.get("out_image", "output_esa.png")

    def out_path(i: int) -> str:
        if len(rasters) == 1:
            return out_image
        stem = Path(out_image)
        return str(stem.with_name(f"{stem.stem}_{i}{stem.suffix}"))

    # same-shape batches run as one jitted program (small-scene workloads
    # like ESA amortize dispatch); with a mesh, full groups of n_data
    # rasters run scene-parallel — see common.segment_rasters
    per_scene = common.fetch_labels(common.segment_rasters(
        seg, rasters, common.mesh_from_config(config)))
    for i, labels in enumerate(per_scene):
        if config.get("output"):
            out_dir = (config["output"] if len(per_scene) == 1
                       else str(Path(config["output"]) / str(i)))
            seg.export_patches(labels, out_dir)
        seg.export_map(labels, out_path(i))
        print(f"Wrote {out_path(i)}", flush=True)


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        run(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
