"""``python -m cvcs_tpu.cli.predict <config.yaml>`` — the reference's
`inference.py` surface: whole-scene sliding-window segmentation with border
correction, per-patch color-mask PNGs in ``output/``, and an optional
stitched ``out_image`` (`inference.py:1-57`).

TPU-first: each scene runs as one jitted gather/forward/stitch program; the
stitched map is written straight from the device canvas instead of
re-reading 960 tile PNGs (SURVEY §3.3). ``range: [lb, ub]`` selects the
reference's global patch indices (scene = index // tiles_per_scene);
``mesh: {spatial: N}`` shards scene rows over N devices with halo exchange;
adding ``data: M`` additionally runs groups of M scenes as one batched
program (scenes over the data axis — the production pod layout).
"""

from __future__ import annotations

import sys
from pathlib import Path

from cvcs_tpu.cli import common
from cvcs_tpu.config.loader import INFER_KEYS, validate_keys
from cvcs_tpu.core.mesh import DATA_AXIS
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

    # `net: Ensemble` dispatches like the reference's `load_network`
    # (`utils.py:174-195`); `utils.inference` handles its label
    # (non-logits) output (`utils.py:157-158`). Member forwards + one-hot
    # vote jit into the same whole-scene program; member weights ride as
    # the traced variables pytree.
    (apply_fn, variables, num_classes,
     returns_logits, requires_context,
     stride_product) = common.build_apply(config, p)
    infer_cfg = InferenceConfig(
        patch_size=p,
        border_correction=config.get("border_correction"),
        batch_tiles=int(config.get("batch_tiles", 128)),
        num_classes=num_classes,
        bug_parity=bool(config.get("bug_parity")),
        # reference default: 3-panel figures (`inference.py:36`)
        mask_only=bool(config.get("mask_only", False)),
        tta=bool(config.get("tta")))
    seg = SceneSegmenter(apply_fn, variables, infer_cfg,
                         returns_logits=returns_logits,
                         requires_context=requires_context,
                         stride_product=stride_product)
    mesh = common.mesh_from_config(config)

    if "range" in config and config["range"]:
        lb, ub = config["range"]
    else:
        lb, ub = 0, len(dataset) * tpi
    # the range is one contiguous interval — derive the scene ids from
    # its endpoints instead of iterating every patch index
    scenes = list(range(lb // tpi, -(-ub // tpi))) if ub > lb else []

    out_dir = Path(config.get("output", "output"))

    # Scene-parallel grouping (pod layout): with a data axis in the mesh,
    # full groups of n_data scenes run as ONE batched sharded program —
    # scenes over `data`, rows over `spatial` (`predict_scenes_sharded`);
    # remainder scenes fall through to the per-scene spatial path.
    scene_groups: dict[int, list[int]] = {}
    pending_group: dict[int, tuple] = {}
    if mesh is not None and not config.get("fullconv_bands") \
            and not config.get("stream_rows"):
        n_data = mesh.shape[DATA_AXIS]
        if n_data > 1:
            full = len(scenes) - len(scenes) % n_data
            for i in range(0, full, n_data):
                scene_groups[scenes[i]] = scenes[i:i + n_data]

    def load_gt(s, h, w):
        """Index mask for 3-panel figures, when annotations exist."""
        try:
            return dataset.load_index_mask(s)[:h, :w]
        except FileNotFoundError:
            return None

    # pipeline: decode+upload scene s+1 while scene s computes (dispatch is
    # async; the export below is the only sync point). `staged` carries the
    # raw scene alongside the padded device copy for the figures branch.
    staged = None

    def selected(s):
        return [i - s * tpi for i in range(max(lb, s * tpi),
                                           min(ub, (s + 1) * tpi))]

    def few_patch(s):
        # Few-patch economics (reference `inference.py:30-37` forwards
        # only the selected patches): when the range covers a minority
        # of the scene and no stitched map is requested, compute just
        # those tiles.
        return (len(selected(s)) * 4 <= tpi
                and not config.get("out_image") and mesh is None)

    for idx, s in enumerate(scenes):
        sel = selected(s)
        if few_patch(s):
            raw = dataset.load_image(s)
            tiles = seg.predict_tiles(raw, sel)
            global_ids = [s * tpi + t for t in sel]
            if infer_cfg.mask_only:
                seg.export_tile_patches(tiles, global_ids, out_dir)
            else:
                gt = load_gt(s, grid.rows * p, grid.cols * p)
                seg.export_tile_figures(tiles, global_ids, sel, raw,
                                        grid.cols, out_dir, gt_mask=gt)
            print(f"Scene {s}: {len(sel)} patches -> {out_dir}", flush=True)
            continue

        if mesh is not None and (s in scene_groups or s in pending_group):
            if s in scene_groups:
                group = scene_groups[s]
                raws = [dataset.load_image(g) for g in group]
                stack = seg.predict_scenes_sharded(raws, mesh)
                for j, g in enumerate(group):
                    pending_group[g] = (stack[j], raws[j])
            labels, raw = pending_group.pop(s)
        elif mesh is not None:
            raw = dataset.load_image(s)
            if config.get("fullconv_bands"):
                # fullconv + mesh: each device forwards its strip of
                # tile-rows as one convolution (or a block grid), halo
                # context via ppermute — not the window program
                chunks = config.get("fullconv_chunks") or (None, None)
                labels = seg.predict_scene_fullconv_sharded(
                    raw, mesh,
                    col_tiles=chunks[1] and int(chunks[1]),
                    row_tiles=chunks[0] and int(chunks[0]))
            else:
                labels = seg.predict_scene_sharded(raw, mesh)
        elif config.get("fullconv_bands"):
            # opt-in seamless full-convolution mode (beyond-reference):
            # bands of N tile-rows forward as whole convolutions — no
            # window overlap compute, no tile seams inside a band.
            # fullconv_chunks: [r, k] batches each band as r x k-tile
            # blocks (faster conv shapes, seams only at block borders)
            raw = dataset.load_image(s)
            chunks = config.get("fullconv_chunks")
            if chunks:
                padded, rr, cc, halo = seg.pad_scene_fullconv(raw)
                labels = seg.predict_padded_fullconv(
                    padded, rr, cc, halo,
                    band_rows=int(config["fullconv_bands"]),
                    row_tiles=int(chunks[0]), col_tiles=int(chunks[1]))
            else:
                labels = seg.predict_scene_fullconv(
                    raw, band_rows=int(config["fullconv_bands"]))
        elif config.get("stream_rows"):
            # band-pipelined: only stream_rows tile-rows (+ halo) of
            # imagery are device-resident at a time (giant rasters)
            raw = dataset.load_image(s)
            labels = seg.predict_scene_streamed(
                raw, band_rows=int(config["stream_rows"]))
        else:
            if staged is None:
                raw0 = dataset.load_image(s)
                staged = (seg.pad_scene(raw0), raw0)
            (padded, rows, cols), raw = staged
            labels = seg.predict_padded(padded, rows, cols)
            # don't prefetch a scene the few-patch branch will handle —
            # it would decode it again and waste the whole-scene upload
            if idx + 1 < len(scenes) and not few_patch(scenes[idx + 1]):
                raw1 = dataset.load_image(scenes[idx + 1])
                staged = ((seg.pad_scene(raw1)), raw1)
            else:
                staged = None
        if infer_cfg.mask_only:
            seg.export_patches(labels, out_dir, start_index=s * tpi,
                               keep=range(lb, ub))
        else:
            gt = load_gt(s, labels.shape[0], labels.shape[1])
            seg.export_figures(labels, raw, out_dir, gt_mask=gt,
                               start_index=s * tpi, keep=range(lb, ub))
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
