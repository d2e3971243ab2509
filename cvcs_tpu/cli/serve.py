"""``python -m cvcs_tpu.cli.serve <config.yaml>`` — directory-watching
segmentation service (beyond-reference: the reference's `inference.py` /
`esa.py` are one-shot scripts; production deployments segment rasters as
they arrive).

Watches ``watch_dir`` for new rasters (png/jpg/tif), segments each with
the whole-scene engine — same-shape arrivals batch into one jitted
program, and full groups run scene-parallel over a ``mesh`` (see
``common.segment_rasters``) — and writes ``<stem>_mask.png`` into
``output``. Processed names and per-raster latency are appended to
``output/manifest.jsonl`` (the service's observability surface and its
restart journal: already-listed names are never re-processed, so a
crashed or restarted service resumes where it left off).

Config keys: ``watch_dir``, ``net``, ``patch_size`` (default 512 like
`esa.py:20-26`), ``load_checkpoint``, optional ``output`` (default
``<watch_dir>/output``), ``border_correction``, ``mesh``, ``poll_s``
(default 2.0), ``max_polls`` (stop after N scans — the test hook; the
default runs until interrupted).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from cvcs_tpu.cli import common
from cvcs_tpu.infer import InferenceConfig, SceneSegmenter

RASTER_SUFFIXES = {".png", ".jpg", ".jpeg", ".tif", ".tiff"}


def serve(config: dict) -> int:
    """Run the watch loop; returns the number of rasters processed."""
    from pathlib import Path

    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    watch = Path(config["watch_dir"])
    out_dir = Path(config.get("output", watch / "output"))
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = out_dir / "manifest.jsonl"
    done = set()
    if manifest.exists():
        for line in manifest.read_text().splitlines():
            done.add(json.loads(line)["name"])

    p = int(config.get("patch_size", 512))
    model, spec, num_classes = common.build_net(config)
    variables = common.restore_variables(config, model, p)
    seg = SceneSegmenter(
        model.apply, variables,
        InferenceConfig(
            patch_size=p,
            border_correction=config.get("border_correction"),
            batch_tiles=int(config.get("batch_tiles", 4)),
            num_classes=num_classes),
        returns_logits=spec.returns_logits)
    mesh = common.mesh_from_config(config)

    poll_s = float(config.get("poll_s", 2.0))
    max_polls = config.get("max_polls")
    n_processed = 0
    polls = 0
    while True:
        new = sorted(
            f for f in watch.iterdir()
            if f.suffix.lower() in RASTER_SUFFIXES and f.name not in done)
        if new:
            rasters = [np.asarray(Image.open(f).convert("RGB"))
                       for f in new]
            t0 = time.time()
            labels = common.segment_rasters(seg, rasters, mesh)
            for f, lab in zip(new, labels):
                seg.export_map(lab, out_dir / f"{f.stem}_mask.png")
                entry = {"name": f.name, "shape": list(lab.shape),
                         "batch": len(new),
                         "batch_seconds": round(time.time() - t0, 3)}
                with manifest.open("a") as mf:
                    mf.write(json.dumps(entry) + "\n")
                done.add(f.name)
                n_processed += 1
                print(f"served {f.name} -> {f.stem}_mask.png", flush=True)
        polls += 1
        if max_polls is not None and polls >= int(max_polls):
            return n_processed
        time.sleep(poll_s)


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        n = serve(config)
    print(f"served {n} rasters", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
