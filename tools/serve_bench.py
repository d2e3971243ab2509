"""Measure warm serving-daemon throughput on the real chip: drop N
same-shape rasters into a watch dir, run ONE poll of `cvcs_tpu.cli.serve`
(batched decode -> segment -> PNG export -> journal), and report the
warm-batch rate from the manifest (the first batch carries the jit
compile; later batches are the daemon's steady state).

Usage: python tools/serve_bench.py [n_rasters] [side] [max_batch]
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 896
MAX_BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def main():
    from PIL import Image

    from cvcs_tpu import native
    from cvcs_tpu.cli import serve as serve_cli
    from cvcs_tpu.infer import SceneSegmenter

    # phase attribution (round-4 verdict #2): where does the daemon's
    # wall time go once the native tier carries decode + mask export?
    phases = {"decode": 0.0, "sync": 0.0, "export_queue": 0.0,
              "flush": 0.0}

    def timed(key, fn):
        def wrapper(*a, **k):
            t = time.time()
            try:
                return fn(*a, **k)
            finally:
                phases[key] += time.time() - t
        return wrapper

    serve_cli._decode_rgb = timed("decode", serve_cli._decode_rgb)
    serve_cli._fetch_labels = timed("sync", serve_cli._fetch_labels)
    SceneSegmenter.export_map = timed("export_queue",
                                      SceneSegmenter.export_map)
    native.flush_writes = timed("flush", native.flush_writes)

    root = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    watch = root / "in"
    watch.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N):
        Image.fromarray(rng.integers(0, 255, (SIDE, SIDE, 3), np.uint8)
                        ).save(watch / f"r{i:03d}.png")
    cfg = dict(watch_dir=str(watch), net="Unetv2", patch_size=224,
               border_correction=256, num_classes=15, poll_s=0.0,
               max_polls=1, max_batch=MAX_BATCH,
               output=str(root / "out"))
    t0 = time.time()
    served = serve_cli.serve(cfg)
    wall = time.time() - t0
    entries = [json.loads(l) for l in
               (root / "out" / "manifest.jsonl").read_text().splitlines()]
    # entries are journaled in order; each batch of size b contributes b
    # consecutive entries whose LAST batch_seconds covers the whole batch
    # (segment + every export + journal)
    batches = []
    i = 0
    while i < len(entries):
        b = entries[i]["batch"]
        batches.append((entries[i + b - 1]["batch_seconds"], b))
        i += b
    batches.sort(key=lambda tb: -tb[0])
    # drop the slowest batch (carries the compile); rate over the rest
    warm = batches[1:] if len(batches) > 1 else batches
    warm_rasters = sum(b for _, b in warm)
    warm_s = sum(t for t, _ in warm)
    tiles_per_raster = (SIDE // 224) ** 2 * (224 * 224) / (512 * 512)
    print(f"RESULT serve bench: {served}/{N} rasters {SIDE}x{SIDE} "
          f"max_batch={MAX_BATCH}; wall {wall:.1f}s; warm batches: "
          f"{warm_rasters} rasters in {warm_s:.2f}s = "
          f"{warm_rasters / warm_s:.2f} rasters/s "
          f"({warm_rasters * tiles_per_raster / warm_s:.1f} tiles512/s "
          f"incl. decode+export+journal)")
    other = wall - sum(phases.values())
    print(f"PHASES (whole run incl. compile batch): "
          f"decode {phases['decode']:.2f}s, "
          f"label-sync {phases['sync']:.2f}s (incl. first-batch "
          f"compile wait), "
          f"export-queue {phases['export_queue']:.2f}s, "
          f"flush-wait {phases['flush']:.2f}s, "
          f"segment+poll+journal {other:.2f}s "
          f"(native tier: {'ON' if native.load() is not None else 'OFF'})")


if __name__ == "__main__":
    main()
