"""End-to-end `cvcs-retrieve` wall time at notebook scale on the real
chip (the reference's retrieval workflow, `retrieval.ipynb` cells 63-83):
full-scene gallery (one synthetic 6800x7200 GID15 scene -> 960 patches
@p224), 10 probes, mask-similarity scores (mIoU/wIoU/pprec/EMD) +
zoo-tap embeddings + the EMD-agreement tables, through the shipped CLI
(`cvcs_tpu.cli.retrieve.retrieve`). Prints the CLI's own phase timings
plus one RESULT line.

Usage: python tools/retrieve_bench.py [net] [num_probes]
(default net Unetv2 — the notebook's "U-Net encode5" embedding analogue)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")

NET = sys.argv[1] if len(sys.argv) > 1 else "Unetv2"
N_PROBES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ROOT = "/tmp/retrieve_bench_gid15"
H, W = 6800, 7200


def make_dataset() -> None:
    from PIL import Image

    from cvcs_tpu.data.palette import PALETTE

    if os.path.isdir(os.path.join(ROOT, "Image__8bit_NirRGB")):
        return
    for sub in ("Image__8bit_NirRGB", "Annotation__index",
                "Annotation__color"):
        os.makedirs(os.path.join(ROOT, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.time()
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    # blocky masks so the per-class histograms (EMD) are non-degenerate
    m = np.kron(rng.integers(0, 16, (H // 16, W // 16), dtype=np.uint8),
                np.ones((16, 16), np.uint8))
    Image.fromarray(img).save(f"{ROOT}/Image__8bit_NirRGB/s0.png")
    Image.fromarray(m).save(f"{ROOT}/Annotation__index/s0_15label.png")
    Image.fromarray(np.asarray(PALETTE)[m].astype(np.uint8)).save(
        f"{ROOT}/Annotation__color/s0_15label.tif")
    print(f"dataset written in {time.time() - t0:.1f}s", flush=True)


def main():
    from cvcs_tpu.cli.retrieve import retrieve

    make_dataset()
    t0 = time.time()
    out = retrieve(dict(dataset=ROOT, patch_size=224, num_probes=N_PROBES,
                        seed=0, net=NET, num_classes=15, batch_size=32,
                        metric="l2", topk=10))
    wall = time.time() - t0
    t = out.get("timings", {})
    print(f"RESULT retrieve {NET} gallery=960 probes={N_PROBES}: "
          f"end-to-end {wall:.1f}s (load {t.get('load_s')}s, embeddings "
          f"{t.get('embeddings_s')}s, scores+rank {t.get('scores_s')}s); "
          f"agreement={out.get('agreement')}", flush=True)


if __name__ == "__main__":
    main()
