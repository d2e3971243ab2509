"""Canonical-recipe endurance soak at reference scale (round-5 verdict #6).

The reference's headline recipe is 50 epochs of Unetv2 / bs 10 / p 224 /
wCEL / SGD2 over full GID15 scenes (`source/scripts/configs/train/
server.yaml:21-31`); round 2's end-to-end run was only 2 epochs x 2
scenes. This tool runs the *system* — chunk loader, donated train step,
per-epoch validation, async Orbax checkpoints with retention, metrics
JSONL, preemption handler — for the full 50 epochs over 8 synthetic
GID15-size scenes (6800x7200) on the real chip, with one mid-run
SIGTERM + `load_checkpoint: auto` resume to exercise the preemption
path at scale.

Synthetic task is the round-2 labels-in-image scheme (image = palette
color of the label + uniform noise), so the loss trajectory is a real
learning signal, not noise — an end-to-end *system* soak, not a GID15
accuracy claim.

Usage:
    python tools/endurance_soak.py gen            # write the dataset
    python tools/endurance_soak.py run            # phase A + SIGTERM + resume
    python tools/endurance_soak.py report         # summarize metrics.jsonl

Env: SOAK_ROOT (default /tmp/soak), SOAK_EPOCHS (50), SOAK_TRAIN_SCENES
(8), SOAK_SIGTERM_S (1500 — SIGTERM phase A after this many seconds).
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(os.environ.get("SOAK_ROOT", "/tmp/soak"))
EPOCHS = int(os.environ.get("SOAK_EPOCHS", "50"))
N_TRAIN = int(os.environ.get("SOAK_TRAIN_SCENES", "8"))
N_VAL = 2
H, W = 6800, 7200           # exact GID15 scene dims (`dataset.py:61`)
SIGTERM_S = float(os.environ.get("SOAK_SIGTERM_S", "1500"))

sys.path.insert(0, "/root/repo")


def gen() -> None:
    import numpy as np
    from PIL import Image

    from cvcs_tpu.data.palette import PALETTE

    rng = np.random.default_rng(42)
    for split, n in (("Train", N_TRAIN), ("Validation", N_VAL)):
        base = ROOT / split
        for d in ("Image__8bit_NirRGB", "Annotation__index",
                  "Annotation__color"):
            (base / d).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t0 = time.time()
            # coarse 100px regions -> learnable, compressible
            m = np.kron(
                rng.integers(0, 16, (H // 100, W // 100), dtype=np.uint8),
                np.ones((100, 100), np.uint8))
            img = PALETTE[m].astype(np.int16)
            img += rng.integers(-30, 31, img.shape, dtype=np.int16)
            img = np.clip(img, 0, 255).astype(np.uint8)
            stem = f"{split.lower()}{i}"
            Image.fromarray(img).save(
                base / "Image__8bit_NirRGB" / f"{stem}.png",
                compress_level=1)
            Image.fromarray(m).save(
                base / "Annotation__index" / f"{stem}_15label.png",
                compress_level=1)
            # color masks unused by the recipe (load_color_mask False)
            # but kept layout-complete; tiny palette image saves time
            Image.fromarray(PALETTE[m[::4, ::4]]).save(
                base / "Annotation__color" / f"{stem}_15label.tif")
            print(f"[gen] {split}/{stem}: {time.time() - t0:.1f}s",
                  flush=True)


def _write_config(resume: bool) -> Path:
    cfg = {
        "train": str(ROOT / "Train"),
        "validation": str(ROOT / "Validation"),
        "test": str(ROOT / "Validation"),
        "checkpoint_directory": str(ROOT / "ckpts"),
        "device": "gpu",              # reference vocabulary: != cpu -> TPU
        "net": "Unetv2",
        "epochs": EPOCHS,
        "chunk_size": 2,
        "validation_chunk_size": 2,
        "patch_size": 224,
        "batch_size": 10,
        "loss": "wCEL",
        "opt": "SGD2",
        "ignore_background": True,
        "random_shift": True,
        "augmentation": True,
        "load_context": False,
        "load_color_mask": False,
        "freq": 5,
        "precision_evaluation_freq": EPOCHS,
        "num_classes": 15,
        "verbose": True,
        "precision": "bf16",
        "metrics_log": str(ROOT / "metrics.jsonl"),
        "async_checkpoints": True,
        "keep_checkpoints": 3,
    }
    if resume:
        cfg["load_checkpoint"] = "auto"
    path = ROOT / ("soak_resume.yaml" if resume else "soak.yaml")
    import yaml

    path.write_text(yaml.safe_dump(cfg))
    return path


def run() -> int:
    (ROOT / "ckpts").mkdir(parents=True, exist_ok=True)
    log = open(ROOT / "train.log", "a")
    t_all = time.time()

    cfg_a = _write_config(resume=False)
    print(f"[soak] phase A: {EPOCHS} epochs, SIGTERM at {SIGTERM_S}s",
          flush=True)
    pa = subprocess.Popen(
        [sys.executable, "-m", "cvcs_tpu.cli.train", str(cfg_a)],
        stdout=log, stderr=subprocess.STDOUT, cwd="/root/repo")
    t0 = time.time()
    while pa.poll() is None and time.time() - t0 < SIGTERM_S:
        time.sleep(10)
    if pa.poll() is None:
        print(f"[soak] sending SIGTERM at {time.time() - t0:.0f}s",
              flush=True)
        pa.send_signal(signal.SIGTERM)
        rc = pa.wait()
        print(f"[soak] phase A exited rc={rc} "
              f"(grace {time.time() - t0 - SIGTERM_S:.0f}s past signal)",
              flush=True)
        preempts = list((ROOT / "ckpts").glob("*_preempt"))
        print(f"[soak] preempt checkpoints: {[p.name for p in preempts]}",
              flush=True)
        if not preempts:
            print("[soak] FAIL: no preempt checkpoint written", flush=True)
            return 1
    else:
        print(f"[soak] phase A finished before SIGTERM window "
              f"(rc={pa.returncode}) — no preemption exercised", flush=True)

    cfg_b = _write_config(resume=True)
    print("[soak] phase B: resume with load_checkpoint: auto", flush=True)
    rb = subprocess.run(
        [sys.executable, "-m", "cvcs_tpu.cli.train", str(cfg_b)],
        stdout=log, stderr=subprocess.STDOUT, cwd="/root/repo").returncode
    wall = time.time() - t_all
    print(f"[soak] phase B rc={rb}; TOTAL wall {wall / 3600:.2f}h", flush=True)
    report()
    return rb


def report() -> None:
    path = ROOT / "metrics.jsonl"
    if not path.exists():
        print("[report] no metrics.jsonl yet")
        return
    rows = [json.loads(l) for l in path.read_text().splitlines() if l]
    if not rows:
        print("[report] metrics.jsonl empty")
        return
    warm = rows[1:] or rows   # epoch 1 pays compile + first uploads
    pps = sorted(r["patches_per_s"] for r in warm)
    print(f"[report] epochs logged: {len(rows)} "
          f"(epoch numbers {rows[0]['epoch']}..{rows[-1]['epoch']})")
    print(f"[report] train_loss {rows[0]['train_loss']:.4f} -> "
          f"{rows[-1]['train_loss']:.4f}; val_loss "
          f"{rows[0]['val_loss']:.4f} -> {rows[-1]['val_loss']:.4f}")
    print(f"[report] sustained patches/s: median {pps[len(pps) // 2]:.1f} "
          f"(min {pps[0]:.1f}, max {pps[-1]:.1f}); "
          f"epoch_s median {sorted(r['epoch_s'] for r in warm)[len(warm) // 2]:.1f}")
    total = sum(r["epoch_s"] for r in rows)
    print(f"[report] summed epoch wall {total / 3600:.2f}h over "
          f"{len(rows)} epochs")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "gen":
        gen()
    elif cmd == "run":
        sys.exit(run())
    elif cmd == "report":
        report()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
