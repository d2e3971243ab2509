"""YAML config loading + display.

The reference's whole CLI is ``python3 <script>.py <config.yaml>`` with the
raw dict passed around (`train.py:11-14`, SURVEY L0). This module keeps
that contract — the same YAML files drive this framework — and adds the
light validation the reference lacks (unknown-key warnings, required-key
errors with the key list from `configs/train/README.txt`).
"""

from __future__ import annotations

from pathlib import Path

import yaml

# config-key vocabulary per job type (`configs/*/README.txt`, SURVEY §5)
TRAIN_KEYS = {
    "debug", "debug_plot", "verbose", "train", "validation", "test",
    "checkpoint_directory", "load_checkpoint", "device", "net",
    "load_context", "epochs", "chunk_size", "validation_chunk_size",
    "patch_size", "batch_size", "random_shift", "augmentation",
    "random_tps", "loss", "opt", "ignore_background", "freq",
    "precision_evaluation_freq", "num_classes", "load_color_mask",
    # framework extensions
    "precision", "mesh", "seed", "in_channels", "profile_dir",
    "steps_per_call", "metrics_log", "bn_exact_stats",
    "async_checkpoints", "eval_downscale", "keep_checkpoints", "remat",
    "grad_accum",
}
EVAL_KEYS = {
    "dataset", "net", "load_checkpoint", "patch_size", "load_context",
    "load_color_mask", "num_classes", "ignore_background", "verbose",
    "confusion_matrix", "priors", "images", "device", "ensemble_config",
    "precision", "batch_size", "in_channels", "mesh",
}
INFER_KEYS = {
    "dataset", "net", "load_checkpoint", "patch_size", "border_correction",
    "range", "mask_only", "out_image", "num_classes", "device", "output",
    "precision", "bug_parity", "batch_tiles", "load_context", "verbose",
    "mesh", "tta", "in_channels", "stream_rows", "ensemble_config",
    "fullconv_bands", "fullconv_chunks",
}
# framework-added entry points (no reference analogue for serve; esa.py /
# retrieval.ipynb had no configs) — validated like the original three so a
# typo like `border_corection` warns instead of silently running default
SERVE_KEYS = {
    "watch_dir", "output", "net", "load_checkpoint", "ensemble_config",
    "patch_size", "border_correction", "batch_tiles", "tta", "num_classes",
    "precision", "in_channels", "mesh", "device",
    "poll_s", "settle_s", "max_batch", "max_retries", "max_polls",
}
ESA_KEYS = {
    "image", "net", "load_checkpoint", "ensemble_config", "patch_size",
    "border_correction", "batch_tiles", "tta", "out_image", "output",
    "num_classes", "precision", "in_channels", "mesh", "device",
}
RETRIEVE_KEYS = {
    "dataset", "patch_size", "net", "load_checkpoint", "pool", "metric",
    "num_probes", "topk", "images", "num_classes", "seed", "batch_size",
    "precision", "in_channels", "device",
}


def load_yaml(path: str | Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def display_configs(config: dict) -> None:
    """PrettyTable dump of the config (`utils.py:405-410`)."""
    from cvcs_tpu.utils.tables import get_table_cls

    t = get_table_cls()(["Name", "Value"])
    t.align = "r"
    for key, value in config.items():
        t.add_row([key, value])
    print(t, flush=True)


def validate_keys(config: dict, allowed: set, required: set, job: str) -> None:
    missing = required - set(config)
    if missing:
        raise KeyError(f"{job} config missing required keys: {sorted(missing)}")
    unknown = set(config) - allowed
    if unknown:
        print(f"[cvcs_tpu] warning: unknown {job} config keys ignored: "
              f"{sorted(unknown)}", flush=True)
