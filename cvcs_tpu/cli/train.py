"""``python -m cvcs_tpu.cli.train <config.yaml>`` — the reference's
`train.py` surface: chunked training with augmentation, class-balanced
loss, per-epoch validation, periodic confusion-matrix evaluation,
checkpoint/resume (`train.py:1-169`)."""

from __future__ import annotations

import sys
import traceback

import jax.numpy as jnp

from cvcs_tpu.cli import common
from cvcs_tpu.config.loader import TRAIN_KEYS, validate_keys
from cvcs_tpu.data.augment import AugmentConfig
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)
from cvcs_tpu.train.state import param_count
from cvcs_tpu.utils.tables import get_table_cls


def build_trainer(config: dict) -> Trainer:
    validate_keys(config, TRAIN_KEYS,
                  {"train", "validation", "net", "epochs", "chunk_size",
                   "patch_size", "batch_size", "loss", "opt",
                   "checkpoint_directory"}, "train")
    # augmentation: True -> reference torchvision preset; "fused" -> the
    # Pallas one-pass dihedral preset
    aug_flag = config.get("augmentation")
    if aug_flag == "fused":
        augment = AugmentConfig(mode="fused")
    elif aug_flag:
        augment = AugmentConfig()
    else:
        augment = None
    seed = int(config.get("seed", 0))
    in_channels = int(config.get("in_channels", 3))  # 4 = NirRGB 4-band
    loader_train = ChunkLoader(
        config["train"], config["chunk_size"],
        patch_size=config["patch_size"],
        random_shift=bool(config.get("random_shift")),
        augment=augment,
        load_context=bool(config.get("load_context")),
        in_channels=in_channels,
        seed=seed)
    loader_val = ChunkLoader(
        config["validation"],
        config.get("validation_chunk_size", config["chunk_size"]),
        patch_size=config["patch_size"],
        load_context=bool(config.get("load_context")),
        in_channels=in_channels,
        seed=seed + 1)
    if config.get("debug"):
        # debug: 2 train scenes / 1 validation scene (`train.py:33-35`)
        loader_train.specify([0, 1])
        loader_val.specify([0])

    model, spec, num_classes = common.build_net(config)
    optimizer = build_optimizer(config["opt"], epochs=config["epochs"])

    t = get_table_cls()(["Name", "Value"])
    example = jnp.zeros(
        (config["batch_size"], config["patch_size"], config["patch_size"],
         in_channels), jnp.uint8)
    example_ctx = example if spec.requires_context else None
    state = create_train_state(model, optimizer, example, example_ctx,
                               seed=seed)
    t.add_row(["parameters", param_count(state.params)])
    t.add_row(["Patch size", loader_train.patch_size])
    t.add_row(["Tpe", loader_train.tpi])
    t.add_row(["Training patches",
               len(loader_train.idxs) * loader_train.tpi])
    t.add_row(["Validation patches",
               len(loader_val.idxs) * loader_val.tpi])
    print(t, flush=True)

    weights = None
    if config["loss"] == "wCEL":
        print("Computing class weights, it might take several minutes...",
              flush=True)
        weights = loader_train.class_weights(
            num_classes, bool(config.get("ignore_background")))
        from cvcs_tpu.data.palette import LABELS
        wt = get_table_cls()(["Class", "Weight"])
        for i, w in enumerate(weights):
            wt.add_row([LABELS.get(i, str(i)), float(w)])
        print(wt, flush=True)
    loss_fn = build_loss(config["loss"], weights=weights,
                         ignore_background=bool(
                             config.get("ignore_background")))

    train_cfg = TrainConfig(
        epochs=config["epochs"],
        batch_size=config["batch_size"],
        checkpoint_directory=config["checkpoint_directory"],
        freq=config.get("freq", 1),
        precision_evaluation_freq=config.get("precision_evaluation_freq", 10),
        num_classes=int(config.get("num_classes", 15)),
        ignore_background=bool(config.get("ignore_background")),
        random_tps=config.get("random_tps"),
        verbose=bool(config.get("verbose")),
        seed=seed,
        debug_plot=bool(config.get("debug_plot")),
        steps_per_call=int(config.get("steps_per_call", 1)),
        metrics_log=config.get("metrics_log"),
        bn_exact_stats=bool(config.get("bn_exact_stats", True)),
        async_checkpoints=bool(config.get("async_checkpoints", False)),
        eval_downscale=int(config.get("eval_downscale", 1)),
        keep_checkpoints=(int(config["keep_checkpoints"])
                          if config.get("keep_checkpoints") else None),
        grad_accum=int(config.get("grad_accum", 1)))
    if train_cfg.eval_downscale > 1 and \
            int(config["patch_size"]) % train_cfg.eval_downscale:
        # fail at config time, not hours later at the first periodic eval
        raise ValueError(
            f"eval_downscale={train_cfg.eval_downscale} must divide "
            f"patch_size={config['patch_size']}")
    if train_cfg.grad_accum < 1:
        raise ValueError(
            f"grad_accum={train_cfg.grad_accum} must be >= 1 "
            "(1 disables accumulation)")
    if train_cfg.grad_accum > 1 and \
            train_cfg.batch_size % train_cfg.grad_accum:
        raise ValueError(
            f"grad_accum={train_cfg.grad_accum} must divide "
            f"batch_size={train_cfg.batch_size}")

    mesh = common.mesh_from_config(config)
    if (mesh is not None and mesh.devices.size > 1
            and config["net"].startswith("Swin")):
        # the fused Pallas window-attention train pair (default on
        # single-chip, BASELINE.md round-5 train pass) is an opaque op
        # to the SPMD partitioner — under a multi-device mesh it would
        # force full-frame gathers, so default it off here; set
        # CVCS_TPU_FUSED_ATTN_TRAIN=1 to override after profiling
        import os

        if os.environ.setdefault("CVCS_TPU_FUSED_ATTN_TRAIN", "0") == "0":
            print(
                "[cvcs_tpu] note: multi-device mesh with a Swin net — "
                "fused window-attention training disabled (einsum path; "
                "an unpartitioned pallas_call would force GSPMD "
                "gathers); CVCS_TPU_FUSED_ATTN_TRAIN=1 overrides",
                flush=True)
    if mesh is not None and dict(mesh.shape).get("spatial", 1) > 1:
        import jax

        flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
        if any("ConvTranspose" in jax.tree_util.keystr(path)
               for path, _ in flat):
            # measured hazard (BASELINE.md §Blocked, round 3): the SPMD
            # partitioner reports involuntary re-materialization for
            # transpose-conv decoders under row sharding; correctness is
            # pinned but step time may regress — say so where the user
            # turns it on, not only in the perf doc
            print(
                "[cvcs_tpu] warning: mesh spatial="
                f"{dict(mesh.shape)['spatial']} with a transpose-conv "
                f"decoder net ({config['net']}): XLA's SPMD partitioner "
                "reports involuntary re-materialization for transpose "
                "convs under row sharding — profile a step on real "
                "hardware before production use (BASELINE.md §Blocked)",
                flush=True)
        if config["net"].startswith(("Swin", "Segformer")):
            # measured (round-5 HLO census, tools/spatial_hlo_audit.py):
            # roll/window-partition (Swin) and sr-attention (SegFormer)
            # each cost a handful of full-frame all-gathers under row
            # sharding — bounded (total gather volume ~ one activation,
            # far below the grad all-reduce), but not free
            print(
                "[cvcs_tpu] note: mesh spatial="
                f"{dict(mesh.shape)['spatial']} with an attention net "
                f"({config['net']}): GSPMD inserts a handful of "
                "full-frame all-gathers around window/roll (Swin) or "
                "sr-attention (SegFormer) ops — bounded volume by HLO "
                "census, but profile a step before production use "
                "(BASELINE.md round-5 spatial audit)",
                flush=True)
    trainer = Trainer(model, spec, state, optimizer, loss_fn,
                      loader_train, loader_val, train_cfg,
                      mesh=mesh)
    ckpt = config.get("load_checkpoint")
    if ckpt == "auto":
        # crash-resume: pick up the newest checkpoint in the directory
        # (elastic-recovery convenience the reference lacks, SURVEY §5)
        from cvcs_tpu.train.checkpoint import latest_checkpoint
        ckpt = latest_checkpoint(config["checkpoint_directory"])
        if ckpt is None:
            print("No checkpoint to resume from; starting fresh",
                  flush=True)
    if ckpt:
        trainer.resume(ckpt)
    return trainer


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        try:
            trainer = build_trainer(config)
        except Exception:
            traceback.print_exc()
            print("Error in setting up training.")
            return 1
        from cvcs_tpu.utils.profiling import trace
        trainer.install_preemption_handler()
        with trace(config.get("profile_dir")):
            trainer.train()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
