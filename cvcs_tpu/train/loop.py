"""Epoch / chunk / batch training orchestration.

Call-stack parity with `train.py:104-169`: per-epoch scene reshuffle, chunk
loop, per-batch loss appended to the training history, per-epoch scheduler
step and validation loss, confusion-matrix evaluation every
``precision_evaluation_freq`` epochs, checkpoint every ``freq`` epochs,
resume from ``load_checkpoint``.

TPU-first differences (SURVEY §7): batches are device-resident gathers from
a chunk materialized in HBM, the train step is one donated XLA program, the
loss history syncs to host once per chunk (not per batch — the reference's
``loss.item()`` per step stalls the pipeline), evaluation accumulates a
confusion matrix on device with one fold per chunk, and everything shards
over a ``data``-axis mesh when more than one device is present.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.core import mesh as mesh_lib
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.metrics import confusion, scores
from cvcs_tpu.train import checkpoint as ckpt_lib
from cvcs_tpu.train.optim import OptimizerBundle
from cvcs_tpu.train.state import TrainState
from cvcs_tpu.train.step import (
    make_loss_step,
    make_multi_train_step,
    make_predict_step,
    make_stats_step,
    make_train_step,
)


@partial(jax.jit, static_argnums=(2,))
def _downscale_batch(image, mask, ds: int):
    """1/ds-resolution eval batch: box-mean the uint8 image (antialiased
    integer downsample), nearest-subsample the label mask."""
    b, h, w, c = image.shape
    img = image.astype(jnp.float32).reshape(
        b, h // ds, ds, w // ds, ds, c).mean(axis=(2, 4))
    return jnp.round(img).astype(jnp.uint8), mask[:, ::ds, ::ds]


@dataclasses.dataclass
class TrainConfig:
    """The reference's train-config vocabulary (`configs/train/README.txt`)."""

    epochs: int
    batch_size: int
    checkpoint_directory: str
    freq: int = 1                        # checkpoint every N epochs
    precision_evaluation_freq: int = 10  # confusion eval every N epochs
    num_classes: int = 15                # foreground classes (bg added on top)
    ignore_background: bool = False
    random_tps: list | None = None
    verbose: bool = False
    seed: int = 0
    debug_plot: bool = False      # dump first sample per chunk (`train.py:119`)
    debug_dir: str = "debug"
    # compiled multi-step: K optimizer steps per device dispatch (lax.scan
    # over stacked micro-batches). 1 = reference-style per-batch dispatch.
    steps_per_call: int = 1
    # structured observability: JSONL per-epoch metrics (SURVEY §5 — the
    # reference has no structured logging)
    metrics_log: str | None = None
    # True (default) = reference-exact per-batch BN running-stat updates;
    # False trains without materializing the stats update and refreshes
    # running stats once per chunk instead (identical losses/gradients —
    # BN normalizes with batch statistics in train mode regardless; no
    # measured wall-clock difference on v5e, kept as an option)
    bn_exact_stats: bool = True
    # overlap checkpoint writes with the next epoch (Orbax async)
    async_checkpoints: bool = False
    # retention: keep only the newest N complete checkpoints (None =
    # reference behavior, keep every epoch's state forever)
    keep_checkpoints: int | None = None
    # (rematerialization is a model-construction concern — `remat: true`
    # in a train config builds the net with block-level nn.remat, see
    # cli/common.build_net; a step-level jax.checkpoint was measured
    # HARMFUL and removed, train/step.py docstring)
    # gradient accumulation: split each batch into N sequential
    # micro-batches (peak activation memory of one micro-batch, one
    # optimizer update per batch — torch `loss/N; backward()` loop
    # semantics, BN stats update per micro-batch). batch_size % N == 0;
    # indivisible tail batches run the plain step
    grad_accum: int = 1
    # periodic (precision_evaluation_freq) confusion evals run on 1/N-
    # resolution patches (2x2 box-mean image, nearest mask) — ~N² cheaper
    # on giant validation sets. 1 (default) = reference-exact full-res
    # eval; the approximation only affects the *periodic* metric readout,
    # never the trained model or a standalone `cvcs-evaluate` run.
    eval_downscale: int = 1


class Trainer:
    """Drives training of one model over train/validation ChunkLoaders."""

    def __init__(
        self,
        model,
        spec,
        state: TrainState,
        optimizer: OptimizerBundle,
        loss_fn: Callable,
        train_loader: ChunkLoader,
        val_loader: ChunkLoader,
        config: TrainConfig,
        mesh=None,
        log: Callable[[str], None] = lambda s: print(s, flush=True),
    ):
        self.model = model
        self.spec = spec
        self.state = state
        self.optimizer = optimizer
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config
        self.mesh = mesh
        self.log = log
        self._loss_fn = loss_fn   # resume() may need to rebuild steps

        if config.grad_accum < 1:
            raise ValueError(
                f"grad_accum={config.grad_accum} must be >= 1")
        if config.grad_accum > 1 and config.batch_size % config.grad_accum:
            # without this, every full batch silently routes to plain_step
            # (accumulation off, no memory savings) and the stacked
            # multi-step path raises at trace time
            raise ValueError(
                f"batch_size={config.batch_size} must be divisible by "
                f"grad_accum={config.grad_accum}")
        update_stats = config.bn_exact_stats
        self.train_step = make_train_step(
            loss_fn, spec.requires_context, update_stats,
            config.grad_accum)
        # tail batches whose size grad_accum doesn't divide fall back to
        # the unsplit step (same optimizer-update-per-batch contract)
        self.plain_step = (self.train_step if config.grad_accum == 1 else
                           make_train_step(loss_fn, spec.requires_context,
                                           update_stats))
        self.multi_step = (
            make_multi_train_step(loss_fn, spec.requires_context,
                                  update_stats, config.grad_accum)
            if config.steps_per_call > 1 else None)
        self.stats_step = (None if update_stats
                           else make_stats_step(spec.requires_context))
        self.loss_step = make_loss_step(loss_fn, spec.requires_context)
        self.predict_step = make_predict_step(
            spec.returns_logits, spec.requires_context)
        self.dropout_key = jax.random.key(config.seed ^ 0xD0)

        self.training_loss_values: list[float] = []
        self.validation_loss_values: list[float] = []
        self.conf_history: list[Any] = []
        self.last_epoch = 0
        self.last_metrics: dict | None = None
        self._preempted = False

    def install_preemption_handler(self, signums=None) -> None:
        """Preemption-safe training (SURVEY §5; TPU pods get evicted with
        a SIGTERM grace window): on the signal, finish the in-flight
        chunk, write ``checkpoint{epoch}_preempt`` (so
        ``load_checkpoint: auto`` resumes by replaying the interrupted
        epoch from the preempted weights; the distinct name keeps the
        last boundary checkpoint intact), and return cleanly from
        :meth:`train`. A signal landing during the end-of-epoch
        validation/evaluation exits after that epoch's boundary work
        instead of running into the next epoch."""
        import signal

        for s in (signums or (signal.SIGTERM,)):
            signal.signal(s, lambda *_: setattr(self, "_preempted", True))

    # -- resume ------------------------------------------------------------
    def resume(self, path: str | Path) -> None:
        """`train.py:74-100`: restore state + histories; the checkpoint's
        batch_size overrides the config (quirk 5, kept)."""
        self.state, meta = ckpt_lib.load_checkpoint(path, self.state)
        self.training_loss_values = meta.get("training_loss_values", [])
        self.validation_loss_values = meta.get("validation_loss_values", [])
        self.last_epoch = int(meta.get("epoch", -1)) + 1
        if meta.get("batch_size"):
            self.config.batch_size = int(meta["batch_size"])
            if self.config.grad_accum > 1 and \
                    self.config.batch_size % self.config.grad_accum:
                # the override would route full batches to the unsplit
                # fallback AND crash the stacked multi-step path at trace
                # time (its scan body has no fallback) — disable
                # accumulation coherently and say so loudly
                self.log(
                    f"WARNING: checkpoint batch_size "
                    f"{self.config.batch_size} is not divisible by "
                    f"grad_accum={self.config.grad_accum}; DISABLING "
                    "gradient accumulation (full-batch activation "
                    "memory — lower batch_size if this OOMs)")
                self.config.grad_accum = 1
                self.train_step = self.plain_step
                if self.multi_step is not None:
                    self.multi_step = make_multi_train_step(
                        self._loss_fn, self.spec.requires_context,
                        self.config.bn_exact_stats)
        self.log(f"Resumed from {path} at epoch {self.last_epoch} "
                 f"(batch_size={self.config.batch_size})")

    # -- device placement ---------------------------------------------------
    def _shard(self, *arrays, batch_axis: int = 0):
        """Shard the batch axis over the ``data`` mesh axis and — when the
        mesh has a live ``spatial`` axis — the patch-row axis over it
        (GSPMD spatial partitioning: XLA halo-exchanges convolutions
        automatically, so big-patch training scales past one chip's HBM;
        conv window reductions are never split, only the BN batch-stat
        reductions gain a psum — float-level reassociation, same class as
        the DP gradient psum). For stacked multi-step arrays (K, B, ...)
        the batch axis is 1 — the scan axis K must stay unsharded."""
        if self.mesh is None or np.prod(tuple(self.mesh.shape.values())) == 1:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        n_sp = self.mesh.shape.get(mesh_lib.SPATIAL_AXIS, 1)

        def put(a):
            if a is None:
                return None
            spec = [None] * a.ndim
            if a.ndim > batch_axis and a.shape[batch_axis] % n_data == 0:
                spec[batch_axis] = mesh_lib.DATA_AXIS
            h_axis = batch_axis + 1
            # image (B,H,W,C) / mask (B,H,W): rows over `spatial` when
            # they divide; anything lower-rank (loss vectors, valid
            # flags) stays batch-only
            if (n_sp > 1 and a.ndim > h_axis + 1
                    and a.shape[h_axis] % n_sp == 0):
                spec[h_axis] = mesh_lib.SPATIAL_AXIS
            sharding = NamedSharding(self.mesh, P(*spec))
            if jax.process_count() > 1:
                # multi-host (mesh spans processes): every process holds
                # the same global batch (the ChunkLoaders are seeded and
                # deterministic), so extract this host's shards from it —
                # device_put cannot place onto non-addressable devices
                a = np.asarray(a)
                return jax.make_array_from_process_local_data(
                    sharding, a, a.shape)
            return jax.device_put(a, sharding)

        return tuple(put(a) for a in arrays)

    # -- main loop -----------------------------------------------------------
    def train(self) -> TrainState:
        cfg = self.config
        bs = cfg.batch_size
        num_classes = cfg.num_classes + 1
        for epoch in range(self.last_epoch, cfg.epochs):
            self.log(f"Started epoch {epoch + 1}")
            t_epoch = time.time()
            lr = self.optimizer.lr_for_epoch(epoch)
            self.train_loader.shuffle()
            n_patches = 0
            n_train_before = len(self.training_loss_values)
            # Losses are harvested one chunk LATE: chunk c+1's host decode
            # + device upload runs while chunk c's steps are still
            # executing (dispatch is async; the device_get below is the
            # only sync point). Costs one extra chunk of HBM residency,
            # hides the loader entirely behind compute.
            pending_losses = None

            def harvest(losses):
                flat = np.concatenate([np.asarray(v).reshape(-1)
                                       for v in jax.device_get(losses)])
                self.training_loss_values += [float(x) for x in flat]
                if not np.isfinite(flat).all():
                    # failure detection (SURVEY §5): a NaN/inf loss means
                    # the optimizer state is already poisoned — halt
                    # instead of burning the rest of the schedule. The
                    # deferred harvest surfaces it one chunk late; the
                    # last on-disk checkpoint predates the divergence.
                    i = int(np.argmax(~np.isfinite(flat)))
                    step = len(self.training_loss_values) - len(flat) + i
                    raise FloatingPointError(
                        f"non-finite training loss ({flat[i]}) at epoch "
                        f"{epoch + 1}, global step {step + 1} — training "
                        "diverged (check lr/loss config); resume from the "
                        "last checkpoint with a safer schedule")

            for c in range(len(self.train_loader)):
                chunk = self.train_loader.get_chunk(c, cfg.random_tps)
                chunk_losses = []
                tail_start = 0
                last_batch = None
                if self.multi_step is not None:
                    k = cfg.steps_per_call
                    for images, masks, ctxs, n_micro in \
                            chunk.stacked_batches(bs, k):
                        if cfg.debug_plot and tail_start == 0:
                            # first-sample-per-chunk debug contract
                            # (`train.py:119`): the stacked path consumes
                            # batch 0, so the single-step dump below
                            # never sees it
                            from cvcs_tpu.utils.debug import debug_plot
                            debug_plot(
                                cfg.debug_dir, epoch, c, 0, images[0],
                                masks[0],
                                ctxs[0] if self.spec.requires_context
                                else None)
                        images, masks, ctxs = self._shard(
                            images, masks, ctxs, batch_axis=1)
                        self.state, losses = self.multi_step(
                            self.state, images, masks, ctxs,
                            jnp.float32(lr), self.dropout_key)
                        chunk_losses.append(losses)
                        n_patches += int(n_micro * bs)
                        tail_start += n_micro * bs
                # drop_last=False, natural-size tail: the reference trains
                # on the final partial batch too (`train.py:110` DataLoader
                # default) — round-1 silently dropped it (Weak #6)
                for b_idx, batch in enumerate(
                        chunk.batches(bs, drop_last=False, pad_tail=False)):
                    if b_idx * bs < tail_start:
                        continue   # already consumed by the stacked path
                    if cfg.debug_plot and b_idx == 0:
                        from cvcs_tpu.utils.debug import debug_plot
                        debug_plot(cfg.debug_dir, epoch, c, b_idx,
                                   batch.image, batch.mask, batch.context)
                    image, mask, ctx = self._shard(
                        batch.image, batch.mask, batch.context)
                    if ctx is None:
                        ctx = jnp.zeros((), jnp.uint8)  # placeholder leaf
                    step_fn = (self.train_step
                               if image.shape[0] % cfg.grad_accum == 0
                               else self.plain_step)
                    self.state, loss = step_fn(
                        self.state, image, mask, ctx,
                        jnp.float32(lr), self.dropout_key)
                    chunk_losses.append(loss)
                    n_patches += int(image.shape[0])
                    last_batch = batch
                if self.stats_step is not None and last_batch is None:
                    last_batch = next(chunk.batches(bs, drop_last=True),
                                      None)
                if self.stats_step is not None and last_batch is not None:
                    # fast-path BN: refresh running stats once per chunk
                    image, _, ctx = self._shard(
                        last_batch.image, last_batch.mask,
                        last_batch.context)
                    if ctx is None:
                        ctx = jnp.zeros((), jnp.uint8)
                    self.state = self.stats_step(self.state, image, ctx)
                # one host sync per chunk, one chunk behind (multi-step
                # entries are (K,) arrays)
                if pending_losses is not None:
                    harvest(pending_losses)
                pending_losses = chunk_losses
                if self._preempted:
                    harvest(pending_losses)
                    # land any in-flight async boundary save FIRST — it may
                    # target this directory, and two writers racing on the
                    # recovery state is exactly the failure preemption
                    # handling exists to prevent
                    ckpt_lib.wait_for_saves()
                    ckpt_lib.save_checkpoint(
                        cfg.checkpoint_directory, epoch - 1, self.state,
                        self.training_loss_values,
                        self.validation_loss_values, bs,
                        self.optimizer.name, tag="_preempt")
                    if cfg.keep_checkpoints:
                        ckpt_lib.prune_checkpoints(
                            cfg.checkpoint_directory, cfg.keep_checkpoints)
                    self.log(
                        f"Preemption save: epoch {epoch + 1} interrupted "
                        f"after chunk {c + 1}; wrote "
                        f"checkpoint{epoch}_preempt — resume replays this "
                        "epoch from the preempted weights")
                    return self.state
            if pending_losses is not None:
                harvest(pending_losses)
            epoch_s = time.time() - t_epoch
            if cfg.verbose and self.training_loss_values:
                self.log(
                    f"Epoch {epoch + 1}: loss="
                    f"{self.training_loss_values[-1]:.4f} "
                    f"({n_patches / max(epoch_s, 1e-9):.1f} patches/s)")

            self.log("Running validation...")
            n_val_before = len(self.validation_loss_values)
            self.validation_loss_values += self.validation_loss()

            if cfg.metrics_log:
                import json
                with open(cfg.metrics_log, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch + 1,
                        "lr": lr,
                        # mean over THIS epoch's entries (counting by
                        # n_patches // bs undercounts whenever chunks end
                        # in partial tail batches)
                        "train_loss": (
                            float(np.mean(
                                self.training_loss_values[n_train_before:]))
                            if len(self.training_loss_values) > n_train_before
                            else None),
                        "val_loss": (
                            float(np.mean(
                                self.validation_loss_values[n_val_before:]))
                            if len(self.validation_loss_values) > n_val_before
                            else None),
                        "patches_per_s": n_patches / max(epoch_s, 1e-9),
                        "epoch_s": epoch_s,
                    }) + "\n")

            if (epoch + 1) % cfg.precision_evaluation_freq == 0:
                self.log(f"Evaluating precision after epoch {epoch + 1}")
                host_conf = self.evaluate(
                    num_classes, downscale=cfg.eval_downscale)
                self.last_metrics = scores.print_metrics(host_conf.total)
                self.conf_history.append(host_conf.total)

            if (epoch + 1) % cfg.freq == 0:
                # full confusion histories, like the reference's conf_flat /
                # conf_normalized lists (`utils.py:128-142`)
                ckpt_lib.save_checkpoint(
                    cfg.checkpoint_directory, epoch, self.state,
                    self.training_loss_values, self.validation_loss_values,
                    bs, self.optimizer.name,
                    conf_flat=[np.asarray(m).tolist()
                               for m in self.conf_history],
                    conf_normalized=[
                        np.asarray(confusion.normalize_rows(m)).tolist()
                        for m in self.conf_history],
                    async_save=cfg.async_checkpoints)
                self.log(f"Saved checkpoint {epoch + 1}")
                if cfg.keep_checkpoints:
                    for old in ckpt_lib.prune_checkpoints(
                            cfg.checkpoint_directory,
                            cfg.keep_checkpoints):
                        self.log(f"Pruned {old.name}")

            if self._preempted:
                # the signal landed during validation/evaluation: this
                # epoch is COMPLETE, so exit on a normal boundary
                # checkpoint instead of training a full chunk of the next
                # epoch before noticing (the grace window is short)
                ckpt_lib.wait_for_saves()
                if (epoch + 1) % cfg.freq != 0:   # no boundary save above
                    # carry the confusion histories too — this epoch may
                    # have just run a precision eval, and resume picks
                    # THIS checkpoint
                    ckpt_lib.save_checkpoint(
                        cfg.checkpoint_directory, epoch, self.state,
                        self.training_loss_values,
                        self.validation_loss_values, bs,
                        self.optimizer.name,
                        conf_flat=[np.asarray(m).tolist()
                                   for m in self.conf_history],
                        conf_normalized=[
                            np.asarray(confusion.normalize_rows(m)).tolist()
                            for m in self.conf_history])
                if cfg.keep_checkpoints:
                    ckpt_lib.prune_checkpoints(
                        cfg.checkpoint_directory, cfg.keep_checkpoints)
                self.log(f"Preemption save: stopped after completed epoch "
                         f"{epoch + 1}; wrote checkpoint{epoch + 1}")
                return self.state

        ckpt_lib.wait_for_saves()   # land any in-flight async checkpoint
        if cfg.keep_checkpoints:
            # with async saves the in-loop prune skips in-flight writes;
            # now that everything has landed, tighten to exactly N
            for old in ckpt_lib.prune_checkpoints(
                    cfg.checkpoint_directory, cfg.keep_checkpoints):
                self.log(f"Pruned {old.name}")
        self.log("Training Done!")
        if self.training_loss_values:
            self.log(f"Reached training loss: {self.training_loss_values[-1]}")
        if self.validation_loss_values:
            self.log("Reached validation loss: "
                     f"{self.validation_loss_values[-1]}")
        return self.state

    # -- validation / evaluation ---------------------------------------------
    def validation_loss(self) -> list[float]:
        """`utils.validation_loss` (`utils.py:106-126`)."""
        values = []
        for c in range(len(self.val_loader)):
            chunk = self.val_loader.get_chunk(c, shuffle_patches=False)
            # reference `validation_loss` also sees the final partial batch
            for batch in chunk.batches(self.config.batch_size,
                                       drop_last=False, pad_tail=False):
                image, mask, ctx = self._shard(
                    batch.image, batch.mask, batch.context)
                if ctx is None:
                    ctx = jnp.zeros((), jnp.uint8)
                values.append(self.loss_step(self.state, image, mask, ctx))
        return [float(v) for v in jax.device_get(values)]

    def evaluate(self, num_classes: int = 16,
                 batch_size: int = 8,
                 downscale: int = 1) -> confusion.HostConfusion:
        """`utils.eval_model` (`utils.py:59-103`) — device-side confusion
        accumulation, one host fold per chunk. Uses a real batch size
        instead of the reference's batch_size=1 eval (same math, ~8x fewer
        dispatches). ``downscale > 1`` evaluates on 1/N-resolution patches
        (box-mean image, nearest mask) — an opt-in ~N²-cheaper approximate
        readout for giant validation sets (``eval_downscale`` config)."""
        ignore = 0 if self.config.ignore_background else None
        host = confusion.HostConfusion(num_classes)
        for c in range(len(self.val_loader)):
            chunk = self.val_loader.get_chunk(c, shuffle_patches=False)
            conf = confusion.confusion_matrix(num_classes)
            for batch in chunk.batches(batch_size, drop_last=False):
                image, mask, ctx = self._shard(
                    batch.image, batch.mask, batch.context)
                if ctx is None:
                    ctx = jnp.zeros((), jnp.uint8)
                if downscale > 1:
                    image, mask = _downscale_batch(image, mask, downscale)
                pred = self.predict_step(self.state, image, ctx)
                if batch.valid is not None:
                    # mask out padding samples via an out-of-range target
                    mask = jnp.where(
                        batch.valid[:, None, None], mask, num_classes + 1)
                conf = confusion.update_confusion(
                    conf, pred, mask, num_classes=num_classes,
                    ignore_index=ignore)
            host.fold(conf)
        return host
