"""On-device confusion-matrix accumulation.

The reference accumulates a 16x16 confusion matrix with torchmetrics'
``MulticlassConfusionMatrix`` on the *host*, one device->host copy per eval
patch (`utils.py:76-94`, SURVEY §3.1 hot spot). Here the matrix lives on
device as a (C, C) int32 array and each batch folds in with a single
``bincount`` over flattened ``target * C + pred`` indices — one fused XLA
kernel, no host traffic; across a mesh the partial matrices ``psum`` over
ICI (`cvcs_tpu.train.loop` / `cvcs_tpu.cli.evaluate`).

Overflow budget: int32 per-cell holds > 2.1e9 pixels; one GID15 scene is
49 Mpx, so a device matrix safely accumulates ~40 scenes. Drivers fold each
chunk's matrix into a host-side int64 total (:class:`HostConfusion`), which
is exact for any dataset size — one host sync per chunk, not per patch.

Layout matches torchmetrics: ``conf[target, pred]``; ``ignore_index``
pixels (background when ``ignore_background``) are dropped entirely.
``normalize_rows`` reproduces ``normalize='true'`` (row = target support).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(num_classes: int = 16) -> jnp.ndarray:
    """Fresh (C, C) int32 zero matrix (device accumulator)."""
    return jnp.zeros((num_classes, num_classes), jnp.int32)


@partial(jax.jit, static_argnames=("num_classes", "ignore_index"),
         donate_argnums=(0,))
def update_confusion(
    conf: jnp.ndarray,
    pred: jnp.ndarray,     # (...,) int — predicted labels
    target: jnp.ndarray,   # (...,) int — ground truth
    num_classes: int = 16,
    ignore_index: int | None = None,
) -> jnp.ndarray:
    """Fold one batch into the confusion matrix (torchmetrics ``update``)."""
    t = target.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < num_classes) & (p >= 0) & (p < num_classes)
    if ignore_index is not None:
        valid &= t != ignore_index
    # One-hot contraction instead of bincount scatter: conf = T^T @ P with
    # T/P the (N, C) one-hots — a (C, N) x (N, C) matmul that streams on
    # the MXU (TPU scatters/gathers are slow; same lesson as ops/losses.py).
    # f32 accumulation is exact up to 2^24 pixels per batch per cell; the
    # drivers fold into an int64 host total per chunk (HostConfusion).
    t_onehot = jax.nn.one_hot(jnp.where(valid, t, num_classes),
                              num_classes, dtype=jnp.float32)
    p_onehot = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    batch = jax.lax.dot_general(
        t_onehot, p_onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return conf + batch.astype(jnp.int32)


def normalize_rows(conf) -> np.ndarray | jnp.ndarray:
    """Row-normalized confusion (torchmetrics ``normalize='true'``); zero
    rows stay zero (torchmetrics emits NaN there — we use 0 for plotting)."""
    if isinstance(conf, np.ndarray):
        conf = conf.astype(np.float64)
        row = conf.sum(axis=1, keepdims=True)
        return np.where(row > 0, conf / np.maximum(row, 1), 0.0)
    conf = conf.astype(jnp.float32)
    row = jnp.sum(conf, axis=1, keepdims=True)
    return jnp.where(row > 0, conf / jnp.maximum(row, 1), 0.0)


class HostConfusion:
    """Exact int64 host-side total; fold device chunk matrices into it."""

    def __init__(self, num_classes: int = 16):
        self.num_classes = num_classes
        self.total = np.zeros((num_classes, num_classes), np.int64)

    def fold(self, device_conf: jnp.ndarray) -> None:
        self.total += np.asarray(device_conf, np.int64)

    def normalized(self) -> np.ndarray:
        return normalize_rows(self.total)
