"""Segmentation losses (fused, f32-accumulating, NHWC logits).

Parity surface: the reference's loss factory (`utils.py:223-242`) — "CEL"
(``nn.CrossEntropyLoss(ignore_index=0 if ignore_background else -100)``),
"wCEL" (CE with class-balanced weights from the train set), "MSE" — plus
Dice, which the reference's config README advertises but never implemented
(`configs/train/README.txt:55-59`, SURVEY quirk 10).

Semantics match torch exactly:

* ``cross_entropy`` reduces as torch's weighted mean —
  ``sum(w[t_i] * ce_i) / sum(w[t_i])`` over non-ignored pixels (plain mean
  when no weights).
* ``ignore_index`` pixels contribute neither numerator nor denominator.

TPU notes: the softmax-CE is computed as a fused log-sum-exp minus a
one-hot gather, in f32 regardless of logits dtype (bf16 logits upcast
once); XLA fuses the whole reduction into a couple of kernels. A Pallas
fusion of [softmax-CE + weight gather + valid mask] exists in
:mod:`cvcs_tpu.ops.pallas_ce` for the hot training path on patch-sized
logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,        # (..., C) float
    labels: jnp.ndarray,        # (...,) int
    weights: jnp.ndarray | None = None,   # (C,) float
    ignore_index: int | None = None,
) -> jnp.ndarray:
    """torch ``nn.CrossEntropyLoss`` semantics on NHWC logits."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    # out-of-range labels (e.g. 255-coded void pixels) are EXCLUDED from
    # the loss: torch raises "Target out of bounds" there, and the old
    # clip-to-C-1 silently trained those pixels toward the last class —
    # zero-weighting is the in-jit analogue of torch's loud failure
    valid = ((labels >= 0) & (labels < num_classes)).astype(jnp.float32)
    if ignore_index is not None:
        valid = jnp.where(labels == ignore_index, 0.0, valid)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)

    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    # One-hot select instead of take_along_axis: per-pixel gathers are
    # pathologically slow on TPU — profiling showed the gather alone costing
    # 98 ms of a 334 ms UNetv2 train step (bs 128); the one-hot
    # multiply-sum fuses into the surrounding elementwise passes.
    class_iota = jnp.arange(num_classes, dtype=jnp.int32)
    onehot = (safe_labels[..., None] == class_iota).astype(jnp.float32)
    true_logit = jnp.sum(logits * onehot, axis=-1)
    ce = lse - true_logit

    if weights is not None:
        w = jnp.sum(jnp.asarray(weights, jnp.float32) * onehot,
                    axis=-1) * valid
    else:
        w = valid
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)


def mse(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Reference "MSE" (`utils.py:239-240`): mean squared error between the
    per-class scores and the one-hot target."""
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    return jnp.mean(jnp.square(logits - onehot))


def dice(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int | None = None,
    eps: float = 1.0,
) -> jnp.ndarray:
    """Soft multiclass Dice loss (macro-averaged over classes).

    The reference documents-but-lacks this ("DL", SURVEY quirk 10); provided
    as a first-class loss here.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if ignore_index is not None:
        keep = (labels != ignore_index)[..., None].astype(jnp.float32)
        probs = probs * keep
        onehot = onehot * keep
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice_c = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice_c)


def dice_cross_entropy(
    logits, labels, weights=None, ignore_index=None, dice_weight: float = 0.5
):
    """CE + Dice blend ("DEL" in the reference's config docs)."""
    return (1.0 - dice_weight) * cross_entropy(
        logits, labels, weights, ignore_index
    ) + dice_weight * dice(logits, labels, ignore_index)


LOSSES = {
    "CEL": lambda logits, labels, weights, ignore_index: cross_entropy(
        logits, labels, None, ignore_index),
    "wCEL": cross_entropy,
    "MSE": lambda logits, labels, weights, ignore_index: mse(logits, labels),
    "DL": lambda logits, labels, weights, ignore_index: dice(
        logits, labels, ignore_index),
    "DEL": dice_cross_entropy,
}


def build_loss(name: str, weights=None, ignore_background: bool = False):
    """Loss factory with the reference's config names (`utils.py:223-242`).

    Returns ``fn(logits, labels) -> scalar``. "CEL"/"wCEL" ignore class 0
    when ``ignore_background`` (the reference's ``ignore_index=0``).
    """
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(LOSSES)}")
    if name == "wCEL" and weights is None:
        raise ValueError("wCEL requires class weights")
    ignore_index = 0 if ignore_background else None
    fn = LOSSES[name]
    w = None if weights is None else jnp.asarray(weights, jnp.float32)

    def loss_fn(logits, labels):
        return fn(logits, labels, w, ignore_index)

    return loss_fn
