"""Fused weighted softmax cross-entropy as a Pallas TPU kernel.

The training hot loss (`cvcs_tpu.ops.losses.cross_entropy` semantics —
torch ``nn.CrossEntropyLoss`` with optional class weights and
``ignore_index``) fused into a single VMEM pass per direction:

* **Layout**: logits are viewed class-major ``(C, N)`` so the class axis
  (16 for GID15) lives in *sublanes* and pixels stream along the 128-wide
  lane axis — per-pixel reductions (max / logsumexp) are cheap cross-sublane
  VPU ops, and the label "gather" is a one-hot select against a
  broadcasted iota, never a real gather.
* **Forward**: one pass over the logits emitting per-tile partial
  ``sum(w * ce)`` and ``sum(w)``; the scalar loss is their ratio.
* **Backward** (custom VJP): one recompute pass emitting
  ``g * w[label] * (softmax - onehot) / sum_w`` — no softmax residuals are
  stored, trading FLOPs (cheap) for HBM (the bottleneck).

Falls back to the reference jnp implementation on non-TPU backends
(`interpret=True` covers CPU testing). C must be <= the sublane tile; N is
padded to the lane tile with ignored pixels.

Measured on one v5e chip (bs 8 x 224^2 x 16 f32, grad step): this kernel
0.79 ms vs XLA's fused jnp path 0.46 ms — XLA already fuses softmax-CE
into ~2 HBM passes, and the class-major transpose this kernel needs costs
more than the fusion saves at C=16. The jnp path in
:mod:`cvcs_tpu.ops.losses` therefore stays the default; this kernel is the
fused-loss building block for cases where the surrounding program wants
the class-major layout anyway (numerics are bit-stable: grad max-diff vs
the jnp path is ~2e-12 on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - pltpu import works everywhere jax does
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None

TILE_N = 1024  # pixels per grid step (lane-axis length)


def _ce_fwd_kernel(logits_ref, labels_ref, weights_ref, loss_ref, wsum_ref):
    # logits_ref: (C, TILE_N) f32; labels_ref: (1, TILE_N) i32;
    # weights_ref: (C, 1) f32 (weight 0 marks ignored classes/pixels)
    logits = logits_ref[:]
    labels = labels_ref[0, :]
    m = jnp.max(logits, axis=0)
    shifted = logits - m[None, :]
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=0)) + m
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    onehot = (iota == labels[None, :]).astype(jnp.float32)
    true_logit = jnp.sum(onehot * logits, axis=0)
    w = jnp.sum(onehot * weights_ref[:], axis=0)   # w[label] (0 if ignored)
    ce = lse - true_logit

    # TPU grid steps run sequentially: accumulate into one (1, 1) block.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = 0.0
        wsum_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(ce * w)
    wsum_ref[0, 0] += jnp.sum(w)


def _ce_bwd_kernel(logits_ref, labels_ref, weights_ref, scale_ref, dlogits_ref):
    logits = logits_ref[:]
    labels = labels_ref[0, :]
    m = jnp.max(logits, axis=0)
    e = jnp.exp(logits - m[None, :])
    probs = e / jnp.sum(e, axis=0)[None, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    onehot = (iota == labels[None, :]).astype(jnp.float32)
    w = jnp.sum(onehot * weights_ref[:], axis=0)
    dlogits_ref[:] = (probs - onehot) * (w * scale_ref[0, 0])[None, :]


def _prep(logits, labels, weights, ignore_index, num_classes):
    """Flatten to class-major (C, Np) + effective per-class weights."""
    c = num_classes
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_labels = labels.reshape(-1).astype(jnp.int32)
    n = flat_logits.shape[0]
    n_pad = -n % TILE_N
    if n_pad:
        flat_logits = jnp.pad(flat_logits, ((0, n_pad), (0, 0)))
        # padded pixels get an ignored label
        flat_labels = jnp.pad(flat_labels, (0, n_pad),
                              constant_values=-1)
    w = (jnp.ones((c,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))
    if ignore_index is not None and 0 <= ignore_index < c:
        w = w.at[ignore_index].set(0.0)
    # out-of-range labels (incl. the -1 padding) select weight 0 because the
    # one-hot match fails for them
    return flat_logits.T, flat_labels[None, :], w[:, None], n + n_pad


def _grid_call(kernel, n_out, logits_t, labels, weights, *extra,
               interpret=False):
    c, n_total = logits_t.shape
    grid = n_total // TILE_N
    in_specs = [
        pl.BlockSpec((c, TILE_N), lambda i: (0, i), memory_space=_VMEM),
        pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=_VMEM),
        pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=_VMEM),
    ]
    args = [logits_t, labels, weights]
    for arr in extra:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=_SMEM))
        args.append(arr)
    if n_out == "scalars":
        out_shape = (jax.ShapeDtypeStruct((1, 1), jnp.float32),
                     jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs = (
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=_SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=_SMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((c, n_total), jnp.float32)
        out_specs = pl.BlockSpec((c, TILE_N), lambda i: (0, i),
                                 memory_space=_VMEM)
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_cross_entropy(logits, labels, weights, ignore_index=None,
                        interpret=False):
    loss, _ = _fused_ce_fwd(logits, labels, weights, ignore_index, interpret)
    return loss


def _fused_ce_fwd(logits, labels, weights, ignore_index, interpret):
    c = logits.shape[-1]
    logits_t, labels_row, w_col, _ = _prep(
        logits, labels, weights, ignore_index, c)
    loss_sum, wsum = _grid_call(
        _ce_fwd_kernel, "scalars", logits_t, labels_row, w_col,
        interpret=interpret)
    wsum = wsum[0, 0]
    loss = loss_sum[0, 0] / jnp.maximum(wsum, 1e-12)
    return loss, (logits, labels, weights, wsum)


def _fused_ce_bwd(ignore_index, interpret, res, g):
    logits, labels, weights, wsum = res
    c = logits.shape[-1]
    logits_t, labels_row, w_col, n_total = _prep(
        logits, labels, weights, ignore_index, c)
    scale = (g / jnp.maximum(wsum, 1e-12)).reshape(1, 1).astype(jnp.float32)
    dlogits_t = _grid_call(
        _ce_bwd_kernel, "full", logits_t, labels_row, w_col, scale,
        interpret=interpret)
    n = int(np.prod(logits.shape[:-1]))
    dlogits = dlogits_t.T[:n].reshape(logits.shape).astype(logits.dtype)
    return dlogits, None, None


fused_cross_entropy.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def build_fused_ce(weights=None, ignore_background: bool = False,
                   interpret: bool | None = None):
    """Drop-in replacement for ``losses.build_loss('CEL'/'wCEL')`` using the
    Pallas kernel; ``interpret`` defaults to True off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ignore_index = 0 if ignore_background else None
    w = None if weights is None else jnp.asarray(weights, jnp.float32)

    def loss_fn(logits, labels):
        return fused_cross_entropy(logits, labels, w, ignore_index,
                                   interpret)

    return loss_fn
