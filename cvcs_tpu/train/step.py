"""Jitted train / validation / evaluation steps.

One XLA program per step kind (forward+backward+update fused; the state is
donated so parameters update in place in HBM). Under a ``data``-axis mesh
the batch arrives sharded and parameters replicated — XLA's SPMD
partitioner inserts the gradient ``psum`` over ICI automatically; nothing
here is device-count-specific (SURVEY §2.7's TPU-native DP story, replacing
the reference's absent distributed layer).

Reference call-stack parity (`train.py:114-126`): inputs arrive uint8 and
are cast to float inside the step (`train.py:121` ``.float()``), the loss
sees raw logits, and BN statistics update in train mode only.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _train_step_impl(loss_fn: Callable, requires_context: bool = False,
                     update_stats: bool = True, accum: int = 1):
    """Raw (unjitted) train step body shared by the single- and multi-step
    builders.

    ``update_stats=False`` drops the BN running-average update from the
    program: BN still normalizes with the current batch's statistics, so
    losses and gradients are identical. Honest chained-dependency timing
    on v5e (bs 128, rounds 2-3) finds the two paths wall-clock-equivalent
    — a one-session 220 vs 239 ms split did not replicate (same program
    re-measured 238-240 ms; the tunnel has ~8% program-level run
    variance, see BASELINE.md round 3). The option is kept only because
    it pairs with :func:`make_stats_step` for periodic refresh.
    Reference-exact per-step updates are the default and the benched
    path.

    Rematerialization note: a ``jax.checkpoint`` wrap of the whole
    forward was implemented here and MEASURED HARMFUL on v5e (bs 128
    UNetv2: peak HBM 10.7 -> 14.0 GiB, step 239 -> 319 ms) — the
    backward's recompute phase re-materializes everything the plain
    program stored, so nothing is saved and the barrier defeats XLA's
    scheduler. Removed; ``remat`` now means block-level ``nn.remat``
    inside the model (``models/unet.py``), and ``accum`` below is the
    architecture-independent memory lever (measured free).

    ``accum=N`` (gradient accumulation) splits the batch into N
    micro-batches run sequentially under a ``lax.scan`` — one optimizer
    update from the mean of the micro-gradients, so peak activation
    memory is that of a single micro-batch. Torch-accumulation
    semantics: BN normalizes and updates its running stats per
    micro-batch (in order), dropout draws fresh noise per micro-batch,
    and the reported loss is the mean of micro losses (for weighted
    losses such as wCEL that is the mean of per-micro weighted means,
    exactly what a ``loss / N; loss.backward()`` torch loop produces —
    not the unsplit-batch weighted mean). The batch size must be
    divisible by ``accum``; the Trainer routes indivisible tail batches
    to a plain (accum=1) step.
    """

    def forward_grads(state, params, stats, x, mask, ctx, key):
        def compute_loss(p):
            variables = {"params": p, "batch_stats": stats}
            logits, mutated = state.apply_fn(
                variables, x, context=ctx, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            return loss_fn(logits, mask), mutated

        if update_stats:
            (loss, mutated), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(params)
            return loss, grads, mutated.get("batch_stats", stats)
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(p)[0])(params)
        return loss, grads, stats

    def train_step(state, image, mask, context, lr, dropout_key):
        x = image.astype(jnp.float32)
        ctx = context.astype(jnp.float32) if requires_context else None
        base_key = jax.random.fold_in(dropout_key, state.step)

        if accum == 1:
            loss, grads, new_stats = forward_grads(
                state, state.params, state.batch_stats, x, mask, ctx,
                base_key)
        else:
            if x.shape[0] % accum:
                raise ValueError(
                    f"grad_accum={accum} must divide the batch size "
                    f"{x.shape[0]}")
            mb = x.shape[0] // accum
            xs = x.reshape((accum, mb) + x.shape[1:])
            ms = mask.reshape((accum, mb) + mask.shape[1:])
            cs = (ctx.reshape((accum, mb) + ctx.shape[1:])
                  if requires_context else jnp.zeros((accum,), jnp.float32))

            def body(carry, inp):
                stats, gacc, lacc, i = carry
                xi, mi, ci = inp
                loss_i, grads_i, stats = forward_grads(
                    state, state.params, stats, xi, mi,
                    ci if requires_context else None,
                    jax.random.fold_in(base_key, i))
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads_i)
                return (stats, gacc, lacc + loss_i, i + 1), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), state.params)
            (new_stats, gsum, lsum, _), _ = jax.lax.scan(
                body, (state.batch_stats, zero_g, jnp.float32(0),
                       jnp.int32(0)), (xs, ms, cs))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss = lsum / accum

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return train_step


def make_train_step(loss_fn: Callable, requires_context: bool = False,
                    update_stats: bool = True, accum: int = 1):
    """Build the donated train step: (state, batch, lr, key) -> (state, loss)."""
    return partial(jax.jit, donate_argnums=(0,))(
        _train_step_impl(loss_fn, requires_context, update_stats, accum))


def make_multi_train_step(loss_fn: Callable, requires_context: bool = False,
                          update_stats: bool = True, accum: int = 1):
    """Compiled multi-step training: one dispatch runs a `lax.scan` over a
    stacked (K, B, ...) batch sequence — amortizes host->device dispatch
    latency (measured ~2 ms/step through this machine's TPU tunnel, which
    otherwise dominates sub-2ms steps). Returns (state, (K,) losses)."""
    single = _train_step_impl(loss_fn, requires_context, update_stats,
                              accum)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, images, masks, contexts, lr, dropout_key):
        def body(st, xs):
            img, msk, ctx = xs
            st, loss = single(st, img, msk, ctx, lr, dropout_key)
            return st, loss

        return jax.lax.scan(body, state, (images, masks, contexts))

    return multi_step


def make_stats_step(requires_context: bool = False):
    """BN running-stats refresh: one forward in train mode, returning only
    the updated ``batch_stats`` — the companion of the fast
    ``update_stats=False`` train path (run once per chunk/epoch; the EMA
    converges to the same fixed point as per-step updates, only with a
    longer time constant)."""

    @jax.jit
    def stats_step(state, image, context):
        x = image.astype(jnp.float32)
        ctx = context.astype(jnp.float32) if requires_context else None
        _, mutated = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, context=ctx, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)})
        return state.replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats))

    return stats_step


def make_loss_step(loss_fn: Callable, requires_context: bool = False):
    """Validation-loss step (`utils.validation_loss`, `utils.py:106-126`)."""

    @jax.jit
    def loss_step(state, image, mask, context):
        x = image.astype(jnp.float32)
        ctx = context.astype(jnp.float32) if requires_context else None
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, x, context=ctx, train=False)
        return loss_fn(logits, mask)

    return loss_step


def make_predict_step(returns_logits: bool = True,
                      requires_context: bool = False):
    """Inference/eval step: (state, image, context) -> int32 label map."""

    @jax.jit
    def predict_step(state, image, context):
        x = image.astype(jnp.float32)
        ctx = context.astype(jnp.float32) if requires_context else None
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = state.apply_fn(variables, x, context=ctx, train=False)
        if returns_logits:
            out = jnp.argmax(out, axis=-1)
        return out.astype(jnp.int32)

    return predict_step
