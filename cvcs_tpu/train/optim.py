"""Optimizer factory with the reference's exact recipes.

Parity surface: ``utils.load_optimizer`` (`utils.py:208-221`):

* ``SGD1`` — SGD(lr 1e-3, momentum 0.9, weight_decay 1e-5) + PolynomialLR
  (torch defaults: total_iters 5, power 1.0);
* ``SGD2`` — SGD(lr 6e-3, momentum 0.9, weight_decay 1e-5) +
  PolynomialLR(total_iters=20);
* ``ADAM1`` — Adam(lr 5e-3) + PolynomialLR(total_iters=epochs, power 2.0).

torch semantics preserved exactly:

* coupled weight decay (L2 added to the gradient *before* the momentum
  buffer, like ``torch.optim.SGD(weight_decay=...)``) — optax
  ``add_decayed_weights`` placed before ``trace``;
* the momentum buffer accumulates raw (grad + wd * p); the learning rate
  multiplies the buffer at apply time — so the LR is injected at the end
  of the chain and can change per epoch without perturbing momentum;
* ``PolynomialLR`` steps **per epoch** (`train.py:132-133`):
  ``lr(e) = lr0 * (1 - min(e, T)/T) ** power`` — zero after T epochs.

The returned transforms are pure pytree ops: they jit into the train step
and shard trivially (optimizer state inherits the params' sharding).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import optax


def polynomial_lr(lr0: float, total_iters: int, power: float = 1.0
                  ) -> Callable[[int], float]:
    """torch ``PolynomialLR``: decay factor over *epochs*, 0 beyond T."""

    def schedule(epoch: int) -> float:
        t = min(epoch, total_iters)
        return lr0 * (1.0 - t / total_iters) ** power

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimizerBundle:
    """A gradient transform (everything except the LR) + per-epoch LR."""

    name: str
    tx: optax.GradientTransformation     # produces the *descent direction*
    lr_for_epoch: Callable[[int], float]

    def init(self, params):
        return self.tx.init(params)


def build_optimizer(name: str, epochs: int | None = None) -> OptimizerBundle:
    """Reference optimizer names -> bundle (`utils.py:208-221`)."""
    if name == "SGD1":
        tx = optax.chain(
            optax.add_decayed_weights(1e-5),
            optax.trace(decay=0.9),
        )
        return OptimizerBundle(name, tx, polynomial_lr(1e-3, 5))
    if name == "SGD2":
        tx = optax.chain(
            optax.add_decayed_weights(1e-5),
            optax.trace(decay=0.9),
        )
        return OptimizerBundle(name, tx, polynomial_lr(6e-3, 20))
    if name == "ADAM1":
        if epochs is None:
            raise ValueError("ADAM1's schedule needs the epoch count "
                             "(reference: total_iters=config['epochs'])")
        tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        return OptimizerBundle(name, tx, polynomial_lr(5e-3, epochs, 2.0))
    raise ValueError(f"Optimizer name not valid: {name!r}")
