"""Majority-vote ensemble meta-model.

Parity surface: the reference's ``Ensemble`` (`utils.py:472-507`) — load N
member nets from an ensemble config (net name -> checkpoint), forward =
per-member argmax then pixelwise majority vote. ``returns_logits = False``:
the forward already emits hard labels.

TPU-first: the reference votes with ``torch.mode`` *on the CPU*, one
device->host copy per member per patch (`utils.py:504-507`, SURVEY quirk 11).
Here the vote is a one-hot sum + argmax that stays on device and jits into
the same XLA program as the member forwards. Tie-breaking matches
``torch.mode`` (smallest label wins): ``argmax`` returns the first maximum.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EnsembleMember:
    """One voted member: an apply function closed over its variables."""

    name: str
    apply: Callable[..., jnp.ndarray]   # (image, context) -> logits or labels
    returns_logits: bool = True


class Ensemble:
    """Pixelwise majority vote over member predictions (`utils.py:499-507`).

    Not a linen module: members carry their own (already-restored)
    parameters; the ensemble is a pure function over them, jittable as a
    whole.
    """

    requires_context = False
    returns_logits = False
    wrapper = True

    def __init__(self, members: Sequence[EnsembleMember], num_classes: int):
        if not members:
            raise ValueError("ensemble needs at least one member")
        self.members = list(members)
        self.num_classes = num_classes

    def __call__(self, image: jnp.ndarray, context: Any = None) -> jnp.ndarray:
        votes = jnp.zeros(
            image.shape[:1] + image.shape[1:3] + (self.num_classes,),
            jnp.int32)
        for m in self.members:
            pred = m.apply(image, context)
            if m.returns_logits:
                pred = jnp.argmax(pred, axis=-1)
            votes = votes + jax.nn.one_hot(pred, self.num_classes,
                                           dtype=jnp.int32)
        return jnp.argmax(votes, axis=-1).astype(jnp.int32)
