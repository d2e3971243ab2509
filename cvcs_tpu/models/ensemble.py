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
    """One voted member: an apply function plus its restored variables.

    ``apply`` may take ``(image, context)`` with the variables already
    closed over (convenient for tests), or — preferred for real
    checkpoints — ``(variables, image, context)`` with ``variables`` held
    here and passed at call time. The latter keeps member weights out of
    the jitted program body: closing big parameter pytrees into a jit
    bakes them into the HLO as constants, which bloats the serialized
    program (this machine's remote-compile tunnel rejects a 3-member
    ensemble outright with HTTP 413) and defeats buffer donation.
    """

    name: str
    apply: Callable[..., jnp.ndarray]
    returns_logits: bool = True
    variables: Any = None   # None -> apply is (image, context)


class Ensemble:
    """Pixelwise majority vote over member predictions (`utils.py:499-507`).

    Not a linen module: the ensemble is a pure function over its members'
    parameters, jittable as a whole via :meth:`vote` with the member
    variables passed as a traced argument.
    """

    requires_context = False
    returns_logits = False
    wrapper = True

    def __init__(self, members: Sequence[EnsembleMember], num_classes: int):
        if not members:
            raise ValueError("ensemble needs at least one member")
        self.members = list(members)
        self.num_classes = num_classes

    @property
    def member_variables(self) -> list:
        return [m.variables for m in self.members]

    def vote(self, member_variables: Sequence[Any], image: jnp.ndarray,
             context: Any = None) -> jnp.ndarray:
        """Member forwards + one-hot vote; ``member_variables`` aligns with
        ``self.members`` (entries ignored for closure-style members)."""
        if len(member_variables) != len(self.members):
            raise ValueError(
                f"{len(member_variables)} variable entries for "
                f"{len(self.members)} members — a silent zip-truncation "
                "here would vote over a subset of the ensemble")
        votes = jnp.zeros(
            image.shape[:1] + image.shape[1:3] + (self.num_classes,),
            jnp.int32)
        for m, mv in zip(self.members, member_variables):
            # dispatch on the member's own style only: closure members
            # ignore their (meaningless) entry, variables members require
            # one — a silently mis-bound `image` arg would be a wrong-
            # results bug, not an error
            if m.variables is None:
                pred = m.apply(image, context)
            else:
                if mv is None:
                    raise ValueError(
                        f"member {m.name!r} holds variables but its "
                        "member_variables entry is None")
                pred = m.apply(mv, image, context)
            if m.returns_logits:
                pred = jnp.argmax(pred, axis=-1)
            votes = votes + jax.nn.one_hot(pred, self.num_classes,
                                           dtype=jnp.int32)
        return jnp.argmax(votes, axis=-1).astype(jnp.int32)

    def apply(self, member_variables: Sequence[Any], image: jnp.ndarray,
              context: Any = None, train: bool = False) -> jnp.ndarray:
        """``model.apply``-shaped adapter so the ensemble drops into the
        engines that take ``(variables, image, context=..., train=...)``
        (e.g. :class:`cvcs_tpu.infer.SceneSegmenter` — the reference's
        `inference.py` accepts ``net: Ensemble`` through ``load_network``,
        `utils.py:174-195`). ``member_variables`` is the traced pytree."""
        del train   # members always run in inference mode
        return self.vote(member_variables, image, context)

    def __call__(self, image: jnp.ndarray, context: Any = None) -> jnp.ndarray:
        return self.vote(self.member_variables, image, context)
