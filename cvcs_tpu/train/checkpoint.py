"""Checkpoint / resume — the reference's one real auxiliary subsystem.

Format parity with `utils.save_model` (`utils.py:128-142`) / the resume path
(`train.py:74-100`): a checkpoint directory ``checkpoint{epoch+1}`` holding

* the train-state pytree (params / batch_stats / optimizer state) — saved
  with Orbax (async-capable, TPU-native, sharding-aware), and
* ``meta.json`` with the reference's 12-key metadata surface: epoch,
  training/validation loss histories, batch_size (which resume *re-imposes
  over the config*, `train.py:89` — quirk 5 kept), optimizer name, and the
  flat + normalized confusion matrices of the last precision evaluation.

Orbax writes atomically; ``latest_checkpoint`` resolves the newest epoch.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^checkpoint(\d+)(_preempt)?$")


def jnp_leaf_cast(value, template):
    """Cast a restored leaf to the template leaf's dtype (shape must match)."""
    arr = np.asarray(value)
    if tuple(arr.shape) != tuple(template.shape):
        raise ValueError(
            f"restored leaf shape {arr.shape} != expected {template.shape}")
    return arr.astype(template.dtype)


def _to_jsonable(x):
    if isinstance(x, (np.ndarray, jax.Array)):
        return np.asarray(x).tolist()
    return x


_async_ckptr: "ocp.AsyncCheckpointer | None" = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint write lands."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    directory: str | Path,
    epoch: int,
    state,
    train_loss: list[float],
    val_loss: list[float],
    batch_size: int,
    optimizer: str,
    conf_flat: Any = None,
    conf_normalized: Any = None,
    async_save: bool = False,
    tag: str = "",
) -> Path:
    """Write ``<dir>/checkpoint{epoch+1}{tag}`` (name parity:
    `utils.py:142`).

    ``async_save=True`` overlaps the array write with the next epoch's
    compute (Orbax AsyncCheckpointer); call :func:`wait_for_saves` before
    process exit or before restoring the same path.

    ``tag`` distinguishes out-of-band saves — the preemption path uses
    ``tag="_preempt"`` so a mid-epoch eviction never overwrites the last
    epoch-boundary checkpoint (whose confusion histories would be lost,
    and which must survive if the grace window expires mid-write).
    """
    directory = Path(directory)
    path = directory / f"checkpoint{epoch + 1}{tag}"
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()   # at most one write in flight
        ckptr.save((path / "state").absolute(), tree, force=True)
    else:
        ocp.PyTreeCheckpointer().save(
            (path / "state").absolute(), tree, force=True)
    meta = {
        "epoch": epoch,
        "training_loss_values": [float(v) for v in train_loss],
        "validation_loss_values": [float(v) for v in val_loss],
        "batch_size": int(batch_size),
        "optimizer": optimizer,
        "conf_flat": _to_jsonable(conf_flat),
        "conf_normalized": _to_jsonable(conf_normalized),
        # deprecated in the reference, kept as keys for format parity
        "macro_precision": [],
        "weighted_precision": [],
    }
    # atomic: a crash mid-write must not leave a truncated meta.json next
    # to a finalized state/ — latest_checkpoint would select it and every
    # `load_checkpoint: auto` restart would die parsing it
    tmp = path / "meta.json.tmp"
    tmp.write_text(json.dumps(meta))
    tmp.replace(path / "meta.json")
    return path


def load_checkpoint(path: str | Path, state):
    """Restore ``state``'s pytree (template = freshly-initialized state) and
    the metadata dict. Mirrors `train.py:74-100` incl. graceful handling of
    checkpoints with missing metadata keys."""
    path = Path(path)
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    # Orbax round-trips tuples (optax states) as lists, so the restored
    # treedef differs from the live one. Leaf order is stable, so restore
    # raw and unflatten into the template's structure, re-imposing each
    # leaf's dtype and sharding.
    raw = ckptr.restore((path / "state").absolute())
    leaves = jax.tree_util.tree_leaves(raw)
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint at {path} has {len(leaves)} leaves, expected "
            f"{len(t_leaves)} — incompatible model/optimizer")
    placed = [
        jax.device_put(jnp_leaf_cast(lv, tv), tv.sharding)
        if isinstance(tv, jax.Array) else lv
        for lv, tv in zip(leaves, t_leaves)
    ]
    restored = jax.tree_util.tree_unflatten(treedef, placed)
    meta_path = path / "meta.json"
    meta = {}
    if meta_path.exists():
        try:
            meta = json.loads(meta_path.read_text())
        except json.JSONDecodeError:
            # pre-atomic-write checkpoints could carry a torn meta.json;
            # degrade like the reference does for old checkpoints
            # (`train.py:82-85`): weights restore, histories reset
            print(f"WARNING: {meta_path} is corrupt — restoring weights "
                  "with empty metadata (epoch/histories reset)",
                  flush=True)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, meta


def load_model_variables(path: str | Path, template: dict) -> dict:
    """Restore only model variables (params + batch_stats) for
    evaluation/inference — the reference's `utils.load_checkpoint`
    eval-side use (`utils.py:282-299`). ``template`` is a freshly
    initialized ``{"params": ..., "batch_stats": ...}``."""
    path = Path(path)
    raw = ocp.PyTreeCheckpointer().restore((path / "state").absolute())
    out = {}
    for key in ("params", "batch_stats"):
        sub_t = template.get(key, {})
        sub_r = raw.get(key, {})
        t_leaves = jax.tree_util.tree_leaves(sub_t)
        r_leaves = jax.tree_util.tree_leaves(sub_r)
        if len(t_leaves) != len(r_leaves):
            raise ValueError(
                f"checkpoint {path} '{key}' has {len(r_leaves)} leaves, "
                f"expected {len(t_leaves)}")
        placed = [
            jax.device_put(jnp_leaf_cast(lv, tv), tv.sharding)
            if isinstance(tv, jax.Array) else lv
            for lv, tv in zip(r_leaves, t_leaves)
        ]
        out[key] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(sub_t), placed)
    return out


def latest_checkpoint(directory: str | Path) -> Path | None:
    """Highest-numbered *finalized* ``checkpoint{N}`` under ``directory``.

    A checkpoint is finalized once Orbax's atomic rename lands the
    ``state`` subdirectory; with ``async_save=True`` meta.json is written
    while the array write is still in flight, so a crash can leave a
    ``checkpoint{N}/`` holding only meta.json (or an
    ``*.orbax-checkpoint-tmp-*`` dir). Skipping those keeps
    ``load_checkpoint: auto`` crash-resumable — it falls back to the last
    complete epoch instead of dying on a half-written one.
    """
    directory = Path(directory)
    if not directory.is_dir():
        return None
    best, best_key = None, (-1, 0)
    for child in directory.iterdir():
        m = _CKPT_RE.match(child.name)
        if not m or not (child / "state").is_dir():
            continue
        # checkpoint{N}_preempt holds mid-epoch-N weights — strictly newer
        # than checkpoint{N} (the epoch N-1 boundary), strictly older than
        # checkpoint{N+1}
        key = (int(m.group(1)), 1 if m.group(2) else 0)
        if key > best_key:
            best, best_key = child, key
    return best


def prune_checkpoints(directory: str | Path, keep: int) -> list[Path]:
    """Delete all but the newest ``keep`` COMPLETE checkpoints (framework
    extension — the reference keeps every epoch's full state forever,
    `utils.py:128-142`, which for a production run is unbounded disk).

    Ranked like :func:`latest_checkpoint` (``checkpoint{N}_preempt`` sits
    between epochs N and N+1). A checkpoint whose ``state`` directory has
    not been finalized yet (an in-flight async save) is neither counted
    nor touched, so the guarantee is "at least ``keep`` complete
    checkpoints survive". Returns the deleted paths.
    """
    import shutil

    directory = Path(directory)
    if keep < 1 or not directory.is_dir():
        return []
    ranked = []
    for child in directory.iterdir():
        m = _CKPT_RE.match(child.name)
        if m and (child / "state").is_dir():
            ranked.append(((int(m.group(1)), 1 if m.group(2) else 0),
                           child))
    ranked.sort()
    doomed = [c for _, c in ranked[:-keep]]
    for c in doomed:
        shutil.rmtree(c)
    return doomed
