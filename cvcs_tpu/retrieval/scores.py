"""Mask-similarity retrieval scores.

Parity surface: `retrieval.ipynb` cell 0 (SURVEY §2.6) — given a target
index mask and a stack of query masks:

* ``miou``   — mean IoU over classes, background excluded (the notebook's
  ``torchmetrics...mean_iou(..., include_background=False)``);
* ``wiou``   — support-weighted Jaccard (``multiclass_jaccard_index(...,
  'weighted', ignore_index=0)``);
* ``pprec``  — pixel-overlap precision ``sum(q == t & t != 0) / nnz(t)``;
* ``emd``    — earth mover's distance between the masks' 15-bin foreground
  class histograms via the cumsum-L1 identity (notebook cites
  arXiv 1611.05916); histogram bins cover classes 1..num_classes-1
  (``torch.histc(bins=n-1, min=1, max=n)`` semantics: zeros excluded).

All batched over queries and jit-compatible (pure jnp); the notebook loops
per query on the CPU.

``scores_evaluation`` reproduces the notebook's retrieval-agreement
benchmark (cell 63): top1/top5/top10 and top5-to-K agreement between the
EMD ranking and an embedding-distance ranking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def class_hist(mask: jnp.ndarray, nclasses: int) -> jnp.ndarray:
    """Per-class pixel share incl. background (notebook ``class_hist``)."""
    counts = jnp.bincount(
        jnp.asarray(mask).reshape(-1).astype(jnp.int32), length=nclasses)
    return counts / jnp.asarray(mask).size


def _foreground_hist(mask: jnp.ndarray, nclasses: int) -> jnp.ndarray:
    """Normalized histogram over classes 1..nclasses-1 (zeros dropped)."""
    counts = jnp.bincount(
        jnp.asarray(mask).reshape(-1).astype(jnp.int32),
        length=nclasses)[1:].astype(jnp.float32)
    total = jnp.sum(counts)
    return jnp.where(total > 0, counts / jnp.maximum(total, 1), 0.0)


def _class_inter_union(t: jnp.ndarray, q: jnp.ndarray, num_classes: int):
    """Per-foreground-class (inter, union, target support), each
    (B, C-1) / (C-1,). Loops over the small class axis so temporaries
    stay (B, N) — the previous one-shot (B, C-1, N) one-hot
    materialization needed >11 GB at a 5000-patch candidate pool."""
    inters, unions, supports = [], [], []
    for c in range(1, num_classes):
        tm = t == c                    # (N,)
        qm = q == c                    # (B, N)
        inters.append(jnp.sum(qm & tm[None], axis=-1))
        unions.append(jnp.sum(qm | tm[None], axis=-1))
        supports.append(jnp.sum(tm))
    return (jnp.stack(inters, axis=1), jnp.stack(unions, axis=1),
            jnp.stack(supports).astype(jnp.float32))


def per_image_miou(target: jnp.ndarray, queries: jnp.ndarray,
                   num_classes: int) -> jnp.ndarray:
    """Per-query mean IoU over foreground classes; classes absent from both
    masks are excluded from the mean (torchmetrics ``mean_iou`` with
    ``include_background=False``)."""
    t = jnp.asarray(target).reshape(-1)
    q = jnp.asarray(queries).reshape(queries.shape[0], -1)
    inter, union, _ = _class_inter_union(t, q, num_classes)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    present = union > 0
    return jnp.sum(iou, axis=1) / jnp.maximum(jnp.sum(present, axis=1), 1)


def per_image_wiou(target: jnp.ndarray, queries: jnp.ndarray,
                   num_classes: int) -> jnp.ndarray:
    """Support-weighted Jaccard with background ignored (the notebook's
    ``multiclass_jaccard_index(..., 'weighted', 0)``): per-class IoU
    weighted by the class's share of the target's pixels."""
    t = jnp.asarray(target).reshape(-1)
    q = jnp.asarray(queries).reshape(queries.shape[0], -1)
    inter, union, support = _class_inter_union(t, q, num_classes)
    weights = support / jnp.maximum(jnp.sum(support), 1)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    return jnp.sum(iou * weights[None, :], axis=1)


def pixel_precision(target: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """``sum(q == t & t != 0) / nnz(t)`` (notebook ``pixel_precision``)."""
    t = jnp.asarray(target)
    q = jnp.asarray(queries)
    hits = jnp.sum((q == t[None]) & (t[None] != 0), axis=(-1, -2))
    return hits / jnp.maximum(jnp.count_nonzero(t), 1)


def per_image_emd(target: jnp.ndarray, queries: jnp.ndarray,
                  nbins: int) -> jnp.ndarray:
    """Cumsum-L1 EMD between foreground class histograms."""
    t_hist = _foreground_hist(target, nbins)
    cs_t = jnp.cumsum(t_hist)
    # one vmapped program, not an eager per-query dispatch loop
    q_hists = jax.vmap(lambda q: _foreground_hist(q, nbins))(
        jnp.asarray(queries))
    cs_q = jnp.cumsum(q_hists, axis=-1)
    return jnp.sum(jnp.abs(cs_t[None] - cs_q), axis=-1)


def compute_scores(target: jnp.ndarray, queries: jnp.ndarray,
                   num_classes: int) -> dict:
    """All four mask-similarity scores (notebook ``compute_scores``)."""
    return {
        "miou": per_image_miou(target, queries, num_classes),
        "wiou": per_image_wiou(target, queries, num_classes),
        "pprec": pixel_precision(target, queries),
        "emd": per_image_emd(target, queries, num_classes),
    }


def get_best_match_idx(selected_score: str, scores: dict) -> int:
    """Higher-is-better for overlap scores, lower for EMD."""
    if selected_score in ("miou", "wiou", "pprec"):
        return int(jnp.argmax(scores[selected_score]))
    if selected_score == "emd":
        return int(jnp.argmin(scores[selected_score]))
    raise ValueError(f"'{selected_score}' is not a valid metric")


def scores_evaluation(emd_rankings: list, other_rankings: list,
                      silent: bool = False) -> dict:
    """Retrieval-agreement benchmark (notebook cell 63).

    Each ranking is a list (one per probe) of candidate ids sorted
    best-first. Returns top1/top5/top10 and top5toK agreement of the
    embedding ranking against the EMD ranking.
    """
    dim = len(emd_rankings)
    agg = dict(top1=0.0, top5=0.0, top10=0.0, top5to5=0.0,
               top5to10=0.0, top5to20=0.0, top5to50=0.0)
    for emd_r, other_r in zip(emd_rankings, other_rankings):
        emd_best5 = list(emd_r[:5])
        other50 = list(other_r[:50])
        agg["top1"] += (emd_best5[0] == other50[0]) / dim
        agg["top5"] += (emd_best5[0] in other50[:5]) / dim
        agg["top10"] += (emd_best5[0] in other50[:10]) / dim
        agg["top5to5"] += sum(d in other50[:5] for d in emd_best5) / (5 * dim)
        agg["top5to10"] += sum(d in other50[:10] for d in emd_best5) / (5 * dim)
        agg["top5to20"] += sum(d in other50[:20] for d in emd_best5) / (5 * dim)
        agg["top5to50"] += sum(d in other50 for d in emd_best5) / (5 * dim)
    if not silent:
        print(" ".join(f"{k}={v:.3f}" for k, v in agg.items()), flush=True)
    return agg


def rank_candidates(score_values: np.ndarray, higher_better: bool) -> list:
    order = np.argsort(np.asarray(score_values))
    return list(order[::-1] if higher_better else order)
