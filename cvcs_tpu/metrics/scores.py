"""Confusion-derived scores: the reference's exact metric math.

Formulas and edge cases mirror `utils.py:301-403` bit-for-bit:

* per-class tp = conf[i, i], fp = colsum - tp, fn = rowsum - tp
  (`utils.py:331-334`);
* precision tp/(tp+fp), recall tp/(tp+fn), IoU tp/(tp+fp+fn),
  F1/Dice 2tp/(2tp+fp+fn) (`utils.py:301-317`);
* a class is *excluded* (score 0, dropped from the macro mean) when
  precision: tp+fp == 0; recall/IoU/F1: tp+fn == 0 — note F1 reuses IoU's
  ignore condition, as the reference does (`utils.py:364-366`);
* overall accuracy = trace / sum (`utils.py:369-373`);
* ``print_metrics`` renders the same PrettyTable layout and returns the
  same dict keys (`utils.py:375-403`).

This is 16x16 host math — numpy, not jitted, by design.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from cvcs_tpu.data.palette import LABELS


def _tp_fp_fn(conf: np.ndarray, i: int) -> tuple[float, float, float]:
    tp = float(conf[i, i])
    fp = float(conf[:, i].sum()) - tp
    fn = float(conf[i, :].sum()) - tp
    return tp, fp, fn


def _class_scores(
    conf: np.ndarray,
    formula: Callable[[float, float, float], float],
    ignored: Callable[[float, float, float], bool],
) -> tuple[np.ndarray, list[int]]:
    scores, excluded = [], []
    for i in range(conf.shape[0]):
        tp, fp, fn = _tp_fp_fn(conf, i)
        if ignored(tp, fp, fn):
            scores.append(0.0)
            excluded.append(i)
        else:
            scores.append(formula(tp, fp, fn))
    return np.asarray(scores), excluded


def _mean_excluding(scores: np.ndarray, excluded: list[int]) -> float:
    included = [x for i, x in enumerate(scores) if i not in excluded]
    return float(np.mean(included)) if included else float("nan")


def _wrap(conf, formula, ignored, mean: bool, return_excluded: bool):
    conf = np.asarray(conf)
    scores, excluded = _class_scores(conf, formula, ignored)
    if mean:
        m = _mean_excluding(scores, excluded)
        return (m, excluded) if return_excluded else m
    return (scores, excluded) if return_excluded else scores


def precision(conf, macro: bool = False, return_excluded: bool = False):
    return _wrap(conf, lambda tp, fp, fn: tp / (tp + fp),
                 lambda tp, fp, fn: tp + fp == 0, macro, return_excluded)


def recall(conf, macro: bool = False, return_excluded: bool = False):
    return _wrap(conf, lambda tp, fp, fn: tp / (tp + fn),
                 lambda tp, fp, fn: tp + fn == 0, macro, return_excluded)


def iou(conf, mean: bool = False, return_excluded: bool = False):
    return _wrap(conf, lambda tp, fp, fn: tp / (tp + fn + fp),
                 lambda tp, fp, fn: tp + fn == 0, mean, return_excluded)


def f1(conf, mean: bool = False, return_excluded: bool = False):
    # F1 deliberately reuses IoU's ignore condition (`utils.py:364-366`).
    return _wrap(conf, lambda tp, fp, fn: (2 * tp) / (2 * tp + fn + fp),
                 lambda tp, fp, fn: tp + fn == 0, mean, return_excluded)


def accuracy(conf) -> float:
    conf = np.asarray(conf, np.float64)
    total = conf.sum()
    return float(np.trace(conf) / total) if total else float("nan")


def compute_metrics(conf) -> dict:
    """All headline scores as a dict (keys match `utils.py:398-403`)."""
    values, excluded = iou(conf, mean=False, return_excluded=True)
    return {
        "perclass_IoU": values.tolist(),
        "mIoU": iou(conf, mean=True),
        "precision_score": precision(conf, macro=True),
        "recall_score": recall(conf, macro=True),
        "dice_score": f1(conf, mean=True),
        "oa_score": accuracy(conf),
        "excluded": excluded,
    }


def print_metrics(conf, silent: bool = False) -> dict:
    """PrettyTable report identical in layout to the reference
    (`utils.py:375-403`); returns the metric dict."""
    from cvcs_tpu.utils.tables import get_table_cls

    PrettyTable = get_table_cls()

    m = compute_metrics(conf)
    t = PrettyTable(["Metric", "Score"])
    t.align = "r"
    t.add_row(["mIoU", m["mIoU"]])
    t.add_row(["mPrec", m["precision_score"]])
    t.add_row(["mRec", m["recall_score"]])
    t.add_row(["Dice", m["dice_score"]])
    t.add_row(["OA", m["oa_score"]])
    if not silent:
        print(t)
    iou_table = PrettyTable(["Class", "IoU"])
    iou_table.align = "r"
    for i, score in enumerate(m["perclass_IoU"]):
        iou_table.add_row([LABELS.get(i, str(i)), score])
    if not silent:
        print(f"Excluded classes (not in target): {m['excluded']}")
        print(iou_table, flush=True)
    return {k: v for k, v in m.items() if k != "excluded"}
