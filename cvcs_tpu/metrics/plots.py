"""Evaluation plots: normalized-confusion heatmap and class-prior bars.

Parity surface: `utils.plot_confusion` (`utils.py:421-429`, seaborn heatmap
of the row-normalized confusion with short class labels) and
`utils.plot_priors` (`utils.py:432-470`, horizontal class-share bars colored
with the GID15 palette, totals annotated in megapixels). Rendering is
headless (Agg) and always writes to a path — the reference's interactive
``plt.show()`` fallback makes no sense on a TPU host.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from cvcs_tpu.data.palette import LABELS, PALETTE, SHORT_LABELS  # noqa: E402


def plot_confusion(normalized, path: str) -> None:
    """Heatmap of the row-normalized confusion matrix (`utils.py:421-429`)."""
    normalized = np.asarray(normalized)
    try:
        import pandas as pd
        import seaborn as sn

        df = pd.DataFrame(normalized, SHORT_LABELS[: normalized.shape[0]],
                          SHORT_LABELS[: normalized.shape[1]])
        plt.figure(figsize=(10, 8))
        # reference parity, quirks included: `utils.py:424-425` calls
        # sn.set globally (the font scale deliberately bleeds into the
        # priors plot drawn next, as it does there) and passes annot_kws/
        # fmt WITHOUT annot=True — the published heatmaps carry no cell
        # numbers
        sn.set(font_scale=2.3)
        hm = sn.heatmap(
            df, annot_kws={"size": 20},
            cmap=sn.color_palette("ch:s=.25,rot=-.25", as_cmap=True),
            fmt=".1f")
        hm_ax = hm.figure.axes[-1]
        hm.set_yticklabels(hm.get_yticklabels(), rotation=0)
        hm_ax.tick_params(labelsize=20, labelrotation=0)
    except ImportError:  # pragma: no cover - seaborn is baked in normally
        plt.figure(figsize=(10, 8))
        plt.imshow(normalized, cmap="viridis")
        plt.colorbar()
        plt.xticks(range(normalized.shape[1]),
                   SHORT_LABELS[: normalized.shape[1]], rotation=90)
        plt.yticks(range(normalized.shape[0]),
                   SHORT_LABELS[: normalized.shape[0]])
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close("all")


def plot_priors(conf, path: str, sort: bool = True) -> None:
    """Class-share horizontal bars from confusion-row supports
    (`utils.py:432-470`): palette-colored, labeled in megapixels."""
    conf = np.asarray(conf, np.float64)
    support = conf.sum(axis=1)
    total = support.sum()
    entries = [(i, s / total if total else 0.0, s)
               for i, s in enumerate(support)]
    if sort:
        entries.sort(key=lambda e: e[1])

    fig, ax = plt.subplots()
    fig.set_size_inches(18.5, 10.5)
    y = np.arange(len(entries))
    colors = [tuple(PALETTE[i] / 255.0) for i, _, _ in entries]
    ax.barh(y, [share for _, share, _ in entries], align="center",
            color=colors)
    ax.set_yticks(y, labels=[LABELS[i] for i, _, _ in entries])
    ax.set_xlabel("Class prior")
    ax.set_title("Pixels per class")
    ax.spines["right"].set_visible(False)
    ax.spines["top"].set_visible(False)
    for rect, (_, _, pixels) in zip(ax.patches, entries):
        ax.annotate(
            "{:,.2f}M".format(pixels / 1e6),
            (rect.get_width(), rect.get_y() + rect.get_height() / 2),
            xytext=(3, 0), textcoords="offset points",
            va="center", ha="left", color="black")
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
