"""Debug plotting — the reference's ``debug_plot`` capability
(`train.py:119-120`, `utils.py:526-554`): dump the first sample of a batch
as an image / color-mask / context figure so augmentation and loader
geometry can be eyeballed."""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from cvcs_tpu.data.palette import GID15Palette  # noqa: E402


def debug_plot(out_dir, epoch: int, chunk: int, batch_index: int,
               image, mask, context=None) -> Path:
    """Write ``debug_e{epoch}_c{chunk}_b{batch}.png`` showing sample 0."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    palette = GID15Palette()
    img = np.asarray(image[0])[..., :3].astype(np.uint8)
    color = np.asarray(palette.decode(np.asarray(mask[0])))
    panels = [("patch", img), ("mask", color)]
    if context is not None:
        panels.append(
            ("context", np.asarray(context[0])[..., :3].astype(np.uint8)))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    for ax, (title, data) in zip(np.atleast_1d(axes), panels):
        ax.imshow(data)
        ax.set_title(title)
        ax.axis("off")
    path = out_dir / f"debug_e{epoch}_c{chunk}_b{batch_index}.png"
    fig.savefig(path, bbox_inches="tight", dpi=80)
    plt.close(fig)
    return path


def plot_activations(features, path, max_channels: int = 64,
                     title: str = "") -> Path:
    """Activation-map grid for one tapped feature map (H, W, C) — the
    retrieval notebook's ``visualize_activations`` capability
    (`retrieval.ipynb` cell 0). Use with
    :func:`cvcs_tpu.retrieval.features.extract_features`."""
    feats = np.asarray(features)
    if feats.ndim == 4:
        feats = feats[0]
    c = min(feats.shape[-1], max_channels)
    cols = 8
    rows = -(-c // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    for i, ax in enumerate(np.asarray(axes).ravel()):
        ax.axis("off")
        if i < c:
            ax.imshow(feats[..., i], cmap="viridis")
    if title:
        fig.suptitle(f"{title} {feats.shape}")
    path = Path(path)
    fig.savefig(path, bbox_inches="tight", dpi=70)
    plt.close(fig)
    return path
