"""Deep-feature embedding extraction for retrieval.

Parity surface: `retrieval.ipynb` cells 6-14 & 37-83 (SURVEY §2.6) — the
notebook taps intermediate activations with torch forward hooks
(``Urnetv2.encode5``, DeepLab ``model.backbone`` 'out', SegFormer encoder
hidden state) and ranks images by embedding distance (L1/L2/cosine).

Here the taps are flax ``capture_intermediates`` filters — no hooks, no
module surgery; the tapped forward jits like any other program:

* UNet family      -> deepest encoder level (x5, 1024 ch), the notebook's
  ``encode5`` tap;
* DeepLabV3        -> backbone "out" feature map (the notebook max-pools
  MobileNet's 960 planes into a 960-d embedding);
* SegFormer        -> last encoder stage (the HF ``last_hidden_state``).

Embeddings are the spatially max-pooled planes (notebook convention for
MobileNet; mean-pool available via ``pool="mean"``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

def _tap_filter(model):
    """Returns a capture_intermediates filter selecting the tap module."""
    name = type(model).__name__
    if name == "UNet":
        return lambda mdl, _: type(mdl).__name__ == "_Encoder"
    if name == "DeepLabV3":
        backbones = ("MobileNetV3Backbone", "ResNet", "GoogLeNetBackbone",
                     "_ResNet18Adapter")
        return lambda mdl, _: type(mdl).__name__ in backbones
    if name == "SegFormer":
        return lambda mdl, _: type(mdl).__name__ == "MiTEncoder"
    raise ValueError(f"no retrieval tap registered for {name}")


@functools.lru_cache(maxsize=32)
def _jitted_tap_fwd(model):
    """One cached jitted tap-forward per model. linen modules are frozen
    dataclasses (hashable), so the cache key is the module config itself.
    Building the jit inside :func:`extract_features` made EVERY call
    re-trace and re-lower (fresh closure = fresh jit cache entry) —
    measured 10.7 s/batch on the tunneled chip vs milliseconds warm."""
    tap = _tap_filter(model)

    @jax.jit
    def fwd(variables, image):
        # variables are a traced argument — closing them over would bake
        # the weights into the HLO as constants (see models/ensemble.py)
        _, inter = model.apply(
            variables, image, train=False,
            capture_intermediates=tap,
            mutable=["intermediates"])
        return inter["intermediates"]

    return fwd


def extract_features(model, variables, images: jnp.ndarray) -> jnp.ndarray:
    """Tapped feature map (B, h, w, C) for a batch of images."""
    name = type(model).__name__
    inter = _jitted_tap_fwd(model)(variables, images.astype(jnp.float32))
    # walk to the tapped module's __call__ output (stop at the first one —
    # backbone outputs may themselves be dicts)
    node = inter
    while isinstance(node, dict) and "__call__" not in node:
        node = node[next(iter(node))]
    node = node["__call__"][0]
    if name == "UNet":
        feats = node[-1]                      # encoder returns level list; x5
    elif name == "DeepLabV3":
        feats = node["out"] if isinstance(node, dict) else node
    elif name == "SegFormer":
        feats = node[-1] if isinstance(node, (list, tuple)) else node
    else:  # pragma: no cover
        feats = node
    return feats


def extract_embedding(model, variables, images: jnp.ndarray,
                      pool: str = "max") -> jnp.ndarray:
    """(B, C) embedding: spatially pooled tapped planes."""
    feats = extract_features(model, variables, images)
    feats = feats.astype(jnp.float32)
    if pool == "max":
        return jnp.max(feats, axis=(1, 2))
    if pool == "mean":
        return jnp.mean(feats, axis=(1, 2))
    raise ValueError(f"unknown pool {pool!r}")


def rank_by_distance(probe, candidates, metric: str = "l2") -> list:
    """Candidate indices sorted best-first by embedding distance
    (the notebook's L2 / L1 / cosine rankings).

    Pure host-side numpy: embeddings are tiny (B, C) vectors and the
    caller loops per probe — dispatching each ranking to a tunneled
    device costs a round trip per probe for microseconds of math."""
    p = np.asarray(probe, np.float32)
    c = np.asarray(candidates, np.float32)
    if metric == "l2":
        d = np.linalg.norm(c - p[None], axis=-1)
    elif metric == "l1":
        d = np.sum(np.abs(c - p[None]), axis=-1)
    elif metric == "cosine":
        pn = p / max(np.linalg.norm(p), 1e-12)
        cn = c / np.maximum(
            np.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
        d = 1.0 - cn @ pn
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return list(np.argsort(d))
