"""Vision Transformer (DINO-style) for deep-feature retrieval.

The reference notebook retrieves with DINO ViT embeddings pulled from
torch.hub (``dino_vits8/vits16/vitb8/vitb16``, `retrieval.ipynb` cells
37-83, SURVEY §2.6). This machine has no egress, so the capability ships
as: (a) the ViT architecture here, (b) a DINO/timm-naming weight importer
(:func:`cvcs_tpu.utils.torch_import.import_vit`) for locally provided
checkpoints, and (c) the CLS-token embedding tap used by
:mod:`cvcs_tpu.retrieval`.

Standard pre-LN ViT: conv patch embed, learned CLS token + positional
embeddings (torch-exact bicubic interpolation for off-grid input sizes,
matching DINO's ``interpolate_pos_encoding``), fused-QKV attention, GELU
MLP, final LayerNorm. bf16 compute / f32 params. Reachable from the
retrieve CLI as ``net: vits8|vits16|vitb8|vitb16``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _torch_bicubic_matrix(n_in: int, n_out: int,
                          scale: float | None = None) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch's
    ``F.interpolate(mode="bicubic", align_corners=False)`` exactly
    (cubic convolution with A=-0.75, half-pixel centers, edge clamp).
    jax.image's "bicubic" is the Keys a=-0.5 kernel and diverges from it.

    ``scale`` is the *coordinate* scale ``src = (i + 0.5) * scale - 0.5``
    (default ``n_in / n_out`` — torch's ``size=`` call). DINO's
    ``interpolate_pos_encoding`` instead passes
    ``scale_factor=(n_out + 0.1) / n_in``, and torch uses the caller's
    scale_factor in the coordinate mapping, so matching DINO hub outputs
    needs ``scale = n_in / (n_out + 0.1)``."""
    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return ((a + 2) * x - (a + 3)) * x * x + 1
        if x < 2:
            return (((x - 5) * x + 8) * x - 4) * a
        return 0.0

    m = np.zeros((n_out, n_in), np.float64)
    if scale is None:
        scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        t = src - x0
        for tap, dist in enumerate((t + 1, t, 1 - t, 2 - t)):
            j = min(max(x0 - 1 + tap, 0), n_in - 1)
            m[i, j] += k(dist)
    return m.astype(np.float32)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, t, c = x.shape
        hd = self.dim // self.heads

        # torch LayerNorm eps (DINO checkpoints) is 1e-5
        y = nn.LayerNorm(epsilon=1e-5, **kw)(x)
        qkv = nn.Dense(3 * self.dim, **kw)(y)       # DINO fused qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        x = x + nn.Dense(self.dim, **kw)(out)

        y = nn.LayerNorm(epsilon=1e-5, **kw)(x)
        y = nn.Dense(self.dim * self.mlp_ratio, **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, **kw)(y)
        return x + y


class ViT(nn.Module):
    """DINO-compatible ViT trunk; returns (CLS embedding, patch tokens)."""

    dim: int = 384        # ViT-S
    depth: int = 12
    heads: int = 6
    patch: int = 16
    pos_grid: int = 14    # DINO trains at 224 -> 14x14 patch grid
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    requires_context = False
    returns_logits = False

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        del context, train
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, self.dtype)
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=self.patch,
                    **kw)(x)
        _, gh, gw, _ = x.shape
        tokens = x.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim), self.param_dtype)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pos_grid * self.pos_grid + 1, self.dim),
                         self.param_dtype)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            # DINO's positional-embedding interpolation for other sizes:
            # torch-exact bicubic as two static matmuls (grids are tiny),
            # with DINO's scale_factor=(g + 0.1)/pos_grid coordinate
            # mapping (NOT size-based n_in/n_out — they differ slightly)
            grid = pos_patch.reshape(
                1, self.pos_grid, self.pos_grid, self.dim
            ).astype(jnp.float32)
            wh = jnp.asarray(_torch_bicubic_matrix(
                self.pos_grid, gh, scale=self.pos_grid / (gh + 0.1)))
            ww = jnp.asarray(_torch_bicubic_matrix(
                self.pos_grid, gw, scale=self.pos_grid / (gw + 0.1)))
            grid = jnp.einsum("oh,bhwd->bowd", wh, grid)
            grid = jnp.einsum("ow,bhwd->bhod", ww, grid)
            pos_patch = grid.reshape(1, gh * gw, self.dim)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)).astype(self.dtype),
             tokens], axis=1)
        tokens = tokens + jnp.concatenate(
            [pos_cls, pos_patch], axis=1).astype(self.dtype)

        for _ in range(self.depth):
            tokens = ViTBlock(self.dim, self.heads, **kw)(tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, **kw)(tokens)
        return tokens[:, 0].astype(jnp.float32), tokens[:, 1:]


VIT_VARIANTS = {
    "vits16": dict(dim=384, depth=12, heads=6, patch=16, pos_grid=14),
    "vits8": dict(dim=384, depth=12, heads=6, patch=8, pos_grid=28),
    "vitb16": dict(dim=768, depth=12, heads=12, patch=16, pos_grid=14),
    "vitb8": dict(dim=768, depth=12, heads=12, patch=8, pos_grid=28),
}


def dino_vit(variant: str, **kw) -> ViT:
    """The notebook's four DINO trunks by hub name suffix."""
    if variant not in VIT_VARIANTS:
        raise ValueError(
            f"unknown ViT variant {variant!r}; options: {sorted(VIT_VARIANTS)}")
    return ViT(**VIT_VARIANTS[variant], **kw)
