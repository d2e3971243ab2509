"""Vision Transformer (DINO-style) for deep-feature retrieval.

The reference notebook retrieves with DINO ViT embeddings pulled from
torch.hub (``dino_vits8/vits16/vitb8/vitb16``, `retrieval.ipynb` cells
37-83, SURVEY §2.6). This machine has no egress, so the capability ships
as: (a) the ViT architecture here, (b) a DINO/timm-naming weight importer
(:func:`cvcs_tpu.utils.torch_import.import_vit`) for locally provided
checkpoints, and (c) the CLS-token embedding tap used by
:mod:`cvcs_tpu.retrieval`.

Standard pre-LN ViT: conv patch embed, learned CLS token + positional
embeddings (bilinear-interpolated for off-grid input sizes, as DINO does),
fused-QKV attention, GELU MLP, final LayerNorm. bf16 compute / f32 params.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.ops.resize import resize_bilinear


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
            # DINO's positional-embedding interpolation for other sizes
            grid = pos_patch.reshape(
                1, self.pos_grid, self.pos_grid, self.dim)
            grid = resize_bilinear(grid.astype(jnp.float32), (gh, gw))
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
