"""ViT (DINO-style) tests: embedding shapes, pos-embed interpolation, and
numerical parity of the importer against a DINO-named torch twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvcs_tpu.models.vit import ViT, dino_vit

F32 = dict(dtype=jnp.float32)


def test_variants():
    m = dino_vit("vits16", **F32)
    assert m.dim == 384 and m.patch == 16
    with pytest.raises(ValueError):
        dino_vit("vitc32")


def test_cls_embedding_shape_and_interp():
    model = ViT(dim=32, depth=2, heads=4, patch=8, pos_grid=4, **F32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)   # on-grid 4x4 patches
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)
    cls, toks = jax.jit(lambda vv, a: model.apply(vv, a))(v, x)
    assert cls.shape == (2, 32) and toks.shape == (2, 16, 32)
    # off-grid size triggers positional interpolation
    x2 = jnp.zeros((1, 48, 48, 3), jnp.float32)
    cls2, toks2 = model.apply(v, x2)
    assert cls2.shape == (1, 32) and toks2.shape == (1, 36, 32)


class _TorchDinoTwin:
    """Builds a torch module whose state dict uses DINO naming."""

    def __new__(cls, dim, depth, heads, patch, grid):
        import torch
        import torch.nn as nn

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = nn.LayerNorm(dim)
                self.attn = nn.Module()
                self.attn.qkv = nn.Linear(dim, 3 * dim)
                self.attn.proj = nn.Linear(dim, dim)
                self.norm2 = nn.LayerNorm(dim)
                self.mlp = nn.Module()
                self.mlp.fc1 = nn.Linear(dim, 4 * dim)
                self.mlp.fc2 = nn.Linear(4 * dim, dim)

            def forward(self, x):
                b, t, _ = x.shape
                y = self.norm1(x)
                qkv = self.attn.qkv(y).reshape(
                    b, t, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
                a = a.softmax(dim=-1)
                o = (a @ v).transpose(1, 2).reshape(b, t, dim)
                x = x + self.attn.proj(o)
                y = self.norm2(x)
                return x + self.mlp.fc2(
                    torch.nn.functional.gelu(self.mlp.fc1(y)))

        class Twin(nn.Module):
            def __init__(self):
                super().__init__()
                self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
                self.pos_embed = nn.Parameter(
                    torch.randn(1, grid * grid + 1, dim) * 0.02)
                self.patch_embed = nn.Module()
                self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
                self.blocks = nn.ModuleList([Block() for _ in range(depth)])
                self.norm = nn.LayerNorm(dim)

            def forward(self, x):
                b = x.shape[0]
                t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                t = torch.cat(
                    [self.cls_token.expand(b, -1, -1), t], dim=1)
                t = t + self.pos_embed
                for blk in self.blocks:
                    t = blk(t)
                t = self.norm(t)
                return t[:, 0]

        return Twin()


def test_import_vit_parity():
    torch = pytest.importorskip("torch")

    from cvcs_tpu.utils.torch_import import import_vit

    dim, depth, heads, patch, grid = 32, 2, 4, 8, 4
    torch.manual_seed(0)
    twin = _TorchDinoTwin(dim, depth, heads, patch, grid).eval()
    variables = import_vit(twin.state_dict(), depth=depth)

    model = ViT(dim=dim, depth=depth, heads=heads, patch=patch,
                pos_grid=grid, **F32)
    x = np.random.default_rng(0).random((1, 32, 32, 3), np.float32)
    cls, _ = jax.jit(lambda v, a: model.apply(v, a))(
        variables, jnp.asarray(x))
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(cls), ref, atol=1e-5, rtol=1e-4)


def test_bicubic_matrix_matches_torch():
    """_torch_bicubic_matrix must reproduce
    F.interpolate(mode='bicubic', align_corners=False) exactly — DINO's
    interpolate_pos_encoding uses torch bicubic (A=-0.75), which
    jax.image's Keys-kernel 'bicubic' (a=-0.5) does not match."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from cvcs_tpu.models.vit import _torch_bicubic_matrix

    rng = np.random.default_rng(0)
    for n_in, gh, gw in [(4, 7, 5), (14, 28, 28), (14, 9, 13)]:
        x = rng.standard_normal((1, 3, n_in, n_in)).astype(np.float32)
        want = F.interpolate(torch.tensor(x), size=(gh, gw),
                             mode="bicubic", align_corners=False).numpy()
        wh = _torch_bicubic_matrix(n_in, gh)
        ww = _torch_bicubic_matrix(n_in, gw)
        got = np.einsum("oh,bchw->bcow", wh, x)
        got = np.einsum("ow,bchw->bcho", ww, got)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # DINO's interpolate_pos_encoding passes scale_factor=(g + 0.1)/n_in
    # and torch maps coordinates with the CALLER's scale factor — the
    # size-based mapping above diverges from it (up to ~1.0 absolute on
    # N(0,1) inputs); scale=n_in/(g + 0.1) reproduces the hub call
    for n_in, g in [(4, 6), (14, 28), (14, 9), (28, 13)]:
        x = rng.standard_normal((1, 3, n_in, n_in)).astype(np.float32)
        sf = (g + 0.1) / n_in
        want = F.interpolate(torch.tensor(x), scale_factor=(sf, sf),
                             mode="bicubic", align_corners=False).numpy()
        assert want.shape[-2:] == (g, g)
        m = _torch_bicubic_matrix(n_in, g, scale=n_in / (g + 0.1))
        got = np.einsum("oh,bchw->bcow", m, x)
        got = np.einsum("ow,bcrw->bcro", m, got)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_import_vit_parity_offgrid():
    """Twin parity at an OFF-grid input size, exercising the positional
    interpolation path end-to-end (the on-grid parity test never touches
    it); the twin applies torch's own bicubic EXACTLY as DINO's
    interpolate_pos_encoding does — scale_factor=(g + 0.1)/grid, not
    size= (the two coordinate mappings differ)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from cvcs_tpu.utils.torch_import import import_vit

    dim, depth, heads, patch, grid = 32, 2, 4, 8, 4
    torch.manual_seed(0)
    twin = _TorchDinoTwin(dim, depth, heads, patch, grid).eval()
    variables = import_vit(twin.state_dict(), depth=depth)

    model = ViT(dim=dim, depth=depth, heads=heads, patch=patch,
                pos_grid=grid, **F32)
    x = np.random.default_rng(1).random((1, 48, 48, 3), np.float32)  # 6x6
    cls, _ = jax.jit(lambda v, a: model.apply(v, a))(
        variables, jnp.asarray(x))
    with torch.no_grad():
        t = twin.patch_embed.proj(
            torch.tensor(x.transpose(0, 3, 1, 2))).flatten(2).transpose(1, 2)
        pos_cls, pos_patch = twin.pos_embed[:, :1], twin.pos_embed[:, 1:]
        pg = pos_patch.reshape(1, grid, grid, dim).permute(0, 3, 1, 2)
        sf = (6 + 0.1) / grid
        pg = F.interpolate(pg, scale_factor=(sf, sf), mode="bicubic",
                           align_corners=False)
        assert pg.shape[-2:] == (6, 6)
        pos = torch.cat(
            [pos_cls, pg.permute(0, 2, 3, 1).reshape(1, 36, dim)], dim=1)
        t = torch.cat([twin.cls_token.expand(1, -1, -1), t], dim=1) + pos
        for blk in twin.blocks:
            t = blk(t)
        ref = twin.norm(t)[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(cls), ref, atol=1e-5, rtol=1e-4)
