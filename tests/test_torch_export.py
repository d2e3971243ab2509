"""Export-side interop: our UNetv2 variables -> reference torch naming.

Two pins: (a) export -> import is the identity on every leaf; (b) the
reference-shaped torch twin loads the export with strict=True and its
forward matches our flax forward to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.models import build_model
from cvcs_tpu.utils.torch_export import (
    export_deeplab, export_googlenet, export_segformer, export_unet,
    export_vit,
)
from cvcs_tpu.utils.torch_import import (
    import_deeplab, import_googlenet, import_segformer, import_unet,
    import_vit,
)


def _assert_tree_equal(variables, back):
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))


def _init_variables(patch=32):
    model, _ = build_model("Unetv2", 16, dtype=jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(7)},
        jnp.zeros((1, patch, patch, 3), jnp.float32), train=False)
    return model, v


def test_export_import_roundtrip():
    model, v = _init_variables()
    sd = export_unet(v)
    back = import_unet(sd, upsample="transpose")
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))


@pytest.mark.slow
def test_deeplab_export_import_roundtrip():
    model, _ = build_model("Resnet101", 16, dtype=jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    sd = export_deeplab(v, backbone="resnet101")
    back = import_deeplab(sd, "resnet101")
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))


def test_mobilenet_export_import_roundtrip():
    # no torchvision on this box, so the MobileNet direction is pinned by
    # exact roundtrip against the importer (itself torchvision-parity
    # tested where torchvision exists)
    model, _ = build_model("MobileNet", 16, dtype=jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(4)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    sd = export_deeplab(v, backbone="mobilenet")
    back = import_deeplab(sd, "mobilenet")
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))


def test_vit_export_import_roundtrip():
    from cvcs_tpu.models.vit import ViT

    model = ViT(dim=32, depth=2, heads=4, patch=8, pos_grid=4,
                dtype=jnp.float32)
    v = model.init({"params": jax.random.key(8)},
                   jnp.zeros((1, 32, 32, 3), jnp.float32))
    sd = export_vit(v, depth=2)
    _assert_tree_equal(v, import_vit(sd, depth=2))


def test_segformer_export_loads_into_hf_model():
    """Tiny-config HF core: export strict-loads a fresh
    SegformerForSemanticSegmentation and forwards match; exact roundtrip
    via import_segformer."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import flax.linen as nn

    from cvcs_tpu.models.segformer import (
        MiTConfig, MiTEncoder, SegFormerHead,
    )

    depths, hidden = (1, 1, 1, 1), (8, 16, 32, 64)

    class Core(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = MiTEncoder(
                MiTConfig(depths, hidden, (1, 2, 4, 8), decoder_dim=32),
                dtype=jnp.float32)(x)
            return SegFormerHead(16, 32, dtype=jnp.float32)(feats, train)

    model = Core()
    x = np.random.default_rng(6).random((1, 64, 64, 3), np.float32)
    v = model.init({"params": jax.random.key(6)}, jnp.asarray(x),
                   train=False)
    sd = export_segformer(v, depths=depths)

    back = import_segformer(sd, depths=depths)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))

    cfg = transformers.SegformerConfig(
        num_encoder_blocks=4, depths=list(depths),
        hidden_sizes=list(hidden), num_attention_heads=[1, 2, 4, 8],
        sr_ratios=[8, 4, 2, 1], decoder_hidden_size=32, num_labels=16)
    ref = transformers.SegformerForSemanticSegmentation(cfg)
    ref.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(a)) for k, a in sd.items()},
        strict=True)
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


def test_googlenet_export_loads_into_torch_twin():
    """Trunk export strict-loads the torchvision-named twin and the
    forward matches ours (flax adapters applied to the torch features,
    same construction as the import-side parity test)."""
    torch = pytest.importorskip("torch")
    from cvcs_tpu.models.googlenet import GoogLeNetBackbone
    from cvcs_tpu.utils.torch_googlenet_ref import TorchGoogleTrunk

    model = GoogLeNetBackbone(dtype=jnp.float32)
    x = np.random.default_rng(5).random((1, 64, 64, 3), np.float32)
    v = model.init({"params": jax.random.key(5)}, jnp.asarray(x),
                   train=False)
    sd = export_googlenet(v)
    # roundtrip on the trunk leaves (importer skips the flax-only adapters)
    back = import_googlenet(sd)
    for path, leaf in jax.tree_util.tree_leaves_with_path(back):
        node = {"params": v["params"], "batch_stats": v["batch_stats"]}
        for k in path:
            node = node[k.key if hasattr(k, "key") else k]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node))

    net = TorchGoogleTrunk()
    net.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(a)) for k, a in sd.items()},
        strict=True)
    net.eval()
    with torch.no_grad():
        trunk, aux = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    out = model.apply(v, jnp.asarray(x), train=False)
    w_out = np.asarray(v["params"]["Conv_0"]["kernel"])[0, 0]
    b_out = np.asarray(v["params"]["Conv_0"]["bias"])
    want_out = trunk.numpy().transpose(0, 2, 3, 1) @ w_out + b_out
    np.testing.assert_allclose(np.asarray(out["out"]), want_out,
                               atol=5e-4, rtol=1e-3)
    w_aux = np.asarray(v["params"]["Conv_1"]["kernel"])[0, 0]
    b_aux = np.asarray(v["params"]["Conv_1"]["bias"])
    want_aux = aux.numpy().transpose(0, 2, 3, 1) @ w_aux + b_aux
    np.testing.assert_allclose(np.asarray(out["aux"]), want_aux,
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_deeplab_export_loads_into_torch_twin():
    torch = pytest.importorskip("torch")
    from cvcs_tpu.utils.torch_deeplab_ref import TorchDeepLabV3

    model, _ = build_model("Resnet101", 16, dtype=jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(2)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    sd = export_deeplab(v, backbone="resnet101")
    net = TorchDeepLabV3(16, "resnet101")
    net.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(x)) for k, x in sd.items()},
        strict=True)
    net.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out_j = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(
        out_j, out_t.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3)


def test_export_cli_roundtrip(tmp_path):
    """cvcs-export CLI: Orbax checkpoint -> torch .pt file whose tensors
    import back to the same variables."""
    torch = pytest.importorskip("torch")
    from cvcs_tpu.cli import export as export_cli
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train import checkpoint as ckpt_lib

    model, _ = build_model("Unetv2", 16, dtype=jnp.float32)
    state = create_train_state(
        model, build_optimizer("SGD2"),
        jnp.zeros((1, 32, 32, 3), jnp.uint8))
    ckpt = ckpt_lib.save_checkpoint(
        tmp_path, 0, state, [], [], 2, "SGD2")
    out = tmp_path / "export.pt"
    export_cli.export(dict(
        net="Unetv2", load_checkpoint=str(ckpt), num_classes=15,
        patch_size=32, output=str(out), precision="f32"))
    sd = {k: np.asarray(v) for k, v in torch.load(
        out, weights_only=True).items()}
    back = import_unet(sd, upsample="transpose")
    _assert_tree_equal(
        {"params": state.params, "batch_stats": state.batch_stats}, back)


def _reference_to_twin_names(sd: dict) -> dict:
    """Inverse of test_torch_import._twin_to_reference_names: reference
    checkpoint keys -> our torch twin's attribute naming."""
    out = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0].startswith("encode"):
            level = int(parts[0][len("encode"):]) - 1
            off = int(parts[1])
            j = off if level == 0 else off - 1   # twin has no maxpool slot
            assert parts[2] == "layer"
            out[f"encoders.{level}.{j}." + ".".join(parts[3:])] = value
        elif parts[0].startswith("upscale"):
            k = int(parts[0][len("upscale"):]) - 1
            assert parts[1] == "0"
            out[f"ups.{k}." + ".".join(parts[2:])] = value
        elif parts[0].startswith("decode_forward"):
            k = int(parts[0][len("decode_forward"):]) - 1
            if parts[1] == "1":   # decode_forward4.1 = final 1x1 head
                out["head." + ".".join(parts[2:])] = value
            else:
                assert parts[1] == "0" and parts[2] == "layer"
                out[f"decs.{k}." + ".".join(parts[3:])] = value
        else:  # pragma: no cover
            raise KeyError(key)
    return out


def test_export_loads_into_torch_twin():
    torch = pytest.importorskip("torch")
    from cvcs_tpu.utils.torch_ref import TorchUrnetv2

    model, v = _init_variables()
    sd = _reference_to_twin_names(export_unet(v))
    net = TorchUrnetv2(16)
    net.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(x)) for k, x in sd.items()},
        strict=True)
    net.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out_j = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(
        out_j, out_t.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4)


def test_export_cli_swin(tmp_path):
    """SwinUnetTiny through the export CLI (depths dispatch) -> .pt that
    strict-loads the torch twin and imports back to the same variables."""
    torch = pytest.importorskip("torch")
    from cvcs_tpu.cli import export as export_cli
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train import checkpoint as ckpt_lib
    from cvcs_tpu.utils.torch_import import import_swin
    from cvcs_tpu.utils.torch_swin_ref import TorchSwinUNet

    model, _ = build_model("SwinUnetTiny", 16, dtype=jnp.float32)
    state = create_train_state(
        model, build_optimizer("SGD2"),
        jnp.zeros((1, 32, 32, 3), jnp.uint8))
    ckpt = ckpt_lib.save_checkpoint(tmp_path, 0, state, [], [], 2, "SGD2")
    out = tmp_path / "swin.pt"
    export_cli.export(dict(
        net="SwinUnetTiny", load_checkpoint=str(ckpt), num_classes=15,
        patch_size=32, output=str(out), precision="f32"))
    loaded = torch.load(out, weights_only=True)
    twin = TorchSwinUNet(num_classes=16, dims=(32, 64, 128, 256),
                         depths=(1, 1, 2, 1), heads=(1, 2, 4, 8))
    missing, unexpected = twin.load_state_dict(loaded, strict=True)
    assert not missing and not unexpected
    back = import_swin({k: np.asarray(v) for k, v in loaded.items()},
                       depths=(1, 1, 2, 1))
    _assert_tree_equal(
        {"params": state.params, "batch_stats": state.batch_stats}, back)
