"""Torch -> JAX weight import + architecture parity tests.

Each test builds the *torch* twin (torchvision / HF constructible offline
with random weights), imports its state dict, and compares eval-mode
outputs numerically — simultaneously validating the importer and that our
flax architectures match the reference's structure operator-for-operator
(SURVEY §7 hard part (b))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cvcs_tpu.models import build_model  # noqa: E402
from cvcs_tpu.utils import torch_import  # noqa: E402
from cvcs_tpu.utils.torch_ref import TorchUrnetv2  # noqa: E402

F32 = dict(dtype=jnp.float32)


def _twin_to_reference_names(twin: TorchUrnetv2) -> dict:
    """Rename our torch twin's keys to the reference's checkpoint naming
    (`nets.py:117-199`): encode{1-5}.{i}.layer.{j}, upscale{k}.0,
    decode_forward{k}.0.layer.{j}, decode_forward4.1."""
    sd = twin.state_dict()
    out = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "encoders":
            level, j = int(parts[1]), int(parts[2])
            off = j if level == 0 else j + 1   # maxpool occupies slot 0
            out[f"encode{level + 1}.{off}.layer.{parts[3]}."
                + ".".join(parts[4:])] = value
        elif parts[0] == "ups":
            out[f"upscale{int(parts[1]) + 1}.0." + ".".join(parts[2:])] = value
        elif parts[0] == "decs":
            out[f"decode_forward{int(parts[1]) + 1}.0.layer."
                + ".".join(parts[2:])] = value
        elif parts[0] == "head":
            out["decode_forward4.1." + ".".join(parts[1:])] = value
        else:  # pragma: no cover
            raise KeyError(key)
    return out


def _apply_eval(model, variables, x_nhwc):
    return np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables,
                                                     jnp.asarray(x_nhwc)))


def test_unetv2_reference_checkpoint_parity():
    torch.manual_seed(0)
    twin = TorchUrnetv2(16).eval()
    sd = _twin_to_reference_names(twin)
    variables = torch_import.import_unet(sd, upsample="transpose")

    model, _ = build_model("Unetv2", 16, **F32)
    x = np.random.default_rng(0).random((1, 32, 32, 3), np.float32)
    ours = _apply_eval(model, variables, x)
    with torch.no_grad():
        theirs = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3)


def test_strip_prefixes_matches_custom_load():
    sd = {"module.conv.weight": 1, "other": 2}
    out = torch_import.strip_prefixes(sd, "Resnet101")
    assert "conv.weight" in out and "other" in out
    sd2 = {"module.backbone.0.weight": 3}
    out2 = torch_import.strip_prefixes(sd2, "MobileNet")
    assert "model.backbone.0.weight" in out2


@pytest.mark.slow
def test_deeplab_resnet50_twin_parity():
    """torchvision is not installed; the twin reproduces its structure and
    naming exactly (cvcs_tpu/utils/torch_deeplab_ref.py)."""
    from cvcs_tpu.utils.torch_deeplab_ref import TorchDeepLabV3

    torch.manual_seed(1)
    ref = TorchDeepLabV3(16, "resnet50").eval()
    variables = torch_import.import_deeplab(ref.state_dict(), "resnet50")
    model, _ = build_model("Resnet50", 16, **F32)
    x = np.random.default_rng(1).random((1, 64, 64, 3), np.float32)
    ours = _apply_eval(model, variables, x)
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_deeplab_resnet50_torchvision_parity():
    tv = pytest.importorskip("torchvision")
    torch.manual_seed(1)
    ref = tv.models.segmentation.deeplabv3_resnet50(
        weights=None, weights_backbone=None, num_classes=16).eval()
    variables = torch_import.import_deeplab(ref.state_dict(), "resnet50")
    model, _ = build_model("Resnet50", 16, **F32)
    x = np.random.default_rng(1).random((1, 64, 64, 3), np.float32)
    ours = _apply_eval(model, variables, x)
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2)))["out"].numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_deeplab_mobilenet_torchvision_parity():
    tv = pytest.importorskip("torchvision")
    torch.manual_seed(2)
    ref = tv.models.segmentation.deeplabv3_mobilenet_v3_large(
        weights=None, weights_backbone=None, num_classes=16).eval()
    variables = torch_import.import_deeplab(ref.state_dict(), "mobilenet")
    model, _ = build_model("MobileNet", 16, **F32)
    x = np.random.default_rng(2).random((1, 64, 64, 3), np.float32)
    ours = _apply_eval(model, variables, x)
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2)))["out"].numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("size", [64, 72])
def test_segformer_hf_parity(size):
    """size=72 gives a stage-1 token grid of 18, NOT divisible by the
    sr_ratio 8 — pins the K/V spatial-reduction conv's VALID padding
    (HF Conv2d padding=0): flax's default SAME padded an extra K/V
    token row/col there and silently diverged from pretrained HF
    weights (round-3 review finding)."""
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(3)
    depths = (1, 1, 1, 1)
    hidden = (8, 16, 32, 64)
    cfg = transformers.SegformerConfig(
        num_encoder_blocks=4, depths=list(depths),
        hidden_sizes=list(hidden), num_attention_heads=[1, 2, 4, 8],
        sr_ratios=[8, 4, 2, 1], decoder_hidden_size=32, num_labels=16)
    ref = transformers.SegformerForSemanticSegmentation(cfg).eval()
    # the reference wraps this + a learned tail; test the HF core here
    variables = torch_import.import_segformer(ref.state_dict(),
                                              depths=depths)

    from cvcs_tpu.models.segformer import MiTConfig, MiTEncoder, SegFormerHead
    import flax.linen as nn

    class Core(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = MiTEncoder(
                MiTConfig(depths, hidden, (1, 2, 4, 8), decoder_dim=32),
                dtype=jnp.float32)(x)
            return SegFormerHead(16, 32, dtype=jnp.float32)(feats, train)

    model = Core()
    x = np.random.default_rng(3).random((1, size, size, 3), np.float32)
    ours = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(
            variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = ref(torch.tensor(x.transpose(0, 3, 1, 2))).logits.numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


def test_googlenet_trunk_twin_parity():
    """import_googlenet vs a torchvision-named GoogLeNet trunk twin
    (ROADMAP item 6 — torchvision absent, zero egress; the twin pins the
    structure and naming so real weights import 1:1 when available)."""
    import jax.numpy as jnp

    from cvcs_tpu.models.googlenet import GoogLeNetBackbone
    from cvcs_tpu.utils.torch_googlenet_ref import TorchGoogleTrunk

    torch.manual_seed(4)
    ref = TorchGoogleTrunk().eval()
    imported = torch_import.import_googlenet(ref.state_dict())

    model = GoogLeNetBackbone(dtype=jnp.float32)
    x = np.random.default_rng(4).random((1, 64, 64, 3), np.float32)
    fresh = model.init({"params": jax.random.key(0)},
                       jnp.asarray(x), train=False)
    # trunk weights imported; adapter 1x1 convs (reference-only modules,
    # `nets.py:208-209`) keep their fresh values
    params = dict(imported["params"])
    params["Conv_0"] = fresh["params"]["Conv_0"]
    params["Conv_1"] = fresh["params"]["Conv_1"]
    out = model.apply({"params": params,
                       "batch_stats": imported["batch_stats"]},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        trunk, aux = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    # compare pre-adapter features by undoing the fresh 1x1 convs is not
    # possible; instead apply the fresh adapters to the torch features
    w_out = np.asarray(fresh["params"]["Conv_0"]["kernel"])[0, 0]
    b_out = np.asarray(fresh["params"]["Conv_0"]["bias"])
    want_out = trunk.numpy().transpose(0, 2, 3, 1) @ w_out + b_out
    w_aux = np.asarray(fresh["params"]["Conv_1"]["kernel"])[0, 0]
    b_aux = np.asarray(fresh["params"]["Conv_1"]["bias"])
    want_aux = aux.numpy().transpose(0, 2, 3, 1) @ w_aux + b_aux
    np.testing.assert_allclose(np.asarray(out["out"]), want_out,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["aux"]), want_aux,
                               atol=5e-4, rtol=1e-3)


def test_googlenet_reference_style_keys():
    """Reference google_backbone checkpoints use Sequential indices
    (backbone.{i}) + out_layer/aux_layer; the importer maps them too."""
    import jax.numpy as jnp

    from cvcs_tpu.models.googlenet import GoogLeNetBackbone
    from cvcs_tpu.utils.torch_googlenet_ref import TorchGoogleTrunk
    from cvcs_tpu.utils.torch_import import _GOOGLE_SEQ

    torch.manual_seed(5)
    ref = TorchGoogleTrunk()
    sd = {}
    for k, v in ref.state_dict().items():
        mod, rest = k.split(".", 1)
        sd[f"backbone.{_GOOGLE_SEQ[mod]}.{rest}"] = v
    sd["out_layer.weight"] = torch.randn(960, 832, 1, 1)
    sd["out_layer.bias"] = torch.randn(960)
    sd["aux_layer.weight"] = torch.randn(40, 192, 1, 1)
    sd["aux_layer.bias"] = torch.randn(40)
    variables = torch_import.import_googlenet(sd)
    model = GoogLeNetBackbone(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out["out"].shape == (1, 4, 4, 960)
    assert out["aux"].shape == (1, 8, 8, 40)
