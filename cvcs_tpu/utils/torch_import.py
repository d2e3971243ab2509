"""One-way torch -> JAX weight importers.

Covers the reference's pretrained/wrapper checkpoint surface (SURVEY §5
"torch->JAX weight importer"):

* ``import_unet`` — reference hand-written UNet checkpoints
  (`nets.py:34-199` naming: ``encode{1-5}``, ``upscale{1-4}``,
  ``decode_forward{1-4}``);
* ``import_deeplab`` — torchvision ``deeplabv3_resnet50/101`` /
  ``deeplabv3_mobilenet_v3_large`` state dicts (what the reference wraps,
  `nets.py:234-311`);
* ``import_segformer`` — HF ``SegformerForSemanticSegmentation`` state
  dicts + the reference's learned upsampling tail (`nets.py:313-356`);
* ``load_reference_checkpoint`` — a reference ``torch.save`` pickle:
  strips the DataParallel prefixes exactly as each wrapper's
  ``custom_load`` does (``module.`` -> '' for ResNet101/SegFormer,
  ``module`` -> ``model`` for MobileNet; `nets.py:252-257,306-311,
  351-356`) and dispatches on the net name.

Layout conversions (verified numerically against torch):

* conv weight   (O, I, kh, kw) -> (kh, kw, I, O)
* depthwise conv (C, 1, kh, kw) -> (kh, kw, 1, C)
* conv-transpose (I, O, kh, kw) -> spatial flip + (kh, kw, I, O)
  (flax ``ConvTranspose`` correlates the dilated input, no kernel flip)
* dense weight  (O, I) -> (I, O)
* BatchNorm weight/bias/running_mean/running_var ->
  scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    # copy=True: np.asarray over a torch tensor is a shared-memory view —
    # subsequent in-place torch updates (opt.step()) would silently mutate
    # the "imported" weights.
    return np.array(t, dtype=np.float32, copy=True)


def conv_w(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def depthwise_w(w) -> np.ndarray:
    # torch (C, 1, kh, kw) -> flax grouped conv kernel (kh, kw, 1, C)
    return _np(w).transpose(2, 3, 1, 0)


def convt_w(w) -> np.ndarray:
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def dense_w(w) -> np.ndarray:
    return _np(w).T


class _TreeBuilder:
    """Accumulates params/batch_stats leaves by path."""

    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, root: dict, path: tuple, leaf) -> None:
        node = root
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf

    def conv(self, path: tuple, sd: Mapping, name: str,
             transform=conv_w) -> None:
        self._set(self.params, path + ("kernel",), transform(sd[f"{name}.weight"]))
        if f"{name}.bias" in sd:
            self._set(self.params, path + ("bias",), _np(sd[f"{name}.bias"]))

    def dense(self, path: tuple, sd: Mapping, name: str) -> None:
        self._set(self.params, path + ("kernel",), dense_w(sd[f"{name}.weight"]))
        if f"{name}.bias" in sd:
            self._set(self.params, path + ("bias",), _np(sd[f"{name}.bias"]))

    def wbn(self, path: tuple, sd: Mapping, name: str) -> None:
        """BN inside our `_BN` wrapper module (nested BatchNorm_0 scope)."""
        self.bn(path + ("BatchNorm_0",), sd, name)

    def bn(self, path: tuple, sd: Mapping, name: str) -> None:
        self._set(self.params, path + ("scale",), _np(sd[f"{name}.weight"]))
        self._set(self.params, path + ("bias",), _np(sd[f"{name}.bias"]))
        self._set(self.stats, path + ("mean",), _np(sd[f"{name}.running_mean"]))
        self._set(self.stats, path + ("var",), _np(sd[f"{name}.running_var"]))

    def ln(self, path: tuple, sd: Mapping, name: str) -> None:
        self._set(self.params, path + ("scale",), _np(sd[f"{name}.weight"]))
        self._set(self.params, path + ("bias",), _np(sd[f"{name}.bias"]))

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.stats}


# --------------------------------------------------------------------------
# UNet family (reference naming)
# --------------------------------------------------------------------------

def import_unet(sd: Mapping, upsample: str = "transpose") -> dict:
    """Reference Urnet/Urnetv2 state dict -> UNet variables."""
    b = _TreeBuilder()
    enc = ("_Encoder_0",)
    for level in range(5):
        # encode1 has convs at seq idx 0,1; encode2..5 at 1,2 (maxpool at 0)
        base = f"encode{level + 1}"
        offs = (0, 1) if level == 0 else (1, 2)
        for j, off in enumerate(offs):
            cba = enc + (f"ConvBNAct_{2 * level + j}",)
            b.conv(cba + ("Conv_0",), sd, f"{base}.{off}.layer.0")
            b.bn(cba + ("BatchNorm_0",), sd, f"{base}.{off}.layer.1")
    for j in range(4):
        base = f"upscale{j + 1}.0"
        if upsample == "transpose":
            b.conv((f"ConvTranspose_{j}",), sd, base, transform=convt_w)
        else:
            b.conv((f"UpscaleBlock_{j}", "Conv_0"), sd, f"{base}.layer.1")
        dec = f"decode_forward{j + 1}.0.layer"
        blk = (f"DecodeBlock_{j}",)
        b.conv(blk + ("Conv_0",), sd, f"{dec}.0")
        b.bn(blk + ("BatchNorm_0",), sd, f"{dec}.2")
        b.conv(blk + ("Conv_1",), sd, f"{dec}.3")
        b.bn(blk + ("BatchNorm_1",), sd, f"{dec}.5")
    b.conv(("Conv_0",), sd, "decode_forward4.1")
    return b.variables()


# --------------------------------------------------------------------------
# DeepLabV3 (torchvision naming)
# --------------------------------------------------------------------------

_RESNET_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                  "resnet18": (2, 2, 2, 2)}


def _import_resnet(b: _TreeBuilder, sd: Mapping, prefix: str,
                   arch: str, root: tuple) -> None:
    b.conv(root + ("Conv_0",), sd, f"{prefix}conv1")
    b.wbn(root + ("_BN_0",), sd, f"{prefix}bn1")
    block = "Bottleneck" if arch != "resnet18" else "BasicBlock"
    n_convs = 3 if block == "Bottleneck" else 2
    idx = 0
    for stage, n_blocks in enumerate(_RESNET_STAGES[arch]):
        for blk in range(n_blocks):
            base = f"{prefix}layer{stage + 1}.{blk}"
            path = root + (f"{block}_{idx}",)
            for c in range(n_convs):
                b.conv(path + (f"Conv_{c}",), sd, f"{base}.conv{c + 1}")
                b.wbn(path + (f"_BN_{c}",), sd, f"{base}.bn{c + 1}")
            if f"{base}.downsample.0.weight" in sd:
                b.conv(path + (f"Conv_{n_convs}",), sd,
                       f"{base}.downsample.0")
                b.wbn(path + (f"_BN_{n_convs}",), sd, f"{base}.downsample.1")
            idx += 1


def _import_deeplab_head(b: _TreeBuilder, sd: Mapping, prefix: str,
                         root: tuple) -> None:
    aspp = root + ("ASPP_0",)
    # convs.0 (1x1), convs.1-3 (atrous), convs.4 (pool), project
    for i in range(4):
        b.conv(aspp + (f"Conv_{i}",), sd, f"{prefix}0.convs.{i}.0")
        b.wbn(aspp + (f"_BN_{i}",), sd, f"{prefix}0.convs.{i}.1")
    b.conv(aspp + ("Conv_4",), sd, f"{prefix}0.convs.4.1")
    b.wbn(aspp + ("_BN_4",), sd, f"{prefix}0.convs.4.2")
    b.conv(aspp + ("Conv_5",), sd, f"{prefix}0.project.0")
    b.wbn(aspp + ("_BN_5",), sd, f"{prefix}0.project.1")
    b.conv(root + ("Conv_0",), sd, f"{prefix}1")
    b.wbn(root + ("_BN_0",), sd, f"{prefix}2")
    b.conv(root + ("Conv_1",), sd, f"{prefix}4")


def _import_mobilenet(b: _TreeBuilder, sd: Mapping, prefix: str,
                      root: tuple) -> None:
    from cvcs_tpu.models.mobilenet import LARGE_DILATED

    b.conv(root + ("Conv_0",), sd, f"{prefix}0.0")
    b.wbn(root + ("_BN_0",), sd, f"{prefix}0.1")
    for i, cfg in enumerate(LARGE_DILATED):
        base = f"{prefix}{i + 1}.block"
        path = root + (f"InvertedResidual_{i}",)
        k = 0   # torch block index
        c = 0   # our Conv_*/_BN_* index
        inp_equals_exp = (i == 0)  # first block has no expand conv
        if not inp_equals_exp:
            b.conv(path + (f"Conv_{c}",), sd, f"{base}.{k}.0")
            b.wbn(path + (f"_BN_{c}",), sd, f"{base}.{k}.1")
            k += 1
            c += 1
        b.conv(path + (f"Conv_{c}",), sd, f"{base}.{k}.0",
               transform=depthwise_w)
        b.wbn(path + (f"_BN_{c}",), sd, f"{base}.{k}.1")
        k += 1
        c += 1
        if cfg.use_se:
            se = path + ("SqueezeExcite_0",)
            b.conv(se + ("Conv_0",), sd, f"{base}.{k}.fc1")
            b.conv(se + ("Conv_1",), sd, f"{base}.{k}.fc2")
            k += 1
        b.conv(path + (f"Conv_{c}",), sd, f"{base}.{k}.0")
        b.wbn(path + (f"_BN_{c}",), sd, f"{base}.{k}.1")
    b.conv(root + ("Conv_1",), sd, f"{prefix}16.0")
    b.wbn(root + ("_BN_1",), sd, f"{prefix}16.1")


def import_deeplab(sd: Mapping, backbone: str) -> dict:
    """torchvision deeplabv3_* state dict -> DeepLabV3 variables."""
    b = _TreeBuilder()
    if backbone in ("resnet50", "resnet101"):
        _import_resnet(b, sd, "backbone.", backbone, ("ResNet_0",))
    elif backbone == "mobilenet":
        _import_mobilenet(b, sd, "backbone.", ("MobileNetV3Backbone_0",))
    else:
        raise ValueError(f"no torchvision importer for backbone {backbone!r}")
    _import_deeplab_head(b, sd, "classifier.", ("DeepLabHead_0",))
    return b.variables()


# --------------------------------------------------------------------------
# GoogLeNet trunk (torchvision naming / reference google_backbone)
# --------------------------------------------------------------------------

# reference `google_backbone` Sequential indices of the kept torchvision
# children (`nets.py:207`, children()[:-6] with aux modules stripped):
# 0 conv1, 1 maxpool1, 2 conv2, 3 conv3, 4 maxpool2, 5 inception3a,
# 6 inception3b, 7 maxpool3, 8-12 inception4a-4e.
_GOOGLE_SEQ = {"conv1": "0", "conv2": "2", "conv3": "3",
               "inception3a": "5", "inception3b": "6",
               "inception4a": "8", "inception4b": "9", "inception4c": "10",
               "inception4d": "11", "inception4e": "12"}


def import_googlenet(sd: Mapping) -> dict:
    """GoogLeNet trunk weights -> :class:`GoogLeNetBackbone` variables.

    Accepts either torchvision ``googlenet`` naming (``conv1.conv``,
    ``inception3a.branch1.conv``, ...) or a reference ``google_backbone``
    sub-dict (``backbone.{i}...`` + ``out_layer`` / ``aux_layer``,
    `nets.py:203-215`). The adapter 1x1 convs exist only in reference
    checkpoints; with raw torchvision weights they stay uninitialized and
    the caller keeps its fresh values for them.
    """
    ref_style = any(k.startswith("backbone.") for k in sd)

    def tn(tv_name: str) -> str:
        if not ref_style:
            return tv_name
        mod, rest = tv_name.split(".", 1)
        return f"backbone.{_GOOGLE_SEQ[mod]}.{rest}"

    b = _TreeBuilder()

    def basic(path: tuple, name: str) -> None:
        b.conv(path + ("Conv_0",), sd, tn(f"{name}.conv"))
        b.bn(path + ("BatchNorm_0",), sd, tn(f"{name}.bn"))

    basic(("BasicConv2d_0",), "conv1")
    basic(("BasicConv2d_1",), "conv2")
    basic(("BasicConv2d_2",), "conv3")
    blocks = ["inception3a", "inception3b", "inception4a", "inception4b",
              "inception4c", "inception4d", "inception4e"]
    for i, blk in enumerate(blocks):
        path = (f"Inception_{i}",)
        basic(path + ("BasicConv2d_0",), f"{blk}.branch1")
        basic(path + ("BasicConv2d_1",), f"{blk}.branch2.0")
        basic(path + ("BasicConv2d_2",), f"{blk}.branch2.1")
        basic(path + ("BasicConv2d_3",), f"{blk}.branch3.0")
        basic(path + ("BasicConv2d_4",), f"{blk}.branch3.1")
        basic(path + ("BasicConv2d_5",), f"{blk}.branch4.1")
    if ref_style and "out_layer.weight" in sd:
        b.conv(("Conv_0",), sd, "out_layer")
        b.conv(("Conv_1",), sd, "aux_layer")
    return b.variables()


# --------------------------------------------------------------------------
# SegFormer (HF naming) + reference tail
# --------------------------------------------------------------------------

def import_segformer(sd: Mapping, depths=(3, 4, 18, 3)) -> dict:
    """HF SegformerForSemanticSegmentation state dict (+ the reference's
    ``seq`` upsampling tail if present) -> SegFormer variables."""
    b = _TreeBuilder()
    enc = ("MiTEncoder_0",)
    sr_ratios = (8, 4, 2, 1)
    blk_idx = 0
    for s in range(4):
        pe = f"segformer.encoder.patch_embeddings.{s}"
        b.conv(enc + (f"Conv_{s}",), sd, f"{pe}.proj")
        # LayerNorms at encoder level: per stage, embed LN + final LN
        b.ln(enc + (f"LayerNorm_{2 * s}",), sd, f"{pe}.layer_norm")
        for d in range(depths[s]):
            base = f"segformer.encoder.block.{s}.{d}"
            blk = enc + (f"MiTBlock_{blk_idx}",)
            b.ln(blk + ("LayerNorm_0",), sd, f"{base}.layer_norm_1")
            att = blk + ("EfficientAttention_0",)
            b.dense(att + ("Dense_0",), sd, f"{base}.attention.self.query")
            if sr_ratios[s] > 1:
                b.conv(att + ("Conv_0",), sd, f"{base}.attention.self.sr")
                b.ln(att + ("LayerNorm_0",), sd,
                     f"{base}.attention.self.layer_norm")
            b.dense(att + ("Dense_1",), sd, f"{base}.attention.self.key")
            b.dense(att + ("Dense_2",), sd, f"{base}.attention.self.value")
            b.dense(att + ("Dense_3",), sd, f"{base}.attention.output.dense")
            b.ln(blk + ("LayerNorm_1",), sd, f"{base}.layer_norm_2")
            ffn = blk + ("MixFFN_0",)
            b.dense(ffn + ("Dense_0",), sd, f"{base}.mlp.dense1")
            b.conv(ffn + ("Conv_0",), sd, f"{base}.mlp.dwconv.dwconv",
                   transform=depthwise_w)
            b.dense(ffn + ("Dense_1",), sd, f"{base}.mlp.dense2")
            blk_idx += 1
        b.ln(enc + (f"LayerNorm_{2 * s + 1}",), sd,
             f"segformer.encoder.layer_norm.{s}")
    head = ("SegFormerHead_0",)
    for s in range(4):
        b.dense(head + (f"Dense_{s}",), sd,
                f"decode_head.linear_c.{s}.proj")
    b.conv(head + ("Conv_0",), sd, "decode_head.linear_fuse")
    b.bn(head + ("BatchNorm_0",), sd, "decode_head.batch_norm")
    b.conv(head + ("Conv_1",), sd, "decode_head.classifier")
    if "seq.0.weight" in sd:  # reference tail (`nets.py:333-337`)
        b.conv(("ConvTranspose_0",), sd, "seq.0", transform=convt_w)
        b.conv(("ConvTranspose_1",), sd, "seq.2", transform=convt_w)
        b.conv(("Conv_0",), sd, "seq.4")
    return b.variables()


# --------------------------------------------------------------------------
# ViT (DINO / timm naming)
# --------------------------------------------------------------------------

def import_vit(sd: Mapping, depth: int = 12) -> dict:
    """DINO/timm ViT state dict (cls_token, pos_embed, patch_embed.proj,
    blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm) ->
    :class:`cvcs_tpu.models.vit.ViT` variables."""
    b = _TreeBuilder()
    b._set(b.params, ("cls_token",), _np(sd["cls_token"]))
    b._set(b.params, ("pos_embed",), _np(sd["pos_embed"]))
    b.conv(("Conv_0",), sd, "patch_embed.proj")
    for i in range(depth):
        base = f"blocks.{i}"
        blk = (f"ViTBlock_{i}",)
        b.ln(blk + ("LayerNorm_0",), sd, f"{base}.norm1")
        b.dense(blk + ("Dense_0",), sd, f"{base}.attn.qkv")
        b.dense(blk + ("Dense_1",), sd, f"{base}.attn.proj")
        b.ln(blk + ("LayerNorm_1",), sd, f"{base}.norm2")
        b.dense(blk + ("Dense_2",), sd, f"{base}.mlp.fc1")
        b.dense(blk + ("Dense_3",), sd, f"{base}.mlp.fc2")
    b.ln(("LayerNorm_0",), sd, "norm")
    return b.variables()


# --------------------------------------------------------------------------
# SwinUNet (torch_swin_ref twin naming; encoder vocabulary follows
# microsoft/Swin-Transformer where the architectures coincide)
# --------------------------------------------------------------------------

def import_swin(sd: Mapping, depths=(2, 2, 6, 2)) -> dict:
    """:class:`cvcs_tpu.utils.torch_swin_ref.TorchSwinUNet` state dict ->
    :class:`cvcs_tpu.models.swin.SwinUNet` variables. SwinUnet is
    framework-added (reference docs advertise but never implement
    TSwin/BSwin, SURVEY quirk 10), so the twin defines the torch naming;
    official Swin checkpoints are NOT loadable (they carry
    relative-position biases and concat+linear merges this architecture
    does not have)."""
    b = _TreeBuilder()
    b.conv(("Conv_0",), sd, "patch_embed.proj")
    b.ln(("LayerNorm_0",), sd, "patch_embed.norm")
    blk_idx = 0
    for s in range(4):
        if s > 0:
            b.conv((f"Conv_{s}",), sd, f"layers.{s}.downsample.proj")
            b.ln((f"LayerNorm_{s}",), sd, f"layers.{s}.downsample.norm")
        for d in range(depths[s]):
            base = f"layers.{s}.blocks.{d}"
            blk = (f"SwinBlock_{blk_idx}",)
            b.ln(blk + ("LayerNorm_0",), sd, f"{base}.norm1")
            att = blk + ("WindowAttention_0",)
            b.dense(att + ("Dense_0",), sd, f"{base}.attn.qkv")
            b.dense(att + ("Dense_1",), sd, f"{base}.attn.proj")
            b.ln(blk + ("LayerNorm_1",), sd, f"{base}.norm2")
            b.dense(blk + ("Dense_0",), sd, f"{base}.mlp.fc1")
            b.dense(blk + ("Dense_1",), sd, f"{base}.mlp.fc2")
            blk_idx += 1
    for i in range(3):
        b.conv((f"ConvTranspose_{i}",), sd, f"decoder.{i}.up",
               transform=convt_w)
        dec = (f"DecodeBlock_{i}",)
        b.conv(dec + ("Conv_0",), sd, f"decoder.{i}.conv1")
        b.bn(dec + ("BatchNorm_0",), sd, f"decoder.{i}.bn1")
        b.conv(dec + ("Conv_1",), sd, f"decoder.{i}.conv2")
        b.bn(dec + ("BatchNorm_1",), sd, f"decoder.{i}.bn2")
    b.conv(("ConvTranspose_3",), sd, "head.up1", transform=convt_w)
    b.conv(("ConvTranspose_4",), sd, "head.up2", transform=convt_w)
    b.conv(("Conv_4",), sd, "head.out")
    return b.variables()


# --------------------------------------------------------------------------
# Reference checkpoint dispatch
# --------------------------------------------------------------------------

def strip_prefixes(sd: Mapping, net_name: str) -> dict:
    """The wrappers' custom_load prefix rewrites (`nets.py:252-257,
    306-311,351-356`)."""
    if net_name == "MobileNet":
        return {k.replace("module", "model", 1) if k.startswith("module")
                else k: v for k, v in sd.items()}
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def load_reference_checkpoint(path: str, net_name: str) -> dict:
    """Reference ``torch.save`` pickle -> our variables for ``net_name``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    sd = strip_prefixes(sd, net_name)
    if net_name in ("Unet", "Unetv2"):
        return import_unet(
            sd, "transpose" if net_name == "Unetv2" else "bilinear")
    if net_name in ("Resnet101", "Resnet50", "MobileNet"):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
        backbone = {"Resnet101": "resnet101", "Resnet50": "resnet50",
                    "MobileNet": "mobilenet"}[net_name]
        return import_deeplab(sd, backbone)
    if net_name == "SegformerMod":
        return import_segformer(sd)
    raise ValueError(f"no importer for net {net_name!r}")
