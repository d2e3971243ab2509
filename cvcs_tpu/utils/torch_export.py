"""Export trained variables back to torch state-dict naming — the FULL
zoo: UNet/UNetv2 (reference naming, `source/scripts/nets.py:117-199` /
`nets.py:34-115`), DeepLabV3 ResNet-50/101/MobileNetV3 + GoogLeNet trunk
(torchvision), SegFormer incl. the reference tail (HF), ViT (DINO/timm),
and SwinUNet (framework twin naming, `utils/torch_swin_ref.py`).

The inverse of :func:`cvcs_tpu.utils.torch_import.import_unet`: a user who
trains in this framework can hand the weights back to the reference's
`torch.load`/`load_state_dict` pipeline (or any torch tooling). Values are
returned as float32 numpy arrays keyed by the reference's parameter names;
wrap with ``torch.tensor`` + ``torch.save`` to produce a loadable file
(torch is not imported here so the export works on torch-free hosts).

Round-trip parity (export -> import == identity, and the torch twin's
forward matches ours to ~1e-4) is pinned by ``tests/test_torch_export.py``.
"""

from __future__ import annotations

import numpy as np


def _get(root: dict, path: tuple):
    node = root
    for key in path:
        node = node[key]
    return node


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


class _SdWriter:
    """Shared inverse-of-`_TreeBuilder` helpers: flax paths -> torch keys.

    Presence checks (conv bias, ResNet downsample) read the FLAX tree —
    the import side's ``in sd`` membership tests mirrored from the other
    direction.
    """

    def __init__(self, variables: dict):
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})  # LN-only models
        self.sd: dict[str, np.ndarray] = {}

    def has(self, path: tuple) -> bool:
        node = self.params
        for key in path:
            if not isinstance(node, dict) or key not in node:
                return False
            node = node[key]
        return True

    def conv(self, path: tuple, name: str) -> None:
        leaf = _get(self.params, path)
        # flax (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
        self.sd[f"{name}.weight"] = _f32(
            leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            self.sd[f"{name}.bias"] = _f32(leaf["bias"])

    def bn(self, path: tuple, name: str) -> None:
        leaf = _get(self.params, path)
        st = _get(self.stats, path)
        self.sd[f"{name}.weight"] = _f32(leaf["scale"])
        self.sd[f"{name}.bias"] = _f32(leaf["bias"])
        self.sd[f"{name}.running_mean"] = _f32(st["mean"])
        self.sd[f"{name}.running_var"] = _f32(st["var"])
        self.sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    def wbn(self, path: tuple, name: str) -> None:
        """BN inside our `_BN` wrapper module (nested BatchNorm_0 scope)."""
        self.bn(path + ("BatchNorm_0",), name)

    def dense(self, path: tuple, name: str) -> None:
        leaf = _get(self.params, path)
        self.sd[f"{name}.weight"] = _f32(leaf["kernel"]).T
        if "bias" in leaf:
            self.sd[f"{name}.bias"] = _f32(leaf["bias"])

    def ln(self, path: tuple, name: str) -> None:
        leaf = _get(self.params, path)
        self.sd[f"{name}.weight"] = _f32(leaf["scale"])
        self.sd[f"{name}.bias"] = _f32(leaf["bias"])

    def convt(self, path: tuple, name: str) -> None:
        leaf = _get(self.params, path)
        k = _f32(leaf["kernel"]).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        self.sd[f"{name}.weight"] = np.ascontiguousarray(k)
        if "bias" in leaf:
            self.sd[f"{name}.bias"] = _f32(leaf["bias"])


def export_unet(variables: dict, upsample: str = "transpose") -> dict:
    """UNet/UNetv2 variables -> reference torch state dict (numpy leaves).

    ``upsample='transpose'`` exports the "Unetv2" layout (ConvTranspose
    decoder), ``'bilinear'`` the "Unet" layout.
    """
    w = _SdWriter(variables)
    sd, conv, convt, bn = w.sd, w.conv, w.convt, w.bn

    enc = ("_Encoder_0",)
    for level in range(5):
        base = f"encode{level + 1}"
        offs = (0, 1) if level == 0 else (1, 2)
        for j, off in enumerate(offs):
            cba = enc + (f"ConvBNAct_{2 * level + j}",)
            conv(cba + ("Conv_0",), f"{base}.{off}.layer.0")
            bn(cba + ("BatchNorm_0",), f"{base}.{off}.layer.1")
    for j in range(4):
        base = f"upscale{j + 1}.0"
        if upsample == "transpose":
            convt((f"ConvTranspose_{j}",), base)
        else:
            conv((f"UpscaleBlock_{j}", "Conv_0"), f"{base}.layer.1")
        dec = f"decode_forward{j + 1}.0.layer"
        blk = (f"DecodeBlock_{j}",)
        conv(blk + ("Conv_0",), f"{dec}.0")
        bn(blk + ("BatchNorm_0",), f"{dec}.2")
        conv(blk + ("Conv_1",), f"{dec}.3")
        bn(blk + ("BatchNorm_1",), f"{dec}.5")
    conv(("Conv_0",), "decode_forward4.1")
    return sd


_RESNET_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _export_mobilenet(w: _SdWriter, prefix: str, root: tuple) -> None:
    """Inverse of `torch_import._import_mobilenet` (torchvision
    MobileNetV3-Large naming). The depthwise kernel uses the same
    transpose inverse as a regular conv: flax (kh, kw, 1, C) ->
    torch (C, 1, kh, kw)."""
    from cvcs_tpu.models.mobilenet import LARGE_DILATED

    w.conv(root + ("Conv_0",), f"{prefix}0.0")
    w.wbn(root + ("_BN_0",), f"{prefix}0.1")
    for i, cfg in enumerate(LARGE_DILATED):
        base = f"{prefix}{i + 1}.block"
        path = root + (f"InvertedResidual_{i}",)
        k = 0   # torch block index
        c = 0   # our Conv_*/_BN_* index
        if i != 0:   # first block has no expand conv
            w.conv(path + (f"Conv_{c}",), f"{base}.{k}.0")
            w.wbn(path + (f"_BN_{c}",), f"{base}.{k}.1")
            k += 1
            c += 1
        w.conv(path + (f"Conv_{c}",), f"{base}.{k}.0")   # depthwise
        w.wbn(path + (f"_BN_{c}",), f"{base}.{k}.1")
        k += 1
        c += 1
        if cfg.use_se:
            se = path + ("SqueezeExcite_0",)
            w.conv(se + ("Conv_0",), f"{base}.{k}.fc1")
            w.conv(se + ("Conv_1",), f"{base}.{k}.fc2")
            k += 1
        w.conv(path + (f"Conv_{c}",), f"{base}.{k}.0")
        w.wbn(path + (f"_BN_{c}",), f"{base}.{k}.1")
    w.conv(root + ("Conv_1",), f"{prefix}16.0")
    w.wbn(root + ("_BN_1",), f"{prefix}16.1")


def export_googlenet(variables: dict) -> dict:
    """GoogLeNetBackbone trunk variables -> torchvision ``googlenet``
    naming (``conv1.conv``, ``inception3a.branch1.conv``, ...). Inverse of
    :func:`torch_import.import_googlenet`'s torchvision branch. The
    reference-only 1x1 adapter convs (``out_layer``/``aux_layer``,
    `nets.py:208-209`) are framework-side modules with no torchvision
    counterpart and are not emitted.
    """
    w = _SdWriter(variables)

    def basic(path: tuple, name: str) -> None:
        w.conv(path + ("Conv_0",), f"{name}.conv")
        w.bn(path + ("BatchNorm_0",), f"{name}.bn")

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
    return w.sd


def export_segformer(variables: dict, depths=(3, 4, 18, 3)) -> dict:
    """SegFormer variables -> HF ``SegformerForSemanticSegmentation``
    state-dict naming, plus the reference's ``seq`` upsampling tail
    (`nets.py:333-337`) when present. Inverse of
    :func:`torch_import.import_segformer`.
    """
    w = _SdWriter(variables)
    enc = ("MiTEncoder_0",)
    sr_ratios = (8, 4, 2, 1)
    blk_idx = 0
    for s in range(4):
        pe = f"segformer.encoder.patch_embeddings.{s}"
        w.conv(enc + (f"Conv_{s}",), f"{pe}.proj")
        w.ln(enc + (f"LayerNorm_{2 * s}",), f"{pe}.layer_norm")
        for d in range(depths[s]):
            base = f"segformer.encoder.block.{s}.{d}"
            blk = enc + (f"MiTBlock_{blk_idx}",)
            w.ln(blk + ("LayerNorm_0",), f"{base}.layer_norm_1")
            att = blk + ("EfficientAttention_0",)
            w.dense(att + ("Dense_0",), f"{base}.attention.self.query")
            if sr_ratios[s] > 1:
                w.conv(att + ("Conv_0",), f"{base}.attention.self.sr")
                w.ln(att + ("LayerNorm_0",),
                     f"{base}.attention.self.layer_norm")
            w.dense(att + ("Dense_1",), f"{base}.attention.self.key")
            w.dense(att + ("Dense_2",), f"{base}.attention.self.value")
            w.dense(att + ("Dense_3",), f"{base}.attention.output.dense")
            w.ln(blk + ("LayerNorm_1",), f"{base}.layer_norm_2")
            ffn = blk + ("MixFFN_0",)
            w.dense(ffn + ("Dense_0",), f"{base}.mlp.dense1")
            w.conv(ffn + ("Conv_0",), f"{base}.mlp.dwconv.dwconv")
            w.dense(ffn + ("Dense_1",), f"{base}.mlp.dense2")
            blk_idx += 1
        w.ln(enc + (f"LayerNorm_{2 * s + 1}",),
             f"segformer.encoder.layer_norm.{s}")
    head = ("SegFormerHead_0",)
    for s in range(4):
        w.dense(head + (f"Dense_{s}",), f"decode_head.linear_c.{s}.proj")
    w.conv(head + ("Conv_0",), "decode_head.linear_fuse")
    w.bn(head + ("BatchNorm_0",), "decode_head.batch_norm")
    w.conv(head + ("Conv_1",), "decode_head.classifier")
    if w.has(("ConvTranspose_0",)):   # reference tail
        w.convt(("ConvTranspose_0",), "seq.0")
        w.convt(("ConvTranspose_1",), "seq.2")
        w.conv(("Conv_0",), "seq.4")
    return w.sd


def export_vit(variables: dict, depth: int = 12) -> dict:
    """ViT variables -> DINO/timm naming. Inverse of
    :func:`torch_import.import_vit` (retrieval trunks, notebook cells
    37-62)."""
    w = _SdWriter(variables)
    w.sd["cls_token"] = _f32(w.params["cls_token"])
    w.sd["pos_embed"] = _f32(w.params["pos_embed"])
    w.conv(("Conv_0",), "patch_embed.proj")
    for i in range(depth):
        base = f"blocks.{i}"
        blk = (f"ViTBlock_{i}",)
        w.ln(blk + ("LayerNorm_0",), f"{base}.norm1")
        w.dense(blk + ("Dense_0",), f"{base}.attn.qkv")
        w.dense(blk + ("Dense_1",), f"{base}.attn.proj")
        w.ln(blk + ("LayerNorm_1",), f"{base}.norm2")
        w.dense(blk + ("Dense_2",), f"{base}.mlp.fc1")
        w.dense(blk + ("Dense_3",), f"{base}.mlp.fc2")
    w.ln(("LayerNorm_0",), "norm")
    return w.sd


def export_swin(variables: dict, depths=(2, 2, 6, 2)) -> dict:
    """SwinUNet variables -> :class:`cvcs_tpu.utils.torch_swin_ref.
    TorchSwinUNet` state-dict naming. Inverse of
    :func:`torch_import.import_swin` (framework-defined naming — the
    reference never implemented its advertised TSwin/BSwin, SURVEY
    quirk 10)."""
    w = _SdWriter(variables)
    w.conv(("Conv_0",), "patch_embed.proj")
    w.ln(("LayerNorm_0",), "patch_embed.norm")
    blk_idx = 0
    for s in range(4):
        if s > 0:
            w.conv((f"Conv_{s}",), f"layers.{s}.downsample.proj")
            w.ln((f"LayerNorm_{s}",), f"layers.{s}.downsample.norm")
        for d in range(depths[s]):
            base = f"layers.{s}.blocks.{d}"
            blk = (f"SwinBlock_{blk_idx}",)
            w.ln(blk + ("LayerNorm_0",), f"{base}.norm1")
            att = blk + ("WindowAttention_0",)
            w.dense(att + ("Dense_0",), f"{base}.attn.qkv")
            w.dense(att + ("Dense_1",), f"{base}.attn.proj")
            w.ln(blk + ("LayerNorm_1",), f"{base}.norm2")
            w.dense(blk + ("Dense_0",), f"{base}.mlp.fc1")
            w.dense(blk + ("Dense_1",), f"{base}.mlp.fc2")
            blk_idx += 1
    for i in range(3):
        w.convt((f"ConvTranspose_{i}",), f"decoder.{i}.up")
        dec = (f"DecodeBlock_{i}",)
        w.conv(dec + ("Conv_0",), f"decoder.{i}.conv1")
        w.bn(dec + ("BatchNorm_0",), f"decoder.{i}.bn1")
        w.conv(dec + ("Conv_1",), f"decoder.{i}.conv2")
        w.bn(dec + ("BatchNorm_1",), f"decoder.{i}.bn2")
    w.convt(("ConvTranspose_3",), "head.up1")
    w.convt(("ConvTranspose_4",), "head.up2")
    w.conv(("Conv_4",), "head.out")
    return w.sd


def export_deeplab(variables: dict, backbone: str = "resnet101") -> dict:
    """DeepLabV3 (ResNet-50/101 or MobileNetV3-Large backbone) variables
    -> torchvision ``deeplabv3_*`` state-dict naming (the reference's
    `nets.py:234-311` wrappers load exactly this, modulo their
    ``module.``-prefix rewrites). Inverse of
    :func:`torch_import.import_deeplab`.
    """
    w = _SdWriter(variables)
    if backbone in _RESNET_STAGES:
        root = ("ResNet_0",)
        w.conv(root + ("Conv_0",), "backbone.conv1")
        w.wbn(root + ("_BN_0",), "backbone.bn1")
        idx = 0
        for stage, n_blocks in enumerate(_RESNET_STAGES[backbone]):
            for blk in range(n_blocks):
                base = f"backbone.layer{stage + 1}.{blk}"
                path = root + (f"Bottleneck_{idx}",)
                for c in range(3):
                    w.conv(path + (f"Conv_{c}",), f"{base}.conv{c + 1}")
                    w.wbn(path + (f"_BN_{c}",), f"{base}.bn{c + 1}")
                if w.has(path + ("Conv_3",)):   # projection shortcut
                    w.conv(path + ("Conv_3",), f"{base}.downsample.0")
                    w.wbn(path + ("_BN_3",), f"{base}.downsample.1")
                idx += 1
    elif backbone == "mobilenet":
        _export_mobilenet(w, "backbone.", ("MobileNetV3Backbone_0",))
    else:
        raise ValueError(f"no torch export for backbone {backbone!r}")

    head = ("DeepLabHead_0",)
    aspp = head + ("ASPP_0",)
    for i in range(4):
        w.conv(aspp + (f"Conv_{i}",), f"classifier.0.convs.{i}.0")
        w.wbn(aspp + (f"_BN_{i}",), f"classifier.0.convs.{i}.1")
    w.conv(aspp + ("Conv_4",), "classifier.0.convs.4.1")
    w.wbn(aspp + ("_BN_4",), "classifier.0.convs.4.2")
    w.conv(aspp + ("Conv_5",), "classifier.0.project.0")
    w.wbn(aspp + ("_BN_5",), "classifier.0.project.1")
    w.conv(head + ("Conv_0",), "classifier.1")
    w.wbn(head + ("_BN_0",), "classifier.2")
    w.conv(head + ("Conv_1",), "classifier.4")
    return w.sd
