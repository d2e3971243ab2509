"""Model registry: the reference's name -> network dispatch, typed.

Parity surface: ``utils.load_network`` (`utils.py:174-195`) with the same
config-facing names — Unet, Unetv2, Resnet101, MobileNet, SegformerMod,
Ensemble — plus Resnet50 (present-but-unregistered in the reference,
`nets.py:259-275`/SURVEY quirk 3, registered here on purpose) and the
experimental MobileNet backbone swaps (googlenet / resnet18 flags,
`nets.py:295-298`) as first-class names.

The reference's informal model protocol (`nets.py:12-33`:
``requires_context`` / ``returns_logits`` / ``wrapper``) is a typed
:class:`ModelSpec` here; the training/eval/inference engines consume specs,
never concrete classes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from flax import linen as nn

from cvcs_tpu.models.deeplab import DeepLabV3
from cvcs_tpu.models.segformer import MIT_B0, MIT_B1, MIT_B3, SegFormer
from cvcs_tpu.models.swin import SwinUNet
from cvcs_tpu.models.unet import unet, unet_v2


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Typed version of the reference's model protocol (`nets.py:12-33`)."""

    name: str
    build: Callable[..., nn.Module]
    requires_context: bool = False
    returns_logits: bool = True
    # True when reference checkpoints of this net were saved through a
    # wrapper with prefix-rewritten keys (`nets.py:252-257,306-311,351-356`);
    # the torch checkpoint importer uses it to strip "module."/"model."
    # prefixes.
    wrapper: bool = False
    # full-convolution divisibility: input H/W must be multiples of this
    # for the forward to return an exactly input-aligned label map (the
    # UNet family's skip-concats crash otherwise; Swin/SegFormer decoders
    # would overshoot). DeepLab heads resize logits to the input size, so
    # any shape works (1). The inference engine checks band shapes against
    # this up-front (`infer/engine.py predict_scene_fullconv`).
    stride_product: int = 1


MODEL_REGISTRY: dict[str, ModelSpec] = {
    "Unet": ModelSpec(
        "Unet", lambda num_classes, **kw: unet(num_classes, **kw),
        stride_product=16),
    "Unetv2": ModelSpec(
        "Unetv2", lambda num_classes, **kw: unet_v2(num_classes, **kw),
        stride_product=16),
    # TPU perf variant (opt-in, non-parity weights): space-to-depth stem,
    # every level at half resolution — see models/unet.py docstring.
    "Unetv2S2D": ModelSpec(
        "Unetv2S2D",
        lambda num_classes, **kw: unet_v2(num_classes, stem="s2d", **kw),
        stride_product=32),
    "Resnet101": ModelSpec(
        "Resnet101",
        lambda num_classes, **kw: DeepLabV3(
            num_classes=num_classes, backbone="resnet101", **kw),
        wrapper=True),
    "Resnet50": ModelSpec(
        "Resnet50",
        lambda num_classes, **kw: DeepLabV3(
            num_classes=num_classes, backbone="resnet50", **kw),
        wrapper=True),
    "MobileNet": ModelSpec(
        "MobileNet",
        lambda num_classes, **kw: DeepLabV3(
            num_classes=num_classes, backbone="mobilenet", **kw),
        wrapper=True),
    "MobileNetGoogle": ModelSpec(
        "MobileNetGoogle",
        lambda num_classes, **kw: DeepLabV3(
            num_classes=num_classes, backbone="googlenet", **kw),
        wrapper=True),
    "MobileNetResnet18": ModelSpec(
        "MobileNetResnet18",
        lambda num_classes, **kw: DeepLabV3(
            num_classes=num_classes, backbone="resnet18", **kw),
        wrapper=True),
    "SegformerMod": ModelSpec(
        "SegformerMod",
        lambda num_classes, **kw: SegFormer(
            num_classes=num_classes, config=MIT_B3, **kw),
        wrapper=True, stride_product=4),
    "SegformerB0": ModelSpec(
        "SegformerB0",
        lambda num_classes, **kw: SegFormer(
            num_classes=num_classes, config=MIT_B0, **kw),
        wrapper=True, stride_product=4),
    "SegformerB1": ModelSpec(
        "SegformerB1",
        lambda num_classes, **kw: SegFormer(
            num_classes=num_classes, config=MIT_B1, **kw),
        wrapper=True, stride_product=4),
    # The Swin-UNet hybrid the reference's docs advertise ("TSwin"/"BSwin")
    # but never implemented (SURVEY quirk 10) — multispectral-ready.
    "SwinUnet": ModelSpec(
        "SwinUnet",
        lambda num_classes, **kw: SwinUNet(num_classes=num_classes, **kw),
        stride_product=32),
    "SwinUnetTiny": ModelSpec(
        "SwinUnetTiny",
        lambda num_classes, **kw: SwinUNet(
            num_classes=num_classes, dims=(32, 64, 128, 256),
            depths=(1, 1, 2, 1), heads=(1, 2, 4, 8), **kw),
        stride_product=32),
}


def build_model(name: str, num_classes: int, **kw: Any) -> tuple[nn.Module, ModelSpec]:
    """Build a zoo model by its config name.

    Like the reference (`utils.py:176`), callers pass the number of
    *foreground* classes + 1 for background, i.e. GID15 uses 16.
    "Ensemble" is not built here — it needs member checkpoints; see
    :mod:`cvcs_tpu.models.ensemble` and the evaluation CLI.
    """
    if name == "Ensemble":
        raise ValueError(
            "Ensemble is assembled from member checkpoints; use "
            "cvcs_tpu.models.ensemble.Ensemble via the evaluation CLI")
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown net {name!r}; available: {sorted(MODEL_REGISTRY)}")
    spec = MODEL_REGISTRY[name]
    return spec.build(num_classes, **kw), spec
