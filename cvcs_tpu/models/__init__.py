"""Segmentation model zoo (flax.linen, NHWC, bf16-on-MXU).

Parity surface with the reference zoo (`nets.py`, `utils.py:174-195`):
UNet ("Unet"), UNetV2 ("Unetv2"), DeepLabV3 with ResNet-101/50 and
MobileNetV3-Large backbones ("Resnet101"/"Resnet50"/"MobileNet"), SegFormer-B3
("SegformerMod"), and the majority-vote Ensemble. Build through
:func:`cvcs_tpu.models.registry.build_model`.
"""

from cvcs_tpu.models.registry import ModelSpec, build_model, MODEL_REGISTRY  # noqa: F401
