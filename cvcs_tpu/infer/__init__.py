"""Whole-scene sliding-window inference: border-corrected window forwards,
on-device argmax + palette decode + stitching, spatial sharding with halo
exchange across a mesh."""

from cvcs_tpu.infer.engine import SceneSegmenter, InferenceConfig  # noqa: F401
