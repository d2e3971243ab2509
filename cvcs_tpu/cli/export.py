"""``python -m cvcs_tpu.cli.export <config.yaml>`` — convert a framework
checkpoint to a torch state-dict file in the model family's native torch
naming (reference `nets.py` for UNets, torchvision for DeepLab, HF for
SegFormer).

Closes the interop loop: reference users can take weights trained here
back to ``torch.load``/``load_state_dict`` (the import direction already
accepts reference pickles in evaluate/predict). Config keys::

    net: Unetv2                    # any exportable zoo name
    load_checkpoint: ckpts/checkpoint50
    num_classes: 15
    patch_size: 224
    output: unetv2_export.pt       # .pt via torch.save; .npz fallback
"""

from __future__ import annotations

import sys

import numpy as np

from cvcs_tpu.cli import common
from cvcs_tpu.config.loader import validate_keys
from cvcs_tpu.utils import torch_export

EXPORT_KEYS = {
    "net", "load_checkpoint", "num_classes", "patch_size", "output",
    "in_channels", "device", "precision", "verbose",
}

_EXPORTERS = {
    "Unet": lambda v: torch_export.export_unet(v, upsample="bilinear"),
    "Unetv2": lambda v: torch_export.export_unet(v, upsample="transpose"),
    "Resnet101": lambda v: torch_export.export_deeplab(
        v, backbone="resnet101"),
    "Resnet50": lambda v: torch_export.export_deeplab(
        v, backbone="resnet50"),
    "MobileNet": lambda v: torch_export.export_deeplab(
        v, backbone="mobilenet"),
    "SegformerMod": lambda v: torch_export.export_segformer(v),
    "SwinUnet": lambda v: torch_export.export_swin(v),
    "SwinUnetTiny": lambda v: torch_export.export_swin(
        v, depths=(1, 1, 2, 1)),
}


def export(config: dict) -> str:
    validate_keys(config, EXPORT_KEYS,
                  {"net", "load_checkpoint", "output"}, "export")
    net = config["net"]
    if net not in _EXPORTERS:
        raise ValueError(
            f"no torch exporter for net {net!r}; available: "
            f"{sorted(_EXPORTERS)}")
    model, spec, _ = common.build_net(config)
    variables = common.restore_variables(
        config, model, int(config.get("patch_size", 224)))
    sd = _EXPORTERS[net](variables)
    out = config["output"]
    try:
        import torch

        torch.save({k: torch.tensor(np.ascontiguousarray(a))
                    for k, a in sd.items()}, out)
    except ImportError:   # torch-free host: numpy archive with same keys
        np.savez(out, **sd)
    print(f"Exported {net} ({len(sd)} tensors) -> {out}", flush=True)
    return out


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        export(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
