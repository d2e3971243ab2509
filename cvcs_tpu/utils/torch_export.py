"""Export trained UNet-family variables back to the reference's torch
state-dict naming (`source/scripts/nets.py:117-199` Urnetv2 /
`nets.py:34-115` Urnet).

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


def export_unet(variables: dict, upsample: str = "transpose") -> dict:
    """UNet/UNetv2 variables -> reference torch state dict (numpy leaves).

    ``upsample='transpose'`` exports the "Unetv2" layout (ConvTranspose
    decoder), ``'bilinear'`` the "Unet" layout.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: dict[str, np.ndarray] = {}

    def conv(path: tuple, name: str) -> None:
        leaf = _get(params, path)
        # flax (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
        sd[f"{name}.weight"] = _f32(leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            sd[f"{name}.bias"] = _f32(leaf["bias"])

    def convt(path: tuple, name: str) -> None:
        leaf = _get(params, path)
        # flax (kh, kw, cin, cout) -> torch ConvTranspose2d
        # (cin, cout, kh, kw) with spatially flipped taps (inverse of
        # torch_import.convt_w)
        k = _f32(leaf["kernel"]).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        sd[f"{name}.weight"] = np.ascontiguousarray(k)
        if "bias" in leaf:
            sd[f"{name}.bias"] = _f32(leaf["bias"])

    def bn(path: tuple, name: str) -> None:
        leaf = _get(params, path)
        st = _get(stats, path)
        sd[f"{name}.weight"] = _f32(leaf["scale"])
        sd[f"{name}.bias"] = _f32(leaf["bias"])
        sd[f"{name}.running_mean"] = _f32(st["mean"])
        sd[f"{name}.running_var"] = _f32(st["var"])
        # torch BN state dicts carry this counter; 0 is what a freshly
        # constructed module expects shape-wise
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

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
