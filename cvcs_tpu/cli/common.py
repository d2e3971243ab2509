"""Shared CLI plumbing: device/mesh selection, model construction from a
config dict, checkpoint restore for eval/predict, ensemble assembly."""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax
import jax.numpy as jnp

from cvcs_tpu.core.mesh import MeshConfig, create_mesh
from cvcs_tpu.core.precision import policy_from_config
from cvcs_tpu.models import build_model
from cvcs_tpu.models.ensemble import Ensemble, EnsembleMember
from cvcs_tpu.train import checkpoint as ckpt_lib


def device_context(config: dict):
    """The reference picks cuda:0 vs cpu from config['device']
    (`utils.py:273-280`). Here 'cpu' forces the host backend (its debug
    path); anything else uses the default (TPU) backend."""
    if config.get("device") == "cpu":
        return jax.default_device(jax.devices("cpu")[0])
    return contextlib.nullcontext()


def mesh_from_config(config: dict):
    m = config.get("mesh") or {}
    if not m:
        return None
    return create_mesh(MeshConfig(data=m.get("data"),
                                  spatial=m.get("spatial", 1)))


def model_dtypes(config: dict) -> dict:
    policy = policy_from_config(config.get("precision"))
    return dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)


def build_net(config: dict):
    """Model + spec from config names; like the reference, builds with
    num_classes + 1 for background (`utils.py:176`).

    ``remat: true`` (train configs only) builds the model with
    block-level rematerialization — measured on v5e: -13% peak HBM for
    -11% step time on UNetv2 (BASELINE.md round 3). Models that don't
    expose a ``remat`` field reject it here; ``grad_accum`` is the
    architecture-independent (and measured-cheaper) memory lever."""
    name = config["net"]
    num_classes = int(config.get("num_classes", 15)) + 1
    kw = model_dtypes(config)
    if config.get("remat"):
        try:
            model, spec = build_model(name, num_classes, remat=True, **kw)
        except TypeError as e:
            if "remat" not in str(e):
                raise  # a genuine construction error, not lack of support
            raise ValueError(
                f"remat: true is not supported for net {name!r} "
                "(block-level rematerialization is implemented for the "
                "UNet family); use grad_accum — measured the stronger "
                "memory lever anyway (BASELINE.md round 3)") from None
        return model, spec, num_classes
    model, spec = build_model(name, num_classes, **kw)
    return model, spec, num_classes


def init_variables(model, patch_size: int, in_channels: int = 3, seed: int = 0):
    example = jnp.zeros((1, patch_size, patch_size, in_channels), jnp.uint8)

    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.fold_in(key, 1)},
                          example, train=False)

    return jax.jit(init_fn)(jax.random.key(seed))


def restore_variables(config: dict, model, patch_size: int):
    """Initialize then (optionally) overwrite from config['load_checkpoint'].

    A directory is one of our Orbax checkpoints; a *file* is a reference
    ``torch.save`` pickle and goes through the torch importer (incl. the
    wrappers' DataParallel prefix rewrites) — published reference
    checkpoints work directly in the evaluate/predict CLIs.

    ``in_channels`` follows the config so 4-band multispectral checkpoints
    (train-side ``in_channels: 4``) restore without first-conv shape
    mismatches.
    """
    variables = init_variables(model, patch_size,
                               in_channels=int(config.get("in_channels", 3)))
    ckpt = config.get("load_checkpoint")
    if ckpt:
        if Path(ckpt).is_file():
            from cvcs_tpu.utils.torch_import import load_reference_checkpoint

            variables = load_reference_checkpoint(ckpt, config["net"])
        else:
            variables = ckpt_lib.load_model_variables(
                ckpt, {"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})})
        print(f"Loaded checkpoint {ckpt}", flush=True)
    return variables


def build_ensemble(config: dict, patch_size: int) -> Ensemble:
    """Assemble the majority-vote ensemble from an ensemble config file:
    a YAML mapping net-name -> checkpoint (reference `utils.py:488-496`,
    `configs/ensemble/test.yaml`)."""
    import yaml

    path = config.get("ensemble_config")
    if not path:
        raise ValueError(
            "To use the ensemble specify 'ensemble_config' in your "
            "evaluation configuration file.")
    with open(path) as f:
        members_cfg = yaml.safe_load(f)
    num_classes = int(config.get("num_classes", 15)) + 1
    members = []
    for net_name, ckpt in members_cfg.items():
        m_config = dict(config, net=net_name, load_checkpoint=ckpt)
        model, spec, _ = build_net(m_config)
        variables = restore_variables(m_config, model, patch_size)

        # variables ride as a traced argument (Ensemble.vote), NOT a jit
        # closure — closed-over params bake into the HLO as constants
        def apply(_v, image, context=None, _m=model):
            return _m.apply(_v, image.astype(jnp.float32), context=context,
                            train=False)

        members.append(EnsembleMember(net_name, apply,
                                      returns_logits=spec.returns_logits,
                                      variables=variables))
    return Ensemble(members, num_classes)


def build_apply(config: dict, patch_size: int):
    """``(apply_fn, variables, num_classes, returns_logits,
    requires_context, stride_product)`` for a config's net — dispatching
    ``net: Ensemble`` the way the reference's `load_network` does
    (`utils.py:174-195`) — so every inference-side CLI (predict/esa/serve)
    shares one construction path and all of them accept ensembles.
    ``stride_product`` is the model's fullconv divisibility constraint
    (ModelSpec field; max over ensemble members — all powers of two, so
    max == lcm)."""
    from cvcs_tpu.models.registry import MODEL_REGISTRY

    if config.get("net") == "Ensemble":
        ens = build_ensemble(config, patch_size)
        stride = max((MODEL_REGISTRY[m.name].stride_product
                      for m in ens.members), default=1)
        return (ens.apply, ens.member_variables, ens.num_classes,
                ens.returns_logits, ens.requires_context, stride)
    model, spec, num_classes = build_net(config)
    variables = restore_variables(config, model, patch_size)
    return (model.apply, variables, num_classes,
            spec.returns_logits, spec.requires_context,
            spec.stride_product)


def resolve_config_arg(argv) -> dict:
    from cvcs_tpu.config import display_configs, load_yaml

    if len(argv) < 2:
        raise SystemExit(f"usage: {Path(argv[0]).name} <config.yaml>")
    config = load_yaml(argv[1])
    display_configs(config)
    return config


def fetch_labels(labels) -> list:
    """Batch-sync a list of per-raster device label maps to host uint8 in
    ONE ``jax.device_get`` (the per-raster transfers overlap via
    copy_to_host_async) — per-raster syncs pay a device round-trip each,
    the largest of the three attributed tunnel costs in the retrieve CLI
    measurement (BASELINE.md). Host arrays pass through untouched."""
    import jax
    import jax.numpy as jnp

    return jax.device_get([
        lab.astype(jnp.uint8) if isinstance(lab, jax.Array) else lab
        for lab in labels])


def segment_rasters(seg, rasters, mesh=None) -> list:
    """Per-raster label maps for a list of arbitrary rasters, batching
    where profitable (shared by the esa and serve CLIs): same-shape
    batches run as ONE jitted program — with a mesh, full groups of
    n_data rasters run scene-parallel (`predict_scenes_sharded`, scenes
    over `data` x rows over `spatial`), the remainder per-raster with
    spatial row-striping."""
    from cvcs_tpu.core.mesh import DATA_AXIS

    def one(r):
        return (seg.predict_scene_sharded(r, mesh) if mesh is not None
                else seg.predict_scene(r))

    if len(rasters) > 1 and len({r.shape for r in rasters}) == 1:
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            full = len(rasters) - len(rasters) % n_data
            per_scene = (list(seg.predict_scenes_sharded(
                rasters[:full], mesh)) if full else [])
            return per_scene + [one(r) for r in rasters[full:]]
        return list(seg.predict_scenes(rasters))
    return [one(r) for r in rasters]
