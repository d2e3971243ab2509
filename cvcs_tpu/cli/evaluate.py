"""``python -m cvcs_tpu.cli.evaluate <config.yaml>`` — the reference's
`evaluation.py` surface: confusion-matrix evaluation of a checkpoint over a
dataset (chunk size 1, no shift), metric report, confusion-heatmap and
class-prior plots (`evaluation.py:1-33`). Supports ``net: Ensemble`` with
an ``ensemble_config`` member file."""

from __future__ import annotations

import sys

import jax.numpy as jnp

from cvcs_tpu.cli import common
from cvcs_tpu.config.loader import EVAL_KEYS, validate_keys
from cvcs_tpu.core import mesh as mesh_lib
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.metrics import confusion as conf_lib
from cvcs_tpu.metrics import scores


def evaluate(config: dict) -> dict:
    validate_keys(config, EVAL_KEYS,
                  {"dataset", "net", "patch_size"}, "evaluation")
    loader = ChunkLoader(
        config["dataset"], chunk_size=1,
        patch_size=config["patch_size"],
        load_context=bool(config.get("load_context")),
        in_channels=int(config.get("in_channels", 3)),
        seed=0)
    if config.get("images"):
        loader.specify(config["images"])

    num_classes = int(config.get("num_classes", 15)) + 1
    batch_size = int(config.get("batch_size", 8))
    ignore = 0 if config.get("ignore_background") else None
    # `mesh: {data: N}` — evaluation scales like train/predict: weights
    # replicate, batches shard over the data axis, and the confusion
    # fold's one-hot contraction over the sharded batch dim psum-reduces
    # over ICI (the reference evaluates at batch 1 on one device,
    # `utils.py:59-103` — its worst hot spot).
    mesh = common.mesh_from_config(config)

    # One shared construction path with predict/esa/serve
    # (common.build_apply dispatches "Ensemble" like the reference's
    # `load_network`, `utils.py:174-195`). The restored weights ride as
    # traced jit ARGUMENTS: closing them over would bake every parameter
    # into the HLO as a constant (bloats the program — the tunnel's
    # remote compiler rejects a 3-member ensemble at 413 — and defeats
    # donation/sharing).
    import jax

    apply_fn, variables, _, returns_logits, _, _ = common.build_apply(
        config, config["patch_size"])
    if mesh is not None:
        variables = mesh_lib.replicate(variables, mesh)

    @jax.jit
    def _predict(variables, image, context):
        out = apply_fn(variables, image.astype(jnp.float32),
                       context=context, train=False)
        if returns_logits:
            out = jnp.argmax(out, axis=-1)
        return out.astype(jnp.int32)

    predict = lambda image, context: _predict(variables, image, context)

    host = conf_lib.HostConfusion(num_classes)
    for c in range(len(loader)):
        chunk = loader.get_chunk(c, shuffle_patches=False)
        conf = conf_lib.confusion_matrix(num_classes)
        for batch in chunk.batches(batch_size, drop_last=False):
            image, context, mask = batch.image, batch.context, batch.mask
            if mesh is not None:
                sharded = mesh_lib.shard_batch(
                    {"image": image, "mask": mask, "context": context}, mesh)
                image, mask = sharded["image"], sharded["mask"]
                context = sharded["context"]
            pred = predict(image, context)
            if batch.valid is not None:
                mask = jnp.where(batch.valid[:, None, None], mask,
                                 num_classes + 1)
            conf = conf_lib.update_confusion(
                conf, pred, mask, num_classes=num_classes,
                ignore_index=ignore)
        host.fold(conf)

    metrics = scores.print_metrics(host.total)
    if config.get("confusion_matrix"):
        from cvcs_tpu.metrics.plots import plot_confusion
        plot_confusion(host.normalized(), config["confusion_matrix"])
    if config.get("priors"):
        from cvcs_tpu.metrics.plots import plot_priors
        plot_priors(host.total, config["priors"])
    return metrics


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        evaluate(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
