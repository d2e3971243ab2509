"""``python -m cvcs_tpu.cli.retrieve <config.yaml>`` — the reference's
retrieval notebook (`retrieval.ipynb`, SURVEY §2.6) as a reproducible CLI.

Given a GID15-style dataset, ranks every scene's patches against a probe
patch by (a) mask-similarity scores (mIoU / wIoU / pixel precision / EMD)
and (b) deep-feature embedding distance from a trained model, then runs
the notebook's EMD-agreement benchmark over a sample of probes.

Config keys: ``dataset``, ``patch_size``, ``net`` + ``load_checkpoint``
(embedding model; optional — mask-score rankings alone without), ``pool``
(max|mean), ``metric`` (l2|l1|cosine), ``num_probes``, ``topk``
(rankings kept per probe, default 10), ``images`` (restrict scenes),
``num_classes``, ``seed``.

``net`` accepts the zoo names (backbone-tap embeddings) or the
notebook's DINO trunks ``vits8 / vits16 / vitb8 / vitb16`` (CLS-token
embeddings; ``load_checkpoint`` may be a DINO ``.pth`` state dict, run
through :func:`cvcs_tpu.utils.torch_import.import_vit`).
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.cli import common
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.retrieval import (
    compute_scores, extract_embedding, rank_by_distance, scores_evaluation,
)
from cvcs_tpu.retrieval.scores import rank_candidates

# DINO's preprocessing (the notebook normalizes with ImageNet stats
# before the hub trunks; `retrieval.ipynb` cells 37-46)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _build_embedder(config: dict, patch: int):
    """(embed_fn, description): embed_fn maps a (B, p, p, C) uint8 batch
    to (B, D) f32 embeddings."""
    import jax

    name = str(config["net"])
    variant = name.lower().removeprefix("dino_")
    from cvcs_tpu.models.vit import VIT_VARIANTS, dino_vit

    if variant in VIT_VARIANTS:
        model = dino_vit(variant, **common.model_dtypes(config))
        ckpt = config.get("load_checkpoint")
        if ckpt and Path(ckpt).is_file():
            # a DINO torch.hub checkpoint (.pth state dict)
            import torch

            from cvcs_tpu.utils.torch_import import import_vit
            sd = torch.load(ckpt, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            variables = import_vit(sd, depth=model.depth)
            print(f"Loaded DINO checkpoint {ckpt}", flush=True)
        else:
            variables = common.restore_variables(config, model, patch)

        @jax.jit
        def embed(v, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
            cls, _ = model.apply(v, x)
            return cls

        return (lambda imgs: embed(variables, imgs)), f"DINO {variant} CLS"

    model, spec, _ = common.build_net(config)
    variables = common.restore_variables(config, model, patch)
    pool = config.get("pool", "max")
    return (lambda imgs: extract_embedding(model, variables, imgs,
                                           pool=pool)), f"{name} tap"


def retrieve(config: dict) -> dict:
    import time

    from cvcs_tpu.config.loader import RETRIEVE_KEYS, validate_keys

    validate_keys(config, RETRIEVE_KEYS, {"dataset", "patch_size"},
                  "retrieve")
    t_start = time.time()
    timings: dict[str, float] = {}
    patch = int(config["patch_size"])
    num_classes = int(config.get("num_classes", 15)) + 1
    loader = ChunkLoader(config["dataset"], chunk_size=1, patch_size=patch,
                         load_context=False,
                         seed=int(config.get("seed", 0)))
    if config.get("images"):
        loader.specify(config["images"])

    # materialize the whole candidate pool ON DEVICE (patch images +
    # masks). The chunks arrive device-resident from the loader; pulling
    # them to host and re-uploading per batch/probe cost ~100 MB of
    # tunnel transfers per run — everything below slices the device pool
    # in place and syncs to host once per phase.
    images, masks = [], []
    for c in range(len(loader)):
        chunk = loader.get_chunk(c, shuffle_patches=False)
        images.append(chunk.images)
        masks.append(chunk.masks)
    images = images[0] if len(images) == 1 else jnp.concatenate(images)
    masks = masks[0] if len(masks) == 1 else jnp.concatenate(masks)
    n = int(images.shape[0])
    timings["load_s"] = time.time() - t_start
    print(f"candidate pool: {n} patches", flush=True)

    emb = None
    if config.get("net"):
        t0 = time.time()
        embed, desc = _build_embedder(config, patch)
        bs = int(config.get("batch_size", 16))
        # zero-pad only the TAIL batch so every batch has one shape and
        # the jitted forward compiles ONCE (a second ragged-shape program
        # costs ~3-5 min through this machine's remote compiler). Padding
        # the whole pool would materialize a second full copy in HBM —
        # the pool scales with the gallery now that patches live on device
        # enqueue every batch, sync to host ONCE — a per-batch np.asarray
        # forced a tunnel round trip per batch (measured: 76.8 s for what
        # is ~1 s of device compute at 960 patches / bs 16)
        parts = []
        for s in range(0, n, bs):
            batch = images[s:s + bs]
            short = bs - batch.shape[0]
            if short:
                batch = jnp.pad(
                    batch, ((0, short),) + ((0, 0),) * (images.ndim - 1))
            parts.append(embed(batch))
        emb = np.asarray(jnp.concatenate(parts)[:n])
        timings["embeddings_s"] = time.time() - t0
        print(f"embeddings: {desc}, {emb.shape}", flush=True)

    t0 = time.time()
    rng = np.random.default_rng(int(config.get("seed", 0)))
    probes = rng.choice(n, size=min(int(config.get("num_probes", 10)), n),
                        replace=False)
    topk = int(config.get("topk", 10))
    # ONE compiled program scoring a probe against the full device pool;
    # self-matches drop out at ranking time. The previous per-probe
    # masks[others] host gather + upload + eager per-op dispatch chain
    # measured 10.9 s/probe through the tunnel.
    scores_fn = jax.jit(
        lambda t, q: compute_scores(t, q, num_classes))
    emd_rankings, emb_rankings, mask_rankings = [], [], []
    for probe in probes:
        probe = int(probe)
        scores = {k: np.asarray(v)
                  for k, v in scores_fn(masks[probe], masks).items()}
        ranks = {"probe": probe}
        for key, higher in (("emd", False), ("miou", True),
                            ("wiou", True), ("pprec", True)):
            order = rank_candidates(scores[key], higher_better=higher)
            ranks[key] = [int(k) for k in order if k != probe][:topk]
        mask_rankings.append(ranks)
        emd_rankings.append(
            [int(k) for k in rank_candidates(scores["emd"],
                                             higher_better=False)
             if k != probe])
        if emb is not None:
            order = rank_by_distance(emb[probe], emb,
                                     metric=config.get("metric", "l2"))
            emb_rankings.append([int(k) for k in order if k != probe])

    timings["scores_s"] = time.time() - t0
    # the notebook's per-score rankings ARE the output in mask-only mode
    # (this used to compute them and return nothing)
    out = {"num_probes": len(probes), "mask_rankings": mask_rankings}
    for r in mask_rankings:
        print(f"probe {r['probe']}: EMD top{topk} -> {r['emd']}",
              flush=True)
    if emb is not None:
        print("embedding-vs-EMD agreement "
              "(notebook `scores_evaluation`):", flush=True)
        out["agreement"] = scores_evaluation(emd_rankings, emb_rankings)
    timings["total_s"] = time.time() - t_start
    out["timings"] = {k: round(v, 3) for k, v in timings.items()}
    print("timings: " + "  ".join(f"{k}={v:.2f}s"
                                  for k, v in out["timings"].items()),
          flush=True)
    return out


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        retrieve(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
