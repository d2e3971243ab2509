"""``python -m cvcs_tpu.cli.retrieve <config.yaml>`` — the reference's
retrieval notebook (`retrieval.ipynb`, SURVEY §2.6) as a reproducible CLI.

Given a GID15-style dataset, ranks every scene's patches against a probe
patch by (a) mask-similarity scores (mIoU / wIoU / pixel precision / EMD)
and (b) deep-feature embedding distance from a trained model, then runs
the notebook's EMD-agreement benchmark over a sample of probes.

Config keys: ``dataset``, ``patch_size``, ``net`` + ``load_checkpoint``
(embedding model; optional — mask scores alone without), ``pool``
(max|mean), ``metric`` (l2|l1|cosine), ``num_probes``, ``images``
(restrict scenes), ``num_classes``, ``seed``.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from cvcs_tpu.cli import common
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.retrieval import (
    compute_scores, extract_embedding, rank_by_distance, scores_evaluation,
)
from cvcs_tpu.retrieval.scores import rank_candidates


def retrieve(config: dict) -> dict:
    patch = int(config["patch_size"])
    num_classes = int(config.get("num_classes", 15)) + 1
    loader = ChunkLoader(config["dataset"], chunk_size=1, patch_size=patch,
                         load_context=False,
                         seed=int(config.get("seed", 0)))
    if config.get("images"):
        loader.specify(config["images"])

    # materialize the whole candidate pool (patch images + masks)
    images, masks = [], []
    for c in range(len(loader)):
        chunk = loader.get_chunk(c, shuffle_patches=False)
        images.append(np.asarray(chunk.images))
        masks.append(np.asarray(chunk.masks))
    images = np.concatenate(images)
    masks = np.concatenate(masks)
    n = images.shape[0]
    print(f"candidate pool: {n} patches", flush=True)

    emb = None
    if config.get("net"):
        model, spec, _ = common.build_net(config)
        variables = common.restore_variables(config, model, patch)
        parts = []
        bs = int(config.get("batch_size", 16))
        for s in range(0, n, bs):
            parts.append(np.asarray(extract_embedding(
                model, variables, jnp.asarray(images[s:s + bs]),
                pool=config.get("pool", "max"))))
        emb = np.concatenate(parts)

    rng = np.random.default_rng(int(config.get("seed", 0)))
    probes = rng.choice(n, size=min(int(config.get("num_probes", 10)), n),
                        replace=False)
    emd_rankings, emb_rankings = [], []
    for probe in probes:
        others = np.asarray([j for j in range(n) if j != probe])
        scores = compute_scores(masks[probe], jnp.asarray(masks[others]),
                                num_classes)
        emd_rank = [int(others[k]) for k in
                    rank_candidates(scores["emd"], higher_better=False)]
        emd_rankings.append(emd_rank)
        if emb is not None:
            order = rank_by_distance(
                jnp.asarray(emb[probe]), jnp.asarray(emb[others]),
                metric=config.get("metric", "l2"))
            emb_rankings.append([int(others[k]) for k in order])

    out = {"num_probes": len(probes)}
    if emb is not None:
        print("embedding-vs-EMD agreement "
              "(notebook `scores_evaluation`):", flush=True)
        out["agreement"] = scores_evaluation(emd_rankings, emb_rankings)
    return out


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        retrieve(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
