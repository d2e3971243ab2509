"""Retrieval subsystem tests: score math on hand-built masks, EMD
properties, ranking agreement benchmark, embedding taps per model family."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.retrieval import (
    class_hist, compute_scores, extract_embedding, get_best_match_idx,
    per_image_emd, per_image_miou, per_image_wiou, pixel_precision,
    rank_by_distance, scores_evaluation,
)

C = 16


class TestMaskScores:
    def test_identical_masks(self):
        t = np.array([[1, 2], [3, 0]])
        q = t[None]
        s = compute_scores(t, q, C)
        assert float(s["miou"][0]) == pytest.approx(1.0)
        assert float(s["wiou"][0]) == pytest.approx(1.0)
        assert float(s["pprec"][0]) == pytest.approx(1.0)
        assert float(s["emd"][0]) == pytest.approx(0.0, abs=1e-7)

    def test_pixel_precision_ignores_background(self):
        t = np.array([[0, 0], [1, 1]])
        q = np.array([[[5, 5], [1, 2]]])  # matches 1 of 2 fg pixels
        assert float(pixel_precision(t, q)[0]) == pytest.approx(0.5)

    def test_miou_excludes_absent_classes(self):
        t = np.full((4, 4), 1)
        q = np.full((1, 4, 4), 1)
        # only class 1 present -> mean over 1 class
        assert float(per_image_miou(t, q, C)[0]) == pytest.approx(1.0)
        q2 = np.full((1, 4, 4), 2)
        # classes 1 and 2 present across masks, both IoU 0
        assert float(per_image_miou(t, q2, C)[0]) == pytest.approx(0.0)

    def test_wiou_weights_by_target_support(self):
        t = np.array([[1, 1], [1, 2]])
        q = np.array([[[1, 1], [1, 1]]])
        # class1: inter 3, union 4 -> 0.75 weight 0.75; class2: 0 weight .25
        assert float(per_image_wiou(t, q, C)[0]) == pytest.approx(
            0.75 * 0.75)

    def test_emd_orders_by_histogram_distance(self):
        t = np.full((8, 8), 1)
        near = np.concatenate(
            [np.full((8, 4), 1), np.full((8, 4), 2)], axis=1)[None]
        far = np.full((1, 8, 8), 15)
        emd = per_image_emd(t, np.concatenate([near, far]), C)
        assert float(emd[0]) < float(emd[1])
        # all-class-1 vs all-class-15: cumsum L1 distance = 14 bins apart
        assert float(emd[1]) == pytest.approx(14.0)

    def test_emd_ignores_background_pixels(self):
        t = np.full((4, 4), 3)
        q = np.array([[[3, 0], [0, 3]]])   # same fg histogram, extra bg
        assert float(per_image_emd(t, q, C)[0]) == pytest.approx(0.0,
                                                                 abs=1e-7)

    def test_class_hist(self):
        h = class_hist(np.array([[0, 1], [1, 2]]), 4)
        np.testing.assert_allclose(np.asarray(h), [0.25, 0.5, 0.25, 0.0])

    def test_best_match_direction(self):
        scores = {"miou": jnp.asarray([0.1, 0.9]),
                  "emd": jnp.asarray([0.1, 0.9])}
        assert get_best_match_idx("miou", scores) == 1
        assert get_best_match_idx("emd", scores) == 0
        with pytest.raises(ValueError):
            get_best_match_idx("nope", scores)


def test_scores_evaluation_perfect_and_null():
    ranks = [list(range(50)) for _ in range(4)]
    perfect = scores_evaluation(ranks, ranks, silent=True)
    assert perfect["top1"] == pytest.approx(1.0)
    assert perfect["top5to5"] == pytest.approx(1.0)
    reversed_ranks = [list(range(49, -1, -1)) for _ in range(4)]
    null = scores_evaluation(ranks, reversed_ranks, silent=True)
    assert null["top1"] == 0.0
    assert null["top5to50"] == pytest.approx(1.0)  # all ids within top-50


def test_rank_by_distance_metrics():
    probe = jnp.asarray([1.0, 0.0])
    cands = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [2.0, 0.0]])
    assert rank_by_distance(probe, cands, "l2")[0] == 0
    assert rank_by_distance(probe, cands, "l1")[0] == 0
    cos = rank_by_distance(probe, cands, "cosine")
    assert set(cos[:2]) == {0, 2}  # colinear vectors tie at distance 0


@pytest.mark.parametrize("name,dim", [("Unet", 1024), ("SegformerB0", 256)])
def test_embedding_taps(name, dim):
    import jax

    from cvcs_tpu.models import build_model

    model, _ = build_model(name, C, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    emb = extract_embedding(model, variables, x)
    assert emb.shape == (2, dim)


def test_embedding_tap_deeplab():
    import jax

    from cvcs_tpu.models import build_model

    model, _ = build_model("MobileNet", C, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    emb = extract_embedding(model, variables, x)
    assert emb.shape == (1, 960)  # the notebook's 960-d MobileNet embedding
