"""Golden-value tests: losses vs torch.nn.CrossEntropyLoss, metric math vs
the reference formulas on hand-built confusion matrices (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.metrics import (
    accuracy, compute_metrics, confusion_matrix, f1, iou, normalize_rows,
    precision, print_metrics, recall, update_confusion,
)
from cvcs_tpu.metrics.confusion import HostConfusion
from cvcs_tpu.ops import losses

torch = pytest.importorskip("torch")


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


class TestCrossEntropyTorchParity:
    B, H, W, C = 2, 8, 8, 16

    def _labels(self, seed=1):
        rng = np.random.default_rng(seed)
        return rng.integers(0, self.C, size=(self.B, self.H, self.W))

    def _torch_ce(self, logits, labels, weight=None, ignore_index=-100):
        crit = torch.nn.CrossEntropyLoss(
            weight=None if weight is None else torch.tensor(weight),
            ignore_index=ignore_index)
        # torch wants NCHW logits
        t_logits = torch.tensor(logits).permute(0, 3, 1, 2)
        return float(crit(t_logits, torch.tensor(labels).long()))

    def test_plain(self):
        logits = _rand((self.B, self.H, self.W, self.C))
        labels = self._labels()
        ours = float(losses.cross_entropy(jnp.asarray(logits), labels))
        assert ours == pytest.approx(self._torch_ce(logits, labels), rel=1e-5)

    def test_ignore_background(self):
        logits = _rand((self.B, self.H, self.W, self.C), 2)
        labels = self._labels(3)
        labels[0, :4] = 0  # plenty of ignored pixels
        ours = float(losses.cross_entropy(
            jnp.asarray(logits), labels, ignore_index=0))
        ref = self._torch_ce(logits, labels, ignore_index=0)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_weighted(self):
        logits = _rand((self.B, self.H, self.W, self.C), 4)
        labels = self._labels(5)
        w = np.linspace(0.1, 2.0, self.C).astype(np.float32)
        ours = float(losses.cross_entropy(
            jnp.asarray(logits), labels, weights=w))
        assert ours == pytest.approx(
            self._torch_ce(logits, labels, weight=w), rel=1e-5)

    def test_weighted_with_ignore(self):
        logits = _rand((self.B, self.H, self.W, self.C), 6)
        labels = self._labels(7)
        labels[:, :2] = 0
        w = np.linspace(0.5, 1.5, self.C).astype(np.float32)
        ours = float(losses.cross_entropy(
            jnp.asarray(logits), labels, weights=w, ignore_index=0))
        ref = self._torch_ce(logits, labels, weight=w, ignore_index=0)
        assert ours == pytest.approx(ref, rel=1e-5)


def test_loss_factory_names():
    fn = losses.build_loss("CEL", ignore_background=True)
    logits = jnp.asarray(_rand((1, 4, 4, 16)))
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    assert np.isfinite(float(fn(logits, labels)))
    with pytest.raises(ValueError):
        losses.build_loss("nope")
    with pytest.raises(ValueError):
        losses.build_loss("wCEL")  # needs weights
    for name in ["MSE", "DL", "DEL"]:
        v = float(losses.build_loss(name)(logits, labels))
        assert np.isfinite(v)


def test_dice_perfect_prediction_is_zero():
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 4, (2, 8, 8)))
    logits = jax.nn.one_hot(labels, 4) * 1e4
    assert float(losses.dice(logits, labels)) == pytest.approx(0.0, abs=1e-4)


class TestConfusion:
    def test_update_and_layout(self):
        conf = confusion_matrix(4)
        pred = jnp.asarray([0, 1, 2, 2, 3])
        target = jnp.asarray([0, 1, 1, 2, 3])
        conf = update_confusion(conf, pred, target, num_classes=4)
        conf = np.asarray(conf)
        assert conf[1, 2] == 1  # target 1 predicted as 2 -> row=target
        assert conf.sum() == 5
        assert np.trace(conf) == 4

    def test_ignore_index(self):
        conf = confusion_matrix(4)
        conf = update_confusion(
            conf, jnp.asarray([1, 1]), jnp.asarray([0, 1]),
            num_classes=4, ignore_index=0)
        assert np.asarray(conf).sum() == 1

    def test_normalize_rows(self):
        conf = np.array([[2, 2], [0, 0]], np.int64)
        n = normalize_rows(conf)
        assert np.allclose(n, [[0.5, 0.5], [0.0, 0.0]])

    def test_host_fold(self):
        host = HostConfusion(4)
        dev = update_confusion(
            confusion_matrix(4), jnp.asarray([1]), jnp.asarray([1]),
            num_classes=4)
        host.fold(dev)
        host.fold(dev)
        assert host.total[1, 1] == 2
        assert host.total.dtype == np.int64


class TestScores:
    # conf[target, pred]
    CONF = np.array([
        [5, 1, 0],
        [2, 8, 0],
        [0, 0, 0],   # class 2 absent from target -> excluded
    ], np.int64)

    def test_per_class_and_excluded(self):
        scores, excluded = iou(self.CONF, mean=False, return_excluded=True)
        assert excluded == [2]
        assert scores[0] == pytest.approx(5 / (5 + 1 + 2))
        assert scores[1] == pytest.approx(8 / (8 + 1 + 2))
        assert scores[2] == 0.0

    def test_means_exclude_absent(self):
        m = iou(self.CONF, mean=True)
        a = 5 / 8
        b = 8 / 11
        assert m == pytest.approx((a + b) / 2)

    def test_precision_excluded_condition_differs(self):
        # class 2 has tp+fp = 0 -> excluded for precision too
        _, excluded = precision(self.CONF, macro=False, return_excluded=True)
        assert excluded == [2]
        conf = self.CONF.copy()
        conf[0, 2] = 1  # now fp>0 for class 2: precision includes it (as 0)
        _, excluded2 = precision(conf, macro=False, return_excluded=True)
        assert excluded2 == []
        _, excluded_iou = iou(conf, mean=False, return_excluded=True)
        assert excluded_iou == [2]  # IoU still excludes (tp+fn==0)

    def test_accuracy(self):
        assert accuracy(self.CONF) == pytest.approx(13 / 16)

    def test_f1_and_recall(self):
        assert recall(self.CONF, macro=True) == pytest.approx(
            (5 / 6 + 8 / 10) / 2)
        assert f1(self.CONF, mean=True) == pytest.approx(
            (10 / 13 + 16 / 19) / 2)

    def test_print_metrics_dict(self, capsys):
        d = print_metrics(self.CONF)
        captured = capsys.readouterr().out
        assert "mIoU" in captured and "Excluded classes" in captured
        assert set(d) == {"perclass_IoU", "mIoU", "precision_score",
                          "recall_score", "dice_score", "oa_score"}

    def test_compute_metrics_16(self):
        rng = np.random.default_rng(0)
        conf = rng.integers(0, 1000, (16, 16)).astype(np.int64)
        m = compute_metrics(conf)
        assert len(m["perclass_IoU"]) == 16
        assert 0 <= m["mIoU"] <= 1 and 0 <= m["oa_score"] <= 1


def test_plots_write_files(tmp_path):
    from cvcs_tpu.metrics.plots import plot_confusion, plot_priors

    conf = np.random.default_rng(1).integers(0, 100, (16, 16)).astype(np.int64)
    p1 = tmp_path / "conf.png"
    p2 = tmp_path / "priors.png"
    plot_confusion(normalize_rows(conf), str(p1))
    plot_priors(conf, str(p2))
    assert p1.stat().st_size > 0 and p2.stat().st_size > 0
