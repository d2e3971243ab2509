"""Determinism: same seed -> identical chunks/augmentation/shuffles
(the reference's Python `random` pipeline is unseeded and irreproducible;
explicit PRNG plumbing is a framework feature, SURVEY §7 layer 1)."""

import numpy as np

from cvcs_tpu.data.augment import AugmentConfig
from cvcs_tpu.data.loader import ChunkLoader
from tests.conftest import PATCH


def _chunk_arrays(root, seed):
    loader = ChunkLoader(str(root), chunk_size=2, patch_size=PATCH,
                         random_shift=True, augment=AugmentConfig(),
                         load_context=True, seed=seed)
    loader.shuffle()
    chunk = loader.get_chunk(0, random_tps=[(PATCH * 2, 0.5)])
    return (np.asarray(chunk.images), np.asarray(chunk.masks),
            np.asarray(chunk.contexts), list(loader.idxs))


def test_same_seed_same_pipeline(gid15_root):
    a = _chunk_arrays(gid15_root, seed=42)
    b = _chunk_arrays(gid15_root, seed=42)
    assert a[3] == b[3]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])


def test_different_seed_differs(gid15_root):
    a = _chunk_arrays(gid15_root, seed=1)
    b = _chunk_arrays(gid15_root, seed=2)
    assert not np.array_equal(a[0], b[0])


def test_train_cli_auto_resume(gid15_root, tmp_path):
    """load_checkpoint: auto resumes from the newest checkpoint (and starts
    fresh when none exists)."""
    import yaml

    from cvcs_tpu.cli import train as train_cli

    cfg = dict(
        train=str(gid15_root), validation=str(gid15_root),
        net="Unet", epochs=1, chunk_size=2, validation_chunk_size=2,
        patch_size=PATCH, batch_size=4, loss="CEL", opt="SGD2",
        checkpoint_directory=str(tmp_path), freq=1,
        precision_evaluation_freq=9, num_classes=15,
        precision="f32", load_context=False, debug=True,
        load_checkpoint="auto",
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    assert train_cli.main(["train", str(p)]) == 0     # fresh start
    assert (tmp_path / "checkpoint1").is_dir()
    cfg["epochs"] = 2
    p.write_text(yaml.safe_dump(cfg))
    assert train_cli.main(["train", str(p)]) == 0     # auto-resume
    assert (tmp_path / "checkpoint2").is_dir()
