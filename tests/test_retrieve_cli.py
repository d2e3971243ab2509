"""Retrieval CLI end-to-end on the synthetic dataset."""

from tests.conftest import PATCH


def test_retrieve_mask_scores_only(gid15_root):
    from cvcs_tpu.cli.retrieve import retrieve

    out = retrieve(dict(dataset=str(gid15_root), patch_size=PATCH,
                        num_probes=3, seed=0))
    assert out["num_probes"] == 3
    assert "agreement" not in out


def test_retrieve_with_embeddings(gid15_root):
    from cvcs_tpu.cli.retrieve import retrieve

    out = retrieve(dict(dataset=str(gid15_root), patch_size=PATCH,
                        num_probes=3, seed=0, net="Unet", num_classes=15,
                        precision="f32", metric="cosine", images=[0, 1]))
    ag = out["agreement"]
    assert set(ag) >= {"top1", "top5", "top10", "top5to50"}
    assert all(0.0 <= v <= 1.0 for v in ag.values())
