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


def test_retrieve_mask_only_returns_rankings(gid15_root):
    """Mask-only mode must RETURN the per-score rankings (it used to
    compute them for every probe and return nothing)."""
    from cvcs_tpu.cli.retrieve import retrieve

    out = retrieve(dict(dataset=str(gid15_root), patch_size=PATCH,
                        num_probes=2, topk=5, seed=0))
    assert len(out["mask_rankings"]) == 2
    for r in out["mask_rankings"]:
        for key in ("emd", "miou", "wiou", "pprec"):
            assert len(r[key]) == 5
            assert r["probe"] not in r[key]


def test_retrieve_dino_vit_checkpoint(gid15_root, tmp_path):
    """The notebook's DINO trunks are reachable from the CLI: a
    DINO-named .pth state dict loads through import_vit and the
    CLS-token embeddings drive the agreement benchmark."""
    import pytest
    torch = pytest.importorskip("torch")

    from cvcs_tpu.cli.retrieve import retrieve
    from tests.test_vit import _TorchDinoTwin

    torch.manual_seed(1)
    # vits16 preset dims (dim 384, depth 12, heads 6, patch 16, grid 14)
    twin = _TorchDinoTwin(384, 12, 6, 16, 14).eval()
    ckpt = tmp_path / "dino_vits16.pth"
    torch.save(twin.state_dict(), ckpt)

    out = retrieve(dict(dataset=str(gid15_root), patch_size=PATCH,
                        num_probes=2, seed=0, net="vits16",
                        precision="f32", load_checkpoint=str(ckpt),
                        metric="cosine", images=[0, 1]))
    ag = out["agreement"]
    assert set(ag) >= {"top1", "top5", "top10"}
    assert all(0.0 <= v <= 1.0 for v in ag.values())
