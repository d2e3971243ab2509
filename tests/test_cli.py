"""CLI end-to-end tests: the reference's four entry scripts, driven through
YAML configs on the synthetic dataset (SURVEY §4 smoke-test strategy)."""

import json

import numpy as np
import pytest
import yaml

from tests.conftest import NUM_SCENES, PATCH


def _write_cfg(path, cfg):
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.fixture(scope="module")
def trained_ckpt(gid15_root, tmp_path_factory):
    """Train 1 epoch of a tiny Unet through the train CLI; return ckpt dir."""
    from cvcs_tpu.cli import train as train_cli

    ckpt_dir = tmp_path_factory.mktemp("ckpts")
    cfg_path = tmp_path_factory.mktemp("cfg") / "train.yaml"
    cfg = dict(
        train=str(gid15_root), validation=str(gid15_root),
        net="Unet", epochs=1, chunk_size=2, validation_chunk_size=2,
        patch_size=PATCH, batch_size=4, loss="CEL", opt="SGD2",
        checkpoint_directory=str(ckpt_dir), freq=1,
        precision_evaluation_freq=1, num_classes=15,
        precision="f32", load_context=False, random_shift=True,
        augmentation=True, debug=True, verbose=True,
    )
    rc = train_cli.main(["train", _write_cfg(cfg_path, cfg)])
    assert rc == 0
    return ckpt_dir / "checkpoint1"


def test_train_cli_writes_checkpoint(trained_ckpt):
    assert trained_ckpt.is_dir()
    meta = json.loads((trained_ckpt / "meta.json").read_text())
    assert meta["epoch"] == 0
    assert meta["optimizer"] == "SGD2"
    assert len(meta["training_loss_values"]) > 0


def test_train_cli_resume(trained_ckpt, gid15_root, tmp_path):
    from cvcs_tpu.cli import train as train_cli

    cfg = dict(
        train=str(gid15_root), validation=str(gid15_root),
        net="Unet", epochs=2, chunk_size=2, validation_chunk_size=2,
        patch_size=PATCH, batch_size=4, loss="CEL", opt="SGD2",
        checkpoint_directory=str(trained_ckpt.parent), freq=1,
        precision_evaluation_freq=5, num_classes=15,
        precision="f32", load_context=False, debug=True,
        load_checkpoint=str(trained_ckpt),
    )
    rc = train_cli.main(["train", _write_cfg(tmp_path / "resume.yaml", cfg)])
    assert rc == 0
    assert (trained_ckpt.parent / "checkpoint2").is_dir()


def test_evaluate_cli(trained_ckpt, gid15_root, tmp_path):
    from cvcs_tpu.cli import evaluate as eval_cli

    conf_png = tmp_path / "conf.png"
    priors_png = tmp_path / "priors.png"
    cfg = dict(
        dataset=str(gid15_root), net="Unet", patch_size=PATCH,
        num_classes=15, precision="f32",
        load_checkpoint=str(trained_ckpt),
        images=[0], confusion_matrix=str(conf_png), priors=str(priors_png),
    )
    metrics = eval_cli.evaluate(
        yaml.safe_load(yaml.safe_dump(cfg)))
    assert 0.0 <= metrics["oa_score"] <= 1.0
    assert conf_png.stat().st_size > 0 and priors_png.stat().st_size > 0


def test_evaluate_cli_ensemble(trained_ckpt, gid15_root, tmp_path):
    from cvcs_tpu.cli import evaluate as eval_cli

    members = tmp_path / "ensemble.yaml"
    members.write_text(yaml.safe_dump({"Unet": str(trained_ckpt)}))
    cfg = dict(
        dataset=str(gid15_root), net="Ensemble", patch_size=PATCH,
        num_classes=15, precision="f32", ensemble_config=str(members),
        images=[0],
    )
    metrics = eval_cli.evaluate(cfg)
    assert 0.0 <= metrics["oa_score"] <= 1.0


def test_predict_cli(trained_ckpt, gid15_root, tmp_path, monkeypatch):
    from cvcs_tpu.cli import predict as predict_cli
    from cvcs_tpu.data.geometry import TileGrid
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(str(gid15_root))
    tpi = TileGrid(ds.image_shape, PATCH).tiles_per_image
    out_dir = tmp_path / "output"
    out_map = tmp_path / "map.png"
    cfg = dict(
        dataset=str(gid15_root), net="Unet", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        load_checkpoint=str(trained_ckpt),
        range=[0, tpi], mask_only=True, out_image=str(out_map),
        output=str(out_dir),
    )
    predict_cli.predict(cfg)
    assert out_map.stat().st_size > 0
    assert len(list(out_dir.glob("*.png"))) == tpi
    # patch 0 of the stitched map equals 0.png (reference tile contract)
    from PIL import Image
    stitched = np.asarray(Image.open(out_map))
    t0 = np.asarray(Image.open(out_dir / "0.png"))
    np.testing.assert_array_equal(t0, stitched[:PATCH, :PATCH])


def test_evaluate_cli_mesh_sharded(trained_ckpt, gid15_root):
    """`mesh: {data: 8}` in an evaluation config shards eval batches over
    the 8-device mesh (weights replicated, confusion fold psum-reduced);
    the resulting confusion totals — hence every metric — must be
    bit-equal to the single-device run."""
    from cvcs_tpu.cli import evaluate as eval_cli

    base = dict(
        dataset=str(gid15_root), net="Unet", patch_size=PATCH,
        num_classes=15, precision="f32", batch_size=8,
        load_checkpoint=str(trained_ckpt), images=[0, 1],
    )
    single = eval_cli.evaluate(dict(base))
    # combined mesh: batches over `data` AND patch rows over `spatial`
    # (eval-mode forwards are bit-exact under row sharding — conv-window
    # reductions are never split and BN uses running stats)
    for mesh in ({"data": 8}, {"data": 4, "spatial": 2}):
        sharded = eval_cli.evaluate(dict(base, mesh=mesh))
        assert single.keys() == sharded.keys()
        for k in single:
            np.testing.assert_array_equal(np.asarray(single[k]),
                                          np.asarray(sharded[k]),
                                          err_msg=f"{mesh} {k}")


def test_predict_cli_ensemble(trained_ckpt, gid15_root, tmp_path):
    """`net: Ensemble` through the predict CLI — the reference's
    `inference.py` builds its net via `load_network`, which dispatches
    "Ensemble" (`utils.py:174-195`), so an ensemble inference config is a
    legal reference workflow. Two members: the trained Unet checkpoint
    plus a freshly-initialized Unetv2 (null checkpoint), voting per pixel
    inside the whole-scene program."""
    from cvcs_tpu.cli import predict as predict_cli
    from cvcs_tpu.data.geometry import TileGrid
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(str(gid15_root))
    tpi = TileGrid(ds.image_shape, PATCH).tiles_per_image
    members = tmp_path / "ensemble.yaml"
    members.write_text(yaml.safe_dump(
        {"Unet": str(trained_ckpt), "Unetv2": None}))
    out_dir = tmp_path / "output"
    out_map = tmp_path / "map.png"
    cfg = dict(
        dataset=str(gid15_root), net="Ensemble", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        ensemble_config=str(members),
        range=[0, tpi], mask_only=True, out_image=str(out_map),
        output=str(out_dir),
    )
    predict_cli.predict(cfg)
    assert out_map.stat().st_size > 0
    assert len(list(out_dir.glob("*.png"))) == tpi


def test_predict_cli_streamed(trained_ckpt, gid15_root, tmp_path):
    """stream_rows: band-pipelined scene path must produce the same
    stitched map as the whole-scene program."""
    from PIL import Image

    from cvcs_tpu.cli import predict as predict_cli
    from cvcs_tpu.data.geometry import TileGrid
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(str(gid15_root))
    tpi = TileGrid(ds.image_shape, PATCH).tiles_per_image
    maps = []
    for stream_rows in (None, 1):
        out_map = tmp_path / f"map_{stream_rows}.png"
        cfg = dict(
            dataset=str(gid15_root), net="Unet", patch_size=PATCH,
            border_correction=PATCH + 16, num_classes=15, precision="f32",
            load_checkpoint=str(trained_ckpt), mask_only=True,
            range=[0, tpi], out_image=str(out_map),
            output=str(tmp_path / "o"))
        if stream_rows:
            cfg["stream_rows"] = stream_rows
        predict_cli.predict(cfg)
        maps.append(np.asarray(Image.open(out_map)))
    np.testing.assert_array_equal(maps[0], maps[1])


def test_predict_cli_fullconv(trained_ckpt, gid15_root, tmp_path):
    """fullconv_bands: the seamless banded full-convolution path must
    drive the same export surface (per-patch PNGs + stitched map) with
    the stitched geometry of the window path."""
    from PIL import Image

    from cvcs_tpu.cli import predict as predict_cli
    from cvcs_tpu.data.geometry import TileGrid
    from cvcs_tpu.data.reader import SceneDataset

    ds = SceneDataset(str(gid15_root))
    grid = TileGrid(ds.image_shape, PATCH)
    tpi = grid.tiles_per_image
    out_map = tmp_path / "map_fc.png"
    out_dir = tmp_path / "o_fc"
    cfg = dict(
        dataset=str(gid15_root), net="Unet", patch_size=PATCH,
        border_correction=PATCH + 16, num_classes=15, precision="f32",
        load_checkpoint=str(trained_ckpt), mask_only=True,
        range=[0, tpi], out_image=str(out_map), output=str(out_dir),
        fullconv_bands=1)
    predict_cli.predict(cfg)
    stitched = np.asarray(Image.open(out_map))
    assert stitched.shape == (grid.rows * PATCH, grid.cols * PATCH, 3)
    assert len(list(out_dir.glob("*.png"))) == tpi

    # chunked block-grid variant drives the same surface (incl. a tail
    # band not divisible by row_tiles)
    cfg.update(out_image=str(tmp_path / "map_fc2.png"),
               output=str(tmp_path / "o_fc2"),
               fullconv_bands=2, fullconv_chunks=[2, 2])
    predict_cli.predict(cfg)
    stitched2 = np.asarray(Image.open(tmp_path / "map_fc2.png"))
    assert stitched2.shape == stitched.shape


def test_esa_cli(trained_ckpt, gid15_root, tmp_path):
    from PIL import Image

    from cvcs_tpu.cli import esa as esa_cli

    # arbitrary-size external image (not tile-aligned)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (PATCH * 2 + 7, PATCH * 3 + 3, 3), np.uint8)
    src = tmp_path / "modena.png"
    Image.fromarray(img).save(src)
    out = tmp_path / "esa_out.png"
    cfg = dict(image=str(src), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32",
               load_checkpoint=str(trained_ckpt), out_image=str(out))
    esa_cli.run(cfg)
    got = np.asarray(Image.open(out))
    assert got.shape == (PATCH * 2, PATCH * 3, 3)


def test_train_cli_spatial_transpose_warning(gid15_root, tmp_path, capsys):
    """mesh spatial>1 with a transpose-conv decoder net must surface the
    measured SPMD re-materialization hazard at build time (BASELINE.md
    §Blocked) — not only in the perf doc."""
    from cvcs_tpu.cli import train as train_cli

    cfg = dict(
        train=str(gid15_root), validation=str(gid15_root), net="Unetv2",
        epochs=1, chunk_size=2, validation_chunk_size=2, patch_size=PATCH,
        batch_size=4, loss="CEL", opt="SGD2",
        checkpoint_directory=str(tmp_path), freq=1,
        precision_evaluation_freq=5, num_classes=15, precision="f32",
        mesh={"data": 2, "spatial": 4})
    train_cli.build_trainer(cfg)
    assert "re-materialization" in capsys.readouterr().out
    # bilinear-decoder Unet has no transpose convs: no warning
    train_cli.build_trainer(dict(cfg, net="Unet"))
    assert "re-materialization" not in capsys.readouterr().out


def test_serve_esa_retrieve_config_validation(gid15_root, tmp_path, capsys):
    """The framework-added entry points validate their configs like the
    reference's original three: missing required keys fail fast, unknown
    keys (typos like `border_corection`) warn instead of silently running
    with defaults."""
    from cvcs_tpu.cli import esa as esa_cli
    from cvcs_tpu.cli import serve as serve_cli
    from cvcs_tpu.cli.retrieve import retrieve

    with pytest.raises(KeyError, match="watch_dir"):
        serve_cli.serve({"net": "Unet"})
    with pytest.raises(KeyError, match="image"):
        esa_cli.run({"net": "Unet"})
    with pytest.raises(KeyError, match="dataset"):
        retrieve({"patch_size": PATCH})

    # unknown key: warn and proceed (mask-only retrieve is the cheapest
    # full run of the three)
    out = retrieve(dict(dataset=str(gid15_root), patch_size=PATCH,
                        num_probes=1, seed=0, border_corection=128))
    assert out["num_probes"] == 1
    captured = capsys.readouterr().out
    assert "unknown retrieve config keys" in captured
    assert "border_corection" in captured


def test_serve_cli(trained_ckpt, tmp_path):
    """Directory-watching service: processes arrivals once (manifest is
    the restart journal), masks equal the one-shot engine's output, and
    a restart picks up only new files."""
    import json

    from PIL import Image

    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(8)
    for i in range(3):
        img = rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3), np.uint8)
        Image.fromarray(img).save(watch / f"r{i}.png")
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               load_checkpoint=str(trained_ckpt),
               output=str(tmp_path / "srv"))
    assert serve_cli.serve(cfg) == 3
    out = tmp_path / "srv"
    manifest = [json.loads(l) for l in
                (out / "manifest.jsonl").read_text().splitlines()]
    assert sorted(m["name"] for m in manifest) == [f"r{i}.png"
                                                   for i in range(3)]
    # masks match the one-shot engine on the same raster
    from cvcs_tpu.cli import common
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter

    model, spec, nc = common.build_net(cfg)
    variables = common.restore_variables(cfg, model, PATCH)
    seg = SceneSegmenter(model.apply, variables,
                         InferenceConfig(patch_size=PATCH,
                                         border_correction=None,
                                         batch_tiles=4, num_classes=nc),
                         returns_logits=spec.returns_logits)
    raster = np.asarray(Image.open(watch / "r0.png"))
    want = np.asarray(Image.open(out / "r0_mask.png"))
    got_dir = tmp_path / "oneshot.png"
    seg.export_map(seg.predict_scene(raster), got_dir)
    np.testing.assert_array_equal(np.asarray(Image.open(got_dir)), want)
    # restart: already-served names skipped, only the new arrival runs
    img = rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3), np.uint8)
    Image.fromarray(img).save(watch / "r3.png")
    assert serve_cli.serve(cfg) == 1
    assert (out / "r3_mask.png").exists()


def test_serve_engages_native_tier(trained_ckpt, tmp_path, monkeypatch):
    """The daemon's measured bottleneck is host decode+export (BASELINE.md
    serve section), so arrivals must flow through the C++ tier: prefetch
    at poll time, take() for decode, async PNG writes flushed before the
    journal line lands. Pins the round-4 verdict Weak #2 fix."""
    import json

    from PIL import Image

    from cvcs_tpu import native
    from cvcs_tpu.cli import serve as serve_cli

    calls = {"prefetch": 0, "take": 0, "write": 0, "flush": 0}
    real_take, real_write = native.take, native.write_png_async

    def fake_take(path):
        calls["take"] += 1
        return real_take(path)

    def fake_write(path, arr):
        r = real_write(path, arr)
        calls["write"] += r
        return r

    monkeypatch.setattr(native, "prefetch",
                        lambda p: calls.__setitem__(
                            "prefetch", calls["prefetch"] + 1))
    monkeypatch.setattr(native, "take", fake_take)
    monkeypatch.setattr(native, "write_png_async", fake_write)
    # serve imports `native` as a module, so the monkeypatched attrs are
    # seen through both cvcs_tpu.native and the engine's import
    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (PATCH, PATCH, 3), np.uint8)
    Image.fromarray(img).save(watch / "a.png")
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               load_checkpoint=str(trained_ckpt),
               output=str(tmp_path / "srv"))
    assert serve_cli.serve(cfg) == 1
    assert calls["prefetch"] == 1 and calls["take"] == 1
    out = tmp_path / "srv"
    manifest = [json.loads(l) for l in
                (out / "manifest.jsonl").read_text().splitlines()]
    assert manifest[0]["name"] == "a.png"
    if native.load() is not None:   # native tier built on this box
        assert calls["write"] == 1
        # flushed before journaling: the mask file must already exist
        assert (out / "a_mask.png").exists()


def test_serve_cli_resilience(trained_ckpt, tmp_path):
    """A long-lived daemon must outlive bad input: corrupt files and
    rasters the engine rejects are journaled with an error entry after
    max_retries (never crash-looping the service), a torn manifest line
    doesn't block restart, and already-journaled names are skipped."""
    import json

    from PIL import Image

    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(9)
    Image.fromarray(rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3),
                                 np.uint8)).save(watch / "good.png")
    (watch / "corrupt.png").write_bytes(b"this is not a png")
    Image.fromarray(rng.integers(0, 255, (8, 8, 3),
                                 np.uint8)).save(watch / "tiny.png")
    Image.fromarray(rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3),
                                 np.uint8)).save(watch / "pre.png")
    out = tmp_path / "srv"
    out.mkdir()
    # pre-existing journal: one valid entry + a torn final line (crash
    # mid-append)
    (out / "manifest.jsonl").write_text(
        json.dumps({"name": "pre.png", "shape": [PATCH * 2, PATCH * 2]})
        + "\n" + '{"name": "torn')
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               max_retries=1, load_checkpoint=str(trained_ckpt),
               output=str(out))
    assert serve_cli.serve(cfg) == 1   # only good.png; pre.png journaled
    assert (out / "good_mask.png").exists()
    assert not (out / "pre_mask.png").exists()
    entries = {}
    for line in (out / "manifest.jsonl").read_text().splitlines():
        try:
            e = json.loads(line)
            entries[e["name"]] = e
        except json.JSONDecodeError:
            pass
    assert "error" in entries["corrupt.png"]
    assert "error" in entries["tiny.png"]
    assert "error" not in entries["good.png"]
    # restart with everything journaled: nothing re-processed
    assert serve_cli.serve(cfg) == 0
    # operator replaces the corrupt file with a valid raster: its
    # signature differs from the journaled error's, so it is re-admitted
    # and served; tiny.png is unchanged and stays blacklisted
    Image.fromarray(rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3),
                                 np.uint8)).save(watch / "corrupt.png")
    assert serve_cli.serve(cfg) == 1
    assert (out / "corrupt_mask.png").exists()


def test_serve_cli_ensemble_and_tta_guard(trained_ckpt, tmp_path):
    """`net: Ensemble` works through the serving daemon (every
    inference-side CLI shares `common.build_apply`, which dispatches
    Ensemble like the reference's `load_network`, `utils.py:174-195`);
    and `tta` on a label-output net fails loudly instead of silently
    averaging nothing."""
    from PIL import Image

    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(11)
    Image.fromarray(rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3),
                                 np.uint8)).save(watch / "r0.png")
    members = tmp_path / "ensemble.yaml"
    members.write_text(yaml.safe_dump(
        {"Unet": str(trained_ckpt), "Unetv2": None}))
    out = tmp_path / "srv"
    cfg = dict(watch_dir=str(watch), net="Ensemble", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               ensemble_config=str(members), output=str(out))
    assert serve_cli.serve(cfg) == 1
    assert (out / "r0_mask.png").exists()
    with pytest.raises(ValueError, match="tta"):
        serve_cli.serve(dict(cfg, tta=True))


def test_serve_cli_batch_poison_isolation(trained_ckpt, tmp_path,
                                          monkeypatch):
    """A batch failure falls back to per-raster runs, so one poison pill
    cannot block its same-shape group."""
    from PIL import Image

    from cvcs_tpu.cli import common
    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(10)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3),
                                     np.uint8)).save(watch / f"r{i}.png")

    real = common.segment_rasters
    calls = []

    def flaky(seg, rasters, mesh=None):
        calls.append(len(rasters))
        if len(rasters) > 1:
            raise RuntimeError("batch poisoned")
        if np.asarray(rasters[0]).sum() % 2 == 0:   # one raster "bad"
            raise RuntimeError("single poisoned")
        return real(seg, rasters, mesh)

    monkeypatch.setattr(serve_cli.common, "segment_rasters", flaky)
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               max_retries=1, load_checkpoint=str(trained_ckpt),
               output=str(tmp_path / "srv"))
    n = serve_cli.serve(cfg)
    # the batch attempt failed, each raster then ran alone; the
    # deterministic "bad" ones were journaled, the rest served
    assert calls[0] == 3 and set(calls[1:]) == {1}
    bad = sum(1 for i in range(3)
              if np.asarray(Image.open(
                  watch / f"r{i}.png").convert("RGB")).sum() % 2 == 0)
    assert n == 3 - bad


def test_serve_cli_same_stem_masks_disambiguated(trained_ckpt, tmp_path):
    """a.png and a.tif both arrive: two distinct masks, not a silent
    overwrite of a_mask.png; the journal records each mask name and a
    restarted daemon honors prior claims."""
    import json

    from PIL import Image

    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(12)
    img_a = rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3), np.uint8)
    img_b = rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3), np.uint8)
    Image.fromarray(img_a).save(watch / "a.png")
    Image.fromarray(img_b).save(watch / "a.tif")
    out = tmp_path / "srv"
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=1,
               load_checkpoint=str(trained_ckpt), output=str(out))
    assert serve_cli.serve(cfg) == 2
    entries = {json.loads(l)["name"]: json.loads(l) for l in
               (out / "manifest.jsonl").read_text().splitlines()}
    masks = {entries["a.png"]["mask"], entries["a.tif"]["mask"]}
    assert len(masks) == 2
    for m in masks:
        assert (out / m).exists()
    # restart with a same-stem newcomer: the prior claim survives the
    # journal round-trip, so the new source gets the suffixed name
    Image.fromarray(img_a).save(watch / "b.png")
    Image.fromarray(img_b).save(watch / "b.tiff")
    assert serve_cli.serve(cfg) == 2
    entries = {json.loads(l)["name"]: json.loads(l) for l in
               (out / "manifest.jsonl").read_text().splitlines()}
    assert entries["b.png"]["mask"] != entries["b.tiff"]["mask"]


def test_serve_cli_midcopy_retries_reset(trained_ckpt, tmp_path,
                                         monkeypatch):
    """A raster still being copied in keeps failing to decode, but its
    (size, mtime) keeps changing — the retry counter must reset on
    change so the daemon never blacklists a slow arrival (it only gives
    up after max_retries failures on an UNCHANGED file)."""
    import json

    from PIL import Image

    from cvcs_tpu.cli import serve as serve_cli

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, (PATCH * 2, PATCH * 2, 3), np.uint8)
    full = tmp_path / "full.png"
    Image.fromarray(img).save(full)
    data = full.read_bytes()
    target = watch / "slow.png"
    target.write_bytes(data[:100])            # copy in progress

    stage = iter([data[:200], data])          # still copying, then done

    real_sleep = serve_cli.time.sleep

    def copy_more(_s):
        try:
            target.write_bytes(next(stage))
        except StopIteration:
            pass
        real_sleep(0)

    monkeypatch.setattr(serve_cli.time, "sleep", copy_more)
    out = tmp_path / "srv"
    # max_retries=2: two failures on an UNCHANGED file would give up —
    # the copy-in-progress file fails on polls 1 AND 2 but changed in
    # between, so the counter resets and poll 3 serves it
    cfg = dict(watch_dir=str(watch), net="Unet", patch_size=PATCH,
               num_classes=15, precision="f32", poll_s=0.0, max_polls=3,
               max_retries=2, load_checkpoint=str(trained_ckpt),
               output=str(out))
    assert serve_cli.serve(cfg) == 1
    entries = {json.loads(l)["name"]: json.loads(l) for l in
               (out / "manifest.jsonl").read_text().splitlines()}
    assert "error" not in entries["slow.png"]
    assert (out / "slow_mask.png").exists()


def test_esa_cli_mesh(trained_ckpt, tmp_path):
    """`mesh` in an esa config: same-shape raster groups run
    scene-parallel over the data axis (remainder through the per-raster
    spatial path); every stitched map bit-equal to the meshless run."""
    from PIL import Image

    from cvcs_tpu.cli import esa as esa_cli

    rng = np.random.default_rng(5)
    srcs = []
    for i in range(3):   # one full group of 2 + remainder 1
        img = rng.integers(0, 255, (PATCH * 4, PATCH * 2, 3), np.uint8)
        src = tmp_path / f"r{i}.png"
        Image.fromarray(img).save(src)
        srcs.append(str(src))
    base = dict(image=srcs, net="Unet", patch_size=PATCH,
                num_classes=15, precision="f32",
                load_checkpoint=str(trained_ckpt))
    esa_cli.run(dict(base, out_image=str(tmp_path / "a.png")))
    esa_cli.run(dict(base, out_image=str(tmp_path / "b.png"),
                     mesh={"data": 2, "spatial": 4}))
    for i in range(3):
        a = np.asarray(Image.open(tmp_path / f"a_{i}.png"))
        b = np.asarray(Image.open(tmp_path / f"b_{i}.png"))
        np.testing.assert_array_equal(a, b, err_msg=str(i))
