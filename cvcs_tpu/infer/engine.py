"""Sliding-window whole-scene segmentation engine.

Capability parity with the reference's inference path (`inference.py`,
`utils.inference` `utils.py:145-171`, `esa.py`): tile a full scene row-major
into p x p patches, forward each inside a larger bc x bc border-correction
window, center-crop the logits back to p (anti-tiling), argmax, and emit a
full-scene label map plus color-mask exports.

TPU-first re-design (SURVEY §3.3 — the reference round-trips every patch
through the host, writes 960 PNGs, then *re-reads them all* to stitch):

* the scene is transferred to HBM once (uint8), all window gathers /
  forwards / crops / argmaxes / stitching happen inside ONE jitted program
  (`lax.scan` over tile batches, `dynamic_update_slice` into an on-device
  label canvas);
* per-patch PNG export and the stitched ``map.png`` are optional host-side
  writes of results that already exist on device;
* border-correction geometry is *centered* by default, fixing the
  reference's (bc-p)/2 systematic offset (`dataset.py:18-23` +
  `utils.py:146,154`, SURVEY quirk 2); ``bug_parity=True`` reproduces the
  reference's bottom-right-anchored windows exactly;
* multi-device: scene row-strips shard over the mesh's ``spatial`` axis
  under ``shard_map``; border windows at strip seams are healed with a
  ppermute halo exchange (:mod:`cvcs_tpu.parallel.halo`) and each device
  stitches its own strip — scene-level context parallelism over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cvcs_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS
from cvcs_tpu.data.geometry import TileGrid
from cvcs_tpu.data.palette import GID15Palette
from cvcs_tpu.parallel.halo import exchange_row_halo


def _labels_to_host(labels) -> np.ndarray:
    """Move a label canvas to the host as uint8.

    Label values are argmax indices < 256, so casting on device before the
    transfer cuts device->host traffic 4x vs the int32 canvas (measured
    21.4 s -> ~5 s for a 6800x7200 scene through this machine's tunneled
    chip; on PCIe hosts the same ratio applies).
    """
    if isinstance(labels, jax.Array):
        labels = labels.astype(jnp.uint8)
    return np.asarray(labels)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Inference-config vocabulary (reference `configs/inference/*.yaml`)."""

    patch_size: int = 224
    border_correction: int | None = 256   # None -> raw p x p forwards
    # windows per forward; 128 measured fastest at GID15 scene scale on
    # v5e — same-session curve 16/64/96/128/192 = 198/212/241/253/242
    # tiles512/s (round 3); tail batches wrap so small scenes are
    # unaffected
    batch_tiles: int = 128
    num_classes: int = 16
    bug_parity: bool = False              # reference's anchored windows
    # bare color PNG vs 3-panel figure; reference default is False
    # (`inference.py:36`, `utils.py:145`)
    mask_only: bool = False
    # test-time augmentation: average logits over the dihedral flips
    # (identity, lr-flip, ud-flip, 180) — BASELINE config 5's "TTA +
    # overlap stitching" path. Requires returns_logits models.
    tta: bool = False


class SceneSegmenter:
    """Whole-scene segmentation for one model + restored variables."""

    def __init__(
        self,
        apply_fn: Callable,          # model.apply
        variables: Any,              # {"params", "batch_stats"}
        config: InferenceConfig,
        returns_logits: bool = True,
        requires_context: bool = False,
        stride_product: int = 1,
    ):
        self.apply_fn = apply_fn
        self.variables = variables
        self.cfg = config
        self.returns_logits = returns_logits
        self.requires_context = requires_context
        # the model's fullconv divisibility constraint (ModelSpec
        # .stride_product); 1 = unconstrained (DeepLab heads resize)
        self.stride_product = stride_product
        if config.tta and not returns_logits:
            raise ValueError(
                "tta averages logits over the dihedral flips — a "
                "label-output net (e.g. Ensemble) has no logits to "
                "average; drop 'tta' or apply it per member instead")
        if requires_context:
            # every forward here passes context=None: no reference zoo
            # model consumes context at inference (`nets.py:96` takes and
            # ignores it), and the engine has no per-window context
            # plumbing — refuse rather than silently segment a future
            # context net without its second input
            raise ValueError(
                "the scene engine does not extract per-window contexts; "
                "requires_context models are unsupported here (no "
                "reference zoo model consumes context at inference)")
        bc = config.border_correction
        if bc is not None and bc < config.patch_size:
            raise ValueError(
                f"border_correction={bc} must be >= "
                f"patch_size={config.patch_size} (the window is a "
                "superset of the tile)")
        self.palette = GID15Palette()
        # variables are a traced argument (not baked constants); apply_fn
        # and the geometry are static via closure.
        self._run_jit = jax.jit(self._run_scene,
                                static_argnames=("rows", "cols"))
        self._run_tiles_jit = jax.jit(self._run_tiles,
                                      static_argnames=("cols",))
        self._run_scenes_jit = jax.jit(self._run_scenes,
                                       static_argnames=("rows", "cols"))
        self._fullconv_jit = jax.jit(
            self._fullconv_forward,
            static_argnames=("out_h", "out_w", "halo"))
        self._fullconv_band_jit = jax.jit(
            self._fullconv_band,
            static_argnames=("band_h", "out_h", "out_w", "halo"))
        self._fullconv_band_chunked_jit = jax.jit(
            self._fullconv_band_chunked,
            static_argnames=("chunk_h", "chunk_w", "n_rows", "n_cols",
                             "chunk_out_h", "chunk_out_w", "halo"))
        self._sharded_cache = {}   # (mesh, geometry) -> jitted shard_map

    def _reject_tta_fullconv(self) -> None:
        """The fullconv paths do not implement the dihedral TTA averaging
        the window path applies — refusing the combination beats silently
        returning non-TTA predictions labeled as a TTA run."""
        if self.cfg.tta:
            raise ValueError(
                "tta composes with the window path only; the fullconv "
                "paths don't apply the dihedral averaging — drop 'tta' "
                "or drop 'fullconv_bands'/'fullconv_chunks'")

    # -- geometry ------------------------------------------------------------
    def _window(self) -> tuple[int, int]:
        """(window size, offset of window top-left relative to tile)."""
        p = self.cfg.patch_size
        bc = self.cfg.border_correction or p
        margin = bc - p
        off = margin if self.cfg.bug_parity else margin // 2
        return bc, off

    # -- window-batch forward (shared by scene + selected-tiles paths) --------
    def _forward_labels(self, variables, wins):
        """(B, bc, bc, C) windows -> (B, p, p) int32 labels: forward (with
        optional dihedral-flip TTA), argmax, center-crop back to the tile."""
        p = self.cfg.patch_size
        bc, _ = self._window()

        def forward(w):
            return self.apply_fn(variables, w, context=None, train=False)

        if self.cfg.tta and self.returns_logits:
            # dihedral-flip TTA, logits averaged in the input frame
            out = forward(wins)
            out = out + forward(wins[:, :, ::-1])[:, :, ::-1]
            out = out + forward(wins[:, ::-1])[:, ::-1]
            out = out + forward(wins[:, ::-1, ::-1])[:, ::-1, ::-1]
            out = out / 4.0
        else:
            out = forward(wins)
        if self.returns_logits:
            # NOTE (profiled, v5e): the tail 1x1 conv + BN fuse into the
            # argmax's iota-reduce loop fusion (14.5% of the program).
            # Splitting them with an optimization_barrier was MEASURED
            # SLOWER (139.8 vs 167 tiles512/s) — materializing the f32
            # logits costs more than the in-loop dot products save. Keep
            # the fusion; don't repeat the experiment without a new trace.
            lab = jnp.argmax(out, axis=-1).astype(jnp.int32)
        else:
            lab = out.astype(jnp.int32)
        # center-crop the label window back to the tile
        crop0 = (bc - p) // 2
        return lax.dynamic_slice(
            lab, (0, crop0, crop0), (lab.shape[0], p, p))

    def _labels_for_windows(self, variables, scene_pad, wy, wx):
        """Gather bc-windows at padded coords (wy, wx) of one scene and
        run :meth:`_forward_labels`."""
        bc, _ = self._window()

        def gather(y, x):
            return lax.dynamic_slice(
                scene_pad, (y, x, 0), (bc, bc, scene_pad.shape[2]))

        wins = jax.vmap(gather)(wy, wx).astype(jnp.float32)
        return self._forward_labels(variables, wins)

    # -- single-device whole-scene path ---------------------------------------
    def _run_scene(self, variables, scene_pad: jnp.ndarray, rows: int,
                   cols: int):
        """scene_pad: (H + 2*margin_pad, W + 2*margin_pad, C) uint8, where
        margin_pad = bc - p covers both anchoring modes. Returns (H, W) i32."""
        p = self.cfg.patch_size
        bc, off = self._window()
        pad = bc - p
        n_tiles = rows * cols
        bt = min(self.cfg.batch_tiles, n_tiles)
        n_batches = -(-n_tiles // bt)

        idx = jnp.arange(n_batches * bt) % n_tiles   # wrap the tail batch
        tly = (idx // cols) * p
        tlx = (idx % cols) * p
        # window top-left in padded coords
        wy = tly + pad - off
        wx = tlx + pad - off
        origins = jnp.stack(
            [wy, wx, tly, tlx], axis=1).reshape(n_batches, bt, 4)

        def step(canvas, obatch):
            lab = self._labels_for_windows(
                variables, scene_pad, obatch[:, 0], obatch[:, 1])

            def put(cv, i):
                return lax.dynamic_update_slice(
                    cv, lab[i], (obatch[i, 2], obatch[i, 3])), None

            canvas, _ = lax.scan(put, canvas, jnp.arange(bt))
            return canvas, None

        canvas = jnp.zeros(
            (rows * p, cols * p), jnp.int32)
        canvas, _ = lax.scan(step, canvas, origins)
        return canvas

    # -- selected-tiles path (reference `range` economics) ---------------------
    def _run_tiles(self, variables, scene_pad: jnp.ndarray,
                   ids: jnp.ndarray, cols: int):
        """Forward ONLY the tiles whose row-major local ids are in ``ids``
        — the reference's ``range: [lb, ub]`` forwards just the selected
        patches (`inference.py:30-37`, `utils.py:150-156`); paper-figure
        configs render a handful of tiles, not whole scenes. Returns
        (len(ids), p, p) int32 labels."""
        p = self.cfg.patch_size
        bc, off = self._window()
        pad = bc - p
        n = ids.shape[0]
        bt = min(self.cfg.batch_tiles, n)
        n_batches = -(-n // bt)
        idx = jnp.concatenate(
            [ids, jnp.broadcast_to(ids[:1], (n_batches * bt - n,))])
        wy = ((idx // cols) * p + pad - off).reshape(n_batches, bt)
        wx = ((idx % cols) * p + pad - off).reshape(n_batches, bt)

        def step(_, yx):
            return None, self._labels_for_windows(
                variables, scene_pad, yx[0], yx[1])

        _, labs = lax.scan(step, None, (wy, wx))
        return labs.reshape(n_batches * bt, p, p)[:n]

    def predict_tiles(self, scene, tile_ids) -> jnp.ndarray:
        """Labels for a list of row-major local tile indices of one scene:
        (len(tile_ids), p, p) int32, computing only those windows."""
        ids_np = np.asarray(tile_ids, np.int32)
        if ids_np.size == 0:
            p = self.cfg.patch_size
            return jnp.zeros((0, p, p), jnp.int32)
        scene_pad, _, cols = self.pad_scene(scene)
        return self._run_tiles_jit(self.variables, scene_pad,
                                   jnp.asarray(ids_np), cols)

    # -- multi-scene batched path ------------------------------------------
    def _run_scenes(self, variables, scenes_pad: jnp.ndarray, rows: int,
                    cols: int):
        """(S, Hp, Wp, C) padded scene stack -> (S, H, W) i32 label maps in
        ONE program — amortizes dispatch for small-scene (ESA) workloads
        where per-scene tile counts are tiny (ROADMAP item 7)."""
        p = self.cfg.patch_size
        bc, off = self._window()
        pad = bc - p
        n_scenes = scenes_pad.shape[0]
        tpi = rows * cols
        n_tiles = n_scenes * tpi
        bt = min(self.cfg.batch_tiles, n_tiles)
        n_batches = -(-n_tiles // bt)

        idx = jnp.arange(n_batches * bt) % n_tiles
        s = idx // tpi
        t = idx % tpi
        tly = (t // cols) * p
        tlx = (t % cols) * p
        origins = jnp.stack(
            [s, tly + pad - off, tlx + pad - off, tly, tlx],
            axis=1).reshape(n_batches, bt, 5)

        def gather(o):
            return lax.dynamic_slice(
                scenes_pad, (o[0], o[1], o[2], 0),
                (1, bc, bc, scenes_pad.shape[3]))[0]

        def step(canvas, obatch):
            wins = jax.vmap(gather)(obatch).astype(jnp.float32)
            lab = self._forward_labels(variables, wins)

            def put(cv, i):
                return lax.dynamic_update_slice(
                    cv, lab[i][None],
                    (obatch[i, 0], obatch[i, 3], obatch[i, 4])), None

            canvas, _ = lax.scan(put, canvas, jnp.arange(bt))
            return canvas, None

        canvas = jnp.zeros((n_scenes, rows * p, cols * p), jnp.int32)
        canvas, _ = lax.scan(step, canvas, origins)
        return canvas

    def pad_scenes(self, scenes):
        """Upload + pad a same-shape scene stack once; returns
        (stack, rows, cols) for :meth:`predict_scenes_padded` — the
        multi-scene analogue of :meth:`pad_scene`'s upload/compute split
        (callers overlap the next stack's transfer with this one's
        forward; device-side the batched program runs at whole-scene
        parity, ~1030 tiles/s on v5e)."""
        scenes = np.stack([np.asarray(s) for s in scenes]) \
            if isinstance(scenes, (list, tuple)) else np.asarray(scenes)
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        grid = TileGrid((scenes.shape[1], scenes.shape[2]), p)
        stack = jnp.pad(jnp.asarray(scenes),
                        ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        return stack, grid.rows, grid.cols

    def predict_scenes_padded(self, stack: jnp.ndarray, rows: int,
                              cols: int) -> jnp.ndarray:
        """Run the batched multi-scene program on a pre-padded stack."""
        return self._run_scenes_jit(self.variables, stack, rows, cols)

    def predict_scenes(self, scenes) -> jnp.ndarray:
        """Batched whole-scene inference over same-shape scenes: a list (or
        (S, H, W, C) stack) of uint8 rasters -> (S, H', W') int32 labels,
        one jitted program for the whole batch."""
        stack, rows, cols = self.pad_scenes(scenes)
        return self.predict_scenes_padded(stack, rows, cols)

    def pad_scene(self, scene: np.ndarray | jnp.ndarray):
        """Upload + zero-pad a scene once; returns (scene_pad, rows, cols)
        for :meth:`predict_padded`. Splitting upload from compute lets
        callers overlap the next scene's host->device transfer with the
        current scene's forward (and keeps benchmarks honest — the
        transfer is per-scene work, not per-inference work)."""
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        grid = TileGrid((scene.shape[0], scene.shape[1]), p)
        if grid.rows == 0 or grid.cols == 0:
            raise ValueError(
                f"scene {tuple(scene.shape[:2])} is smaller than one "
                f"{p}x{p} patch — nothing to segment")
        scene = jnp.asarray(scene)
        scene_pad = jnp.pad(scene, ((pad, pad), (pad, pad), (0, 0)))
        return scene_pad, grid.rows, grid.cols

    def predict_padded(self, scene_pad: jnp.ndarray, rows: int,
                       cols: int) -> jnp.ndarray:
        """Run the jitted whole-scene program on a pre-padded device scene."""
        return self._run_jit(self.variables, scene_pad, rows, cols)

    def predict_scene(self, scene: np.ndarray | jnp.ndarray) -> jnp.ndarray:
        """Scene (H, W, C) uint8 -> on-device (H', W') int32 label map, where
        H'/W' are the largest tile-aligned dims (reference drops partial
        tiles, `dataset.py:63-64`)."""
        scene_pad, rows, cols = self.pad_scene(scene)
        return self.predict_padded(scene_pad, rows, cols)

    def predict_scene_streamed(self, scene: np.ndarray,
                               band_rows: int = 8) -> np.ndarray:
        """Band-pipelined whole-scene inference for rasters too large to
        stage in HBM in one piece (the reference's domain has arbitrarily
        tall GeoTIFFs; SURVEY §5 long-context story).

        The scene streams through the device as bands of ``band_rows``
        tile-rows (+ border-correction halo), and the label canvas streams
        back as uint8 one band *behind* the compute, so at most one band
        of imagery plus two band canvases are device-resident — HBM use is
        O(band), not O(scene), unlike :meth:`predict_scene`. Returns a
        HOST uint8 (H', W') label array (the export paths accept it
        directly). Interior band halos are sliced from the real scene, so
        the values are identical to :meth:`predict_scene` (pinned by
        ``tests/test_inference.py``).
        """
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        scene = np.asarray(scene)
        grid = TileGrid((scene.shape[0], scene.shape[1]), p)
        rows, cols = grid.rows, grid.cols
        if rows == 0 or cols == 0:
            raise ValueError(
                f"scene {scene.shape[:2]} is smaller than one "
                f"{p}x{p} patch — nothing to segment")
        host_bands = []
        prev = None   # fetch one band late to keep upload/compute overlap
        for r0 in range(0, rows, band_rows):
            br = min(band_rows, rows - r0)
            y0, y1 = r0 * p, (r0 + br) * p
            top = max(0, y0 - pad)
            bot = min(scene.shape[0], y1 + pad)
            zt, zb = pad - (y0 - top), max(0, pad - (bot - y1))
            band = jnp.asarray(scene[top:bot])
            band_pad = jnp.pad(band, ((zt, zb), (pad, pad), (0, 0)))
            cur = self._run_jit(self.variables, band_pad, br,
                                cols).astype(jnp.uint8)
            if prev is not None:
                host_bands.append(np.asarray(prev))
            prev = cur
        host_bands.append(np.asarray(prev))
        return np.concatenate(host_bands, axis=0)

    # -- full-convolutional banded path (opt-in, beyond-reference) -------------
    def _check_fullconv_divisible(self, halo: int, band_heights, width: int):
        """Up-front shape contract for the fullconv paths: every
        halo-padded band the model will forward must be a multiple of the
        model's stride product, or the forward fails deep inside the
        decoder (UNet skip-concat shape error) / silently misaligns
        (Swin/SegFormer decoders overshoot the band). Raise a
        config-level error that names the knobs instead."""
        s = self.stride_product
        if s <= 1:
            return
        bad = sorted({d for d in set(band_heights) | {width} if d % s})
        if bad:
            p = self.cfg.patch_size
            raise ValueError(
                f"fullconv band shape(s) {bad} are not divisible by the "
                f"model's stride product {s}: with patch_size={p} and "
                f"halo={halo}, each band is (fullconv_bands*{p} + "
                f"2*{halo}) rows (the tail band may be shorter) x "
                f"(cols*{p} + 2*{halo}) columns — pick fullconv_bands / "
                f"border_correction (halo = (border_correction - "
                f"patch_size)/2) so both are multiples of {s}, or crop "
                f"the scene's tile grid")

    def _fullconv_band_heights(self, rows: int, band_rows: int, p: int,
                               halo: int) -> list[int]:
        """Padded heights of the full bands plus the (possibly shorter)
        tail band."""
        heights = []
        for r0 in range(0, rows, band_rows):
            heights.append(min(band_rows, rows - r0) * p + 2 * halo)
        return heights

    def _fullconv_forward(self, variables, band_pad, out_h: int, out_w: int,
                          halo: int):
        """One halo-padded band -> (out_h, out_w) uint8 labels via a single
        full-convolution forward (no windows)."""
        x = band_pad.astype(jnp.float32)[None]
        out = self.apply_fn(variables, x, context=None, train=False)
        if self.returns_logits:
            out = jnp.argmax(out, axis=-1)
        lab = lax.dynamic_slice(
            out.astype(jnp.uint8), (0, halo, halo), (1, out_h, out_w))
        return lab[0]

    def predict_scene_fullconv(self, scene, band_rows: int = 8,
                               halo: int | None = None) -> np.ndarray:
        """Seamless full-convolutional inference (opt-in; NOT the
        reference's per-window semantics).

        The window path forwards one bc x bc window per p x p tile —
        bc²/p² = 1.31x the scene's pixels at p224/bc256, all of it
        re-gathered per tile. The nets are fully convolutional, so each
        band of ``band_rows`` tile-rows can instead run as ONE
        convolution over the halo-padded band: compute overhead drops to
        ~(1 + 2*halo/band_h)(1 + 2*halo/W) ≈ 1.03x, the per-tile gather
        stage disappears, and there are NO tile seams inside a band at
        all (the reference's border correction only softens them).
        Residual band boundaries every ``band_rows * p`` rows see
        ``halo`` px of real context — the same per-edge context the
        border-corrected window path gives every tile.

        ``halo`` defaults to (bc - p)//2. Band shapes must satisfy the
        model's divisibility constraint (UNet family: /16) — i.e.
        ``band_rows * p + 2*halo`` and ``cols * p + 2*halo`` divisible
        by 16 for the defaults. Bands stream through the device like
        :meth:`predict_scene_streamed` (one band of imagery + two label
        bands resident). Returns HOST uint8 (H', W') labels.
        """
        self._reject_tta_fullconv()
        p = self.cfg.patch_size
        bc, _ = self._window()
        if halo is None:
            halo = (bc - p) // 2
        scene = np.asarray(scene)
        grid = TileGrid((scene.shape[0], scene.shape[1]), p)
        rows, cols = grid.rows, grid.cols
        if rows == 0 or cols == 0:
            raise ValueError(
                f"scene {scene.shape[:2]} is smaller than one "
                f"{p}x{p} patch — nothing to segment")
        w = cols * p
        self._check_fullconv_divisible(
            halo, self._fullconv_band_heights(rows, band_rows, p, halo),
            w + 2 * halo)
        right = min(scene.shape[1], w + halo)   # real pixels where present
        zr = halo - (right - w)
        host_bands = []
        prev = None   # one band late -> upload overlaps compute
        for r0 in range(0, rows, band_rows):
            br = min(band_rows, rows - r0)
            y0, y1 = r0 * p, (r0 + br) * p
            top = max(0, y0 - halo)
            bot = min(scene.shape[0], y1 + halo)
            zt, zb = halo - (y0 - top), max(0, halo - (bot - y1))
            band = jnp.asarray(scene[top:bot, :right])
            band_pad = jnp.pad(band, ((zt, zb), (halo, zr), (0, 0)))
            cur = self._fullconv_jit(self.variables, band_pad, br * p, w,
                                     halo)
            if prev is not None:
                host_bands.append(np.asarray(prev))
            prev = cur
        host_bands.append(np.asarray(prev))
        return np.concatenate(host_bands, axis=0)

    def pad_scene_fullconv(self, scene, halo: int | None = None):
        """Upload + halo-pad a scene ONCE for :meth:`predict_padded_fullconv`
        (the device-resident analogue of :meth:`pad_scene` for the window
        path). Real pixels fill the bottom/right halo where the raster
        extends past the tile grid; zeros elsewhere. Returns
        ``(padded uint8 device array (H'+2h, W'+2h, C), rows, cols, halo)``.
        """
        self._reject_tta_fullconv()
        p = self.cfg.patch_size
        bc, _ = self._window()
        if halo is None:
            halo = (bc - p) // 2
        scene = np.asarray(scene)
        grid = TileGrid((scene.shape[0], scene.shape[1]), p)
        rows, cols = grid.rows, grid.cols
        if rows == 0 or cols == 0:
            raise ValueError(
                f"scene {scene.shape[:2]} is smaller than one "
                f"{p}x{p} patch — nothing to segment")
        h, w = rows * p, cols * p
        bot = min(scene.shape[0], h + halo)
        right = min(scene.shape[1], w + halo)
        core = jnp.asarray(scene[:bot, :right])
        padded = jnp.pad(core, ((halo, h + halo - bot),
                                (halo, w + halo - right), (0, 0)))
        return padded, rows, cols, halo

    def _fullconv_band(self, variables, padded, r0, band_h: int,
                       out_h: int, out_w: int, halo: int):
        """dynamic_slice one halo-overlapped band out of the device-resident
        padded scene and forward it (slice offsets are traced operands, so
        all full bands share ONE compiled program; the tail band is a
        second)."""
        band = lax.dynamic_slice(
            padded, (r0, 0, 0),
            (band_h, padded.shape[1], padded.shape[2]))
        return self._fullconv_forward(variables, band, out_h, out_w, halo)

    def _fullconv_band_chunked(self, variables, padded, r0, chunk_h: int,
                               chunk_w: int, n_rows: int, n_cols: int,
                               chunk_out_h: int, chunk_out_w: int,
                               halo: int):
        """Split a super-band into a BATCH of halo-overlapped blocks (an
        ``n_rows x n_cols`` grid) and forward them together: batched squarer
        tensors lower to faster conv shapes on the MXU than one batch-1
        full-width band (measured 26.0 → 16.8 ns/px at 32x704x928 vs
        1x1376x7232, `tools/fc_shape_probe.py`), at the cost of seams every
        ``chunk_out_h``/``chunk_out_w`` pixels (each healed with ``halo`` px
        of real context, like the window path's borders)."""
        blocks = [
            lax.dynamic_slice(
                padded, (r0 + i * chunk_out_h, j * chunk_out_w, 0),
                (chunk_h, chunk_w, padded.shape[2]))
            for i in range(n_rows) for j in range(n_cols)]
        x = jnp.stack(blocks).astype(jnp.float32)
        out = self.apply_fn(variables, x, context=None, train=False)
        if self.returns_logits:
            out = jnp.argmax(out, axis=-1)
        labs = lax.dynamic_slice(
            out.astype(jnp.uint8), (0, halo, halo),
            (n_rows * n_cols, chunk_out_h, chunk_out_w))
        return (labs.reshape(n_rows, n_cols, chunk_out_h, chunk_out_w)
                .transpose(0, 2, 1, 3)
                .reshape(n_rows * chunk_out_h, n_cols * chunk_out_w))

    def predict_padded_fullconv(self, padded, rows: int, cols: int,
                                halo: int, band_rows: int = 8,
                                col_tiles: int | None = None,
                                row_tiles: int | None = None):
        """Device-resident full-convolution inference over a scene padded by
        :meth:`pad_scene_fullconv`: no host round-trips between bands —
        returns the stitched (rows*p, cols*p) uint8 label map ON DEVICE
        (export with :meth:`export_map` / ``np.asarray``). Same label
        semantics as :meth:`predict_scene_fullconv` when ``col_tiles`` is
        None; with ``col_tiles=k`` each band of ``band_rows`` tile-rows runs
        as a batch of halo-overlapped blocks k tiles wide and ``row_tiles``
        (default ``band_rows``) tiles tall — faster conv shapes, seams every
        block instead of none. ``col_tiles`` must divide ``cols``; bands not
        divisible by ``row_tiles`` (the tail) fall back to band-tall
        blocks."""
        p = self.cfg.patch_size
        w = cols * p
        bands = []
        if col_tiles is not None and (col_tiles < 1 or cols % col_tiles):
            raise ValueError(
                f"col_tiles={col_tiles} must be a positive divisor of "
                f"the scene's {cols} tile columns")
        if col_tiles is None:
            self._check_fullconv_divisible(
                halo, self._fullconv_band_heights(rows, band_rows, p, halo),
                w + 2 * halo)
        else:
            rt0 = row_tiles or band_rows
            heights = [rt0 * p + 2 * halo] + [
                bh for bh in self._fullconv_band_heights(
                    rows, band_rows, p, halo)
                if (bh - 2 * halo) // p % rt0]   # tail fallback blocks
            self._check_fullconv_divisible(
                halo, heights, col_tiles * p + 2 * halo)
        for r0 in range(0, rows, band_rows):
            br = min(band_rows, rows - r0)
            if col_tiles is None:
                bands.append(self._fullconv_band_jit(
                    self.variables, padded, r0 * p, br * p + 2 * halo,
                    br * p, w, halo))
            else:
                rt = row_tiles or br
                if br % rt:
                    rt = br
                bands.append(self._fullconv_band_chunked_jit(
                    self.variables, padded, r0 * p, rt * p + 2 * halo,
                    col_tiles * p + 2 * halo, br // rt,
                    cols // col_tiles, rt * p, col_tiles * p, halo))
        return jnp.concatenate(bands, axis=0)

    def predict_scene_fullconv_sharded(self, scene, mesh,
                                       col_tiles: int | None = None,
                                       row_tiles: int | None = None
                                       ) -> jnp.ndarray:
        """Spatially-sharded full-convolution inference: each device takes a
        strip of ``rows/n`` tile-rows, receives ``halo`` rows of real context
        from its neighbors via :func:`exchange_row_halo` (one ppermute pair
        over ICI), and forwards its strip as one convolution (or a
        ``row_tiles x col_tiles`` block grid). Bit-identical to
        :meth:`predict_padded_fullconv` with ``band_rows = rows/n`` (and the
        same chunking) on a tile-grid-aligned scene — the band boundary at a
        device edge sees exactly the neighbor context the single-device band
        sees. Scene edges use zero context (like
        :meth:`predict_scene_sharded`; the device-resident single-chip path
        fills bottom/right halos with real raster pixels where present —
        crop the scene to the tile grid for exact cross-path equality).

        The tile-row count must divide the mesh's ``spatial`` axis size.
        Returns the stitched (rows*p, cols*p) uint8 map, row-sharded.
        """
        self._reject_tta_fullconv()
        p = self.cfg.patch_size
        bc, _ = self._window()
        halo = (bc - p) // 2
        n_sp = mesh.shape[SPATIAL_AXIS]
        grid = TileGrid((scene.shape[0], scene.shape[1]), p)
        rows, cols = grid.rows, grid.cols
        h, w = rows * p, cols * p
        if rows % n_sp:
            raise ValueError(
                f"{rows} tile rows do not shard over {n_sp} devices")
        rows_local = rows // n_sp
        if col_tiles is not None and (col_tiles < 1 or cols % col_tiles):
            raise ValueError(
                f"col_tiles={col_tiles} must be a positive divisor of "
                f"the scene's {cols} tile columns")
        rt = row_tiles or rows_local
        if rows_local % rt:
            raise ValueError(
                f"row_tiles={row_tiles} must divide the per-device "
                f"{rows_local} tile rows")
        self._check_fullconv_divisible(
            halo, [rt * p + 2 * halo] if col_tiles is not None
            else [rows_local * p + 2 * halo],
            (col_tiles if col_tiles is not None else cols) * p + 2 * halo)
        scene = jnp.asarray(scene)[:h, :w]
        scene_pad_cols = jnp.pad(scene, ((0, 0), (halo, halo), (0, 0)))

        key = (mesh, "fullconv", rows_local, cols, halo, col_tiles, rt)
        fn_jit = self._sharded_cache.get(key)
        if fn_jit is None:
            def body(variables, strip):
                # strip: (rows_local*p, w + 2*halo, C) local tile-rows
                ext = exchange_row_halo(strip, halo, SPATIAL_AXIS)
                if col_tiles is None:
                    return self._fullconv_band(
                        variables, ext, 0, rows_local * p + 2 * halo,
                        rows_local * p, w, halo)
                return self._fullconv_band_chunked(
                    variables, ext, 0, rt * p + 2 * halo,
                    col_tiles * p + 2 * halo, rows_local // rt,
                    cols // col_tiles, rt * p, col_tiles * p, halo)

            fn_jit = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(SPATIAL_AXIS, None, None)),
                out_specs=P(SPATIAL_AXIS, None), check_rep=False))
            self._sharded_cache[key] = fn_jit
        x = jax.device_put(
            scene_pad_cols, NamedSharding(mesh, P(SPATIAL_AXIS, None, None)))
        variables = jax.device_put(
            self.variables, NamedSharding(mesh, P()))
        return fn_jit(variables, x)

    # -- multi-device spatially-sharded path -----------------------------------
    def predict_scene_sharded(self, scene, mesh) -> jnp.ndarray:
        """Shard the scene's rows over the mesh's ``spatial`` axis, heal
        window seams with a ppermute halo, stitch per-device strips.
        Bit-identical to :meth:`predict_scene` — including non-tile-aligned
        rasters (real GID15 scenes): the raster's bottom/right overhang
        beyond the tile grid is real context for the edge tiles' border
        windows in the single-device path, so here the right overhang rides
        in the (unsharded) column padding and the bottom overhang is
        injected into the last device's lower halo (ppermute supplies zeros
        there, which is only correct when the raster ends exactly at the
        grid).

        The scene's tile-aligned height must divide evenly by
        ``patch_size * spatial_axis_size``.
        """
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        n_sp = mesh.shape[SPATIAL_AXIS]
        raw = np.asarray(scene)
        grid = TileGrid((raw.shape[0], raw.shape[1]), p)
        h, w = grid.rows * p, grid.cols * p
        if grid.rows % n_sp:
            raise ValueError(
                f"{grid.rows} tile rows do not shard over {n_sp} devices")
        hp = min(raw.shape[0], h + pad)   # real bottom overhang rows
        wp = min(raw.shape[1], w + pad)   # real right overhang cols
        # pad columns only (real overhang where present); rows are
        # extended via halo exchange
        scene_pad_cols = jnp.pad(jnp.asarray(raw[:h, :wp]),
                                 ((0, 0), (pad, pad - (wp - w)), (0, 0)))
        bottom = np.zeros((pad, w + 2 * pad) + raw.shape[2:], raw.dtype)
        if pad and hp > h:
            bottom[:hp - h, pad:pad + wp] = raw[h:hp, :wp]
        fn_jit = self._sharded_scene_program_edge(mesh, grid.rows,
                                                  grid.cols)
        x = jax.device_put(
            scene_pad_cols, NamedSharding(mesh, P(SPATIAL_AXIS, None, None)))
        b = jax.device_put(
            jnp.asarray(bottom), NamedSharding(mesh, P()))
        variables = jax.device_put(
            self.variables, NamedSharding(mesh, P()))
        return fn_jit(variables, x, b)

    def _sharded_scene_program_edge(self, mesh, rows: int, cols: int):
        """:meth:`sharded_scene_program` plus a third input: a replicated
        (pad, cols*p + 2*pad, C) array the LAST spatial device substitutes
        for its ppermute-zero lower halo — the raster's real bottom
        overhang (see :meth:`predict_scene_sharded`)."""
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        n_sp = mesh.shape[SPATIAL_AXIS]
        rows_local = rows // n_sp
        key = (mesh, "edge", rows_local, cols, pad)
        fn_jit = self._sharded_cache.get(key)
        if fn_jit is None:
            def body(variables, strip, bottom):
                ext = exchange_row_halo(strip, pad, SPATIAL_AXIS)
                if pad:
                    last = jax.lax.axis_index(SPATIAL_AXIS) == n_sp - 1
                    ext = ext.at[-pad:].set(
                        jnp.where(last, bottom, ext[-pad:]))
                return self._run_scene(variables, ext, rows_local, cols)

            fn_jit = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(SPATIAL_AXIS, None, None), P()),
                out_specs=P(SPATIAL_AXIS, None), check_rep=False))
            self._sharded_cache[key] = fn_jit
        return fn_jit

    def sharded_scene_program(self, mesh, rows: int, cols: int):
        """The cached jitted shard_map behind :meth:`predict_scene_sharded`
        for a (rows, cols)-tile scene: ``fn(variables, scene_pad_cols)``
        with ``variables`` replicated (``P()``) and ``scene_pad_cols`` a
        GLOBAL (rows*p, cols*p + 2*(bc-p), C) uint8 array sharded
        ``P(spatial, None, None)``. Exposed so multi-process (DCN)
        callers can build the global input themselves with
        ``jax.make_array_from_process_local_data`` — each host holds only
        its row strip; the halo ppermute crosses the process boundary.
        Single-process callers should use :meth:`predict_scene_sharded`.
        """
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        n_sp = mesh.shape[SPATIAL_AXIS]
        rows_local = rows // n_sp
        # One cached jitted shard_map per (mesh, geometry): rebuilding the
        # closure per scene would re-trace and re-lower every call — the
        # same per-call re-jit bug measured at 10.7 s/call in
        # retrieval/features.py (fixed there with lru_cache).
        # Mesh is hashable — keying on the object (not id()) keeps the
        # cache correct if a Mesh is garbage-collected and a new one
        # reuses the address.
        key = (mesh, rows_local, cols, pad)
        fn_jit = self._sharded_cache.get(key)
        if fn_jit is None:
            def body(variables, strip):
                # strip: (h/n, w + 2*pad, C) local rows
                ext = exchange_row_halo(strip, pad, SPATIAL_AXIS)
                return self._run_scene(variables, ext, rows_local, cols)

            fn_jit = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(SPATIAL_AXIS, None, None)),
                out_specs=P(SPATIAL_AXIS, None), check_rep=False))
            self._sharded_cache[key] = fn_jit
        return fn_jit

    def predict_scenes_sharded(self, scenes, mesh) -> jnp.ndarray:
        """Scene-parallel batched inference — the production pod layout:
        the scene stack shards over the mesh's ``data`` axis (independent
        scenes, zero communication on that axis) while each scene's rows
        shard over the ``spatial`` axis with ppermute halo exchange.
        Bit-identical to :meth:`predict_scene` run per scene — including
        non-tile-aligned rasters: the bottom/right overhang past the tile
        grid is real border-window context in the single-device path, so
        the right overhang rides in the unsharded column padding and the
        bottom overhang is injected into the last spatial device's lower
        halo (see :meth:`predict_scene_sharded`).

        The scene count must divide by the data axis size and the scenes'
        tile-row count by the spatial axis size; scenes must share one
        shape (the reference's GID15 scenes all do, `dataset.py:63-64`).
        Returns (S, H', W') int32 labels sharded over both axes.
        """
        p = self.cfg.patch_size
        bc, _ = self._window()
        pad = bc - p
        n_dp = mesh.shape[DATA_AXIS]
        n_sp = mesh.shape[SPATIAL_AXIS]
        stack = np.stack([np.asarray(s) for s in scenes]) \
            if isinstance(scenes, (list, tuple)) else np.asarray(scenes)
        if stack.shape[0] % n_dp:
            raise ValueError(
                f"{stack.shape[0]} scenes do not shard over the data "
                f"axis ({n_dp} devices)")
        grid = TileGrid((stack.shape[1], stack.shape[2]), p)
        if grid.rows % n_sp:
            raise ValueError(
                f"{grid.rows} tile rows do not shard over the spatial "
                f"axis ({n_sp} devices)")
        h, w = grid.rows * p, grid.cols * p
        hp = min(stack.shape[1], h + pad)   # real bottom overhang rows
        wp = min(stack.shape[2], w + pad)   # real right overhang cols
        # pad columns only (real overhang where present); rows are
        # extended via halo exchange + last-device bottom injection
        stack_pad_cols = jnp.pad(
            jnp.asarray(stack[:, :h, :wp]),
            ((0, 0), (0, 0), (pad, pad - (wp - w)), (0, 0)))
        bottom = np.zeros(
            (stack.shape[0], pad, w + 2 * pad) + stack.shape[3:],
            stack.dtype)
        if pad and hp > h:
            bottom[:, :hp - h, pad:pad + wp] = stack[:, h:hp, :wp]
        rows_local = grid.rows // n_sp

        spec_in = P(DATA_AXIS, SPATIAL_AXIS, None, None)
        spec_bot = P(DATA_AXIS, None, None, None)
        spec_out = P(DATA_AXIS, SPATIAL_AXIS, None)
        key = (mesh, "scenes", stack.shape[0] // n_dp, rows_local,
               grid.cols, pad)
        fn_jit = self._sharded_cache.get(key)
        if fn_jit is None:
            def body(variables, local, bottom_local):
                # local: (S/n_dp, h/n_sp, w + 2*pad, C)
                ext = exchange_row_halo(local, pad, SPATIAL_AXIS, axis=1)
                if pad:
                    last = jax.lax.axis_index(SPATIAL_AXIS) == n_sp - 1
                    ext = ext.at[:, -pad:].set(
                        jnp.where(last, bottom_local, ext[:, -pad:]))
                return jax.vmap(
                    lambda sc: self._run_scene(
                        variables, sc, rows_local, grid.cols))(ext)

            fn_jit = jax.jit(shard_map(
                body, mesh=mesh, in_specs=(P(), spec_in, spec_bot),
                out_specs=spec_out, check_rep=False))
            self._sharded_cache[key] = fn_jit
        x = jax.device_put(stack_pad_cols, NamedSharding(mesh, spec_in))
        b = jax.device_put(jnp.asarray(bottom),
                           NamedSharding(mesh, spec_bot))
        variables = jax.device_put(self.variables, NamedSharding(mesh, P()))
        return fn_jit(variables, x, b)

    # -- exports ----------------------------------------------------------------
    def export_patches(self, labels: jnp.ndarray, out_dir,
                       start_index: int = 0,
                       keep: "range | set | None" = None) -> list:
        """Per-tile color-mask PNGs named ``{i}.png`` in row-major order —
        the reference's per-patch output contract (`utils.py:161-171`).

        Encoding goes through the native async writer thread when available
        (960 PNG encodes per GID15 scene would otherwise serialize on the
        host; the C++ writer overlaps them with the next scene's forward),
        with PIL fallback.
        """
        from pathlib import Path

        from cvcs_tpu import native

        p = self.cfg.patch_size
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rows, cols = labels.shape[0] // p, labels.shape[1] // p
        rgb = self.palette.decode_u8_host(_labels_to_host(labels))
        paths = []
        use_native = native.load() is not None
        for r in range(rows):
            for c in range(cols):
                i = start_index + r * cols + c
                if keep is not None and i not in keep:
                    # reference `range: [lb, ub]` exports only the selected
                    # global patch indices (`inference.py:30-37`)
                    continue
                tile = rgb[r * p:(r + 1) * p, c * p:(c + 1) * p]
                path = out_dir / f"{i}.png"
                if use_native:
                    native.write_png_async(path, tile)
                else:
                    from PIL import Image

                    Image.fromarray(tile).save(path)
                paths.append(path)
        if use_native:
            failures = native.flush_writes()
            if failures:
                raise IOError(
                    f"{failures} patch PNG writes failed under {out_dir}")
        return paths

    def export_map(self, labels: jnp.ndarray, path, *,
                   queue_native: bool = False) -> bool:
        """Stitched full-scene color map (`inference.py:40-57` `out_image`),
        written once from the on-device canvas — no tile re-reads.

        ``queue_native=True`` hands the PNG encode to the C++ writer
        thread (overlaps device compute even on this box's single core —
        the serve daemon's measured bottleneck is exactly this host
        encode, BASELINE.md serve section) and returns True; the caller
        MUST ``native.flush_writes()`` before relying on the file. Falls
        back to the synchronous PIL write (returns False) when the
        native tier is unavailable."""
        rgb = self.palette.decode_u8_host(_labels_to_host(labels))
        if queue_native:
            from cvcs_tpu import native

            if native.write_png_async(path, rgb):
                return True
        from PIL import Image

        Image.fromarray(rgb).save(path)
        return False

    def _write_figure(self, path, image_tile, pred_rgb_tile, gt_rgb_tile):
        """One 3-panel (image / [ground truth] / prediction) figure — the
        reference's ``mask_only=False`` tile output (`utils.py:161-166`)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = [("patch", image_tile[..., :3].astype(np.uint8))]
        if gt_rgb_tile is not None:
            panels.append(("ground truth", gt_rgb_tile))
        panels.append(("prediction", pred_rgb_tile))
        fig, axes = plt.subplots(1, len(panels),
                                 figsize=(4 * len(panels), 4))
        for ax, (title, img) in zip(np.atleast_1d(axes), panels):
            ax.imshow(img)
            ax.set_title(title)
            ax.axis("off")
        fig.savefig(path, bbox_inches="tight", dpi=80)
        plt.close(fig)

    def export_figures(self, labels: jnp.ndarray, scene, out_dir,
                       gt_mask=None, start_index: int = 0,
                       keep: "range | set | None" = None) -> list:
        """Per-tile 3-panel figures from a full-scene label canvas; ``keep``
        filters to the reference's ``range`` global patch indices."""
        from pathlib import Path

        p = self.cfg.patch_size
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rows, cols = labels.shape[0] // p, labels.shape[1] // p
        pred_rgb = self.palette.decode_u8_host(_labels_to_host(labels))
        gt_rgb = (None if gt_mask is None
                  else self.palette.decode_u8_host(_labels_to_host(gt_mask)))
        scene = np.asarray(scene)
        paths = []
        for r in range(rows):
            for c in range(cols):
                i = start_index + r * cols + c
                if keep is not None and i not in keep:
                    continue
                sl = (slice(r * p, (r + 1) * p), slice(c * p, (c + 1) * p))
                path = out_dir / f"{i}.png"
                self._write_figure(
                    path, scene[sl],
                    pred_rgb[sl], None if gt_rgb is None else gt_rgb[sl])
                paths.append(path)
        return paths

    # -- per-tile exports for the selected-tiles path ---------------------------
    def export_tile_patches(self, tiles: jnp.ndarray, global_ids,
                            out_dir) -> list:
        """Color-mask PNGs for :meth:`predict_tiles` output: ``tiles`` is
        (N, p, p) labels, ``global_ids`` the reference global patch indices
        naming the files (`utils.py:168-171`)."""
        from pathlib import Path

        from PIL import Image

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rgb = self.palette.decode_u8_host(_labels_to_host(tiles))
        paths = []
        for k, i in enumerate(global_ids):
            path = out_dir / f"{i}.png"
            Image.fromarray(rgb[k]).save(path)
            paths.append(path)
        return paths

    def export_tile_figures(self, tiles: jnp.ndarray, global_ids, local_ids,
                            scene, cols: int, out_dir, gt_mask=None) -> list:
        """3-panel figures for :meth:`predict_tiles` output; tile crops of
        ``scene``/``gt_mask`` are taken from the local row-major ids."""
        from pathlib import Path

        p = self.cfg.patch_size
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        pred_rgb = self.palette.decode_u8_host(_labels_to_host(tiles))
        scene = np.asarray(scene)
        gt_rgb = (None if gt_mask is None
                  else self.palette.decode_u8_host(_labels_to_host(gt_mask)))
        paths = []
        for k, (gi, li) in enumerate(zip(global_ids, local_ids)):
            r, c = divmod(int(li), cols)
            sl = (slice(r * p, (r + 1) * p), slice(c * p, (c + 1) * p))
            path = out_dir / f"{gi}.png"
            self._write_figure(
                path, scene[sl],
                pred_rgb[k], None if gt_rgb is None else gt_rgb[sl])
            paths.append(path)
        return paths
