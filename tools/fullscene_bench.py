"""Run a full GID15-scale scene (6800x7200, `dataset.py:61`) through the
inference engine on the real TPU chip: sustained tiles/s + HBM high-water.

Usage: python tools/fullscene_bench.py [H W] [patch] [bc] [batch_tiles]
(env MODEL=Unetv2 selects the net). Prints one RESULT line with sustained
throughput and device memory stats.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

H = int(sys.argv[1]) if len(sys.argv) > 1 else 6800
W = int(sys.argv[2]) if len(sys.argv) > 2 else 7200
PATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 224
BC = int(sys.argv[4]) if len(sys.argv) > 4 else 256
BT = int(sys.argv[5]) if len(sys.argv) > 5 else 64   # production default
MODEL = os.environ.get("MODEL", "Unetv2")
# MODE=fullconv benches the seamless banded full-convolution path
# (env FC_BANDS=8 tile-rows per band) instead of the window path
MODE = os.environ.get("MODE", "windows")
FC_BANDS = int(os.environ.get("FC_BANDS", "8"))
# FC_COLS=k batches each band as k-tile-wide column chunks (0 = full band);
# FC_ROWS=r makes the chunks r tile-rows tall (default: band-tall)
FC_COLS = int(os.environ.get("FC_COLS", "0")) or None
FC_ROWS = int(os.environ.get("FC_ROWS", "0")) or None


def device_mem() -> dict:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {k: stats.get(k) for k in
                ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in stats}
    except Exception as e:  # tunnel backends may not expose stats
        return {"error": str(e)}


def main():
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
    from cvcs_tpu.models import build_model

    model, spec = build_model(MODEL, 16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, BC, BC, 3), jnp.float32), train=False)
    seg = SceneSegmenter(
        model.apply, variables,
        InferenceConfig(patch_size=PATCH, border_correction=BC,
                        batch_tiles=BT, num_classes=16),
        returns_logits=spec.returns_logits)

    rng = np.random.default_rng(0)
    scene = rng.integers(0, 256, (H, W, 3), np.uint8)
    rows, cols = H // PATCH, W // PATCH
    n_tiles = rows * cols
    print(f"{MODEL}: scene {H}x{W} -> {rows}x{cols} = {n_tiles} tiles "
          f"@p{PATCH}/bc{BC}, batch_tiles {BT}", flush=True)

    if MODE == "fullconv":
        # same protocol as the window leg below: scene device-resident,
        # marginal-rate over chained reps, labels stay on device (the
        # export download is the window leg's separately-measured 2.7 s)
        t_up = time.time()
        padded, prows, pcols, halo = seg.pad_scene_fullconv(scene)
        jax.device_get(jnp.sum(padded[0, 0]))
        print(f"upload+pad: {time.time() - t_up:.1f}s", flush=True)

        def run():
            return seg.predict_padded_fullconv(padded, prows, pcols, halo,
                                               band_rows=FC_BANDS,
                                               col_tiles=FC_COLS,
                                               row_tiles=FC_ROWS)

        t0 = time.time()
        lab = run()
        jax.device_get(jnp.sum(lab))
        print(f"first (compile+run): {time.time() - t0:.1f}s  "
              f"mem: {device_mem()}", flush=True)

        def timed(n):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = jnp.sum(run())
            jax.device_get(out)
            return time.time() - t0

        t1 = timed(1)
        reps = 3
        tn = timed(1 + reps)
        t_each = (tn - t1) / reps
        sustained = n_tiles / t_each
        t512 = sustained / (512 * 512 / PATCH / PATCH)
        mem = device_mem()
        peak_gb = (mem.get("peak_bytes_in_use") or 0) / 2**30
        print(f"RESULT {MODEL} fullconv {H}x{W} p{PATCH} halo{halo} "
              f"bands{FC_BANDS} cols{FC_COLS} rows{FC_ROWS}: sustained "
              f"{sustained:.1f} tiles/s "
              f"({t512:.1f} tiles512/s), one-scene wall {t_each:.2f}s, "
              f"peak HBM {peak_gb:.2f} GiB", flush=True)
        assert lab.shape == (rows * PATCH, cols * PATCH), lab.shape
        return

    t_up = time.time()
    scene_pad, prows, pcols = seg.pad_scene(scene)
    jax.device_get(jnp.sum(scene_pad[0, 0]))
    t_up = time.time() - t_up
    print(f"upload+pad: {t_up:.1f}s  mem after upload: {device_mem()}",
          flush=True)

    t0 = time.time()
    labels = seg.predict_padded(scene_pad, prows, pcols)
    jax.device_get(jnp.sum(labels))
    t_first = time.time() - t0
    print(f"first (compile+run): {t_first:.1f}s  mem: {device_mem()}",
          flush=True)

    def timed(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = jnp.sum(seg.predict_padded(scene_pad, prows, pcols))
        jax.device_get(out)
        return time.time() - t0

    t1 = timed(1)
    reps = 3
    tn = timed(1 + reps)
    sustained = n_tiles * reps / max(tn - t1, 1e-9)
    t512 = sustained / (512 * 512 / PATCH / PATCH)

    # full pipeline including export-side label canvas to host (uint8 cast
    # on device, as the export paths do)
    t0 = time.time()
    lab_host = np.asarray(
        seg.predict_padded(scene_pad, prows, pcols).astype(jnp.uint8))
    t_host = time.time() - t0

    mem = device_mem()
    peak_gb = (mem.get("peak_bytes_in_use") or 0) / 2**30
    print(f"RESULT {MODEL} fullscene {H}x{W} p{PATCH} bc{BC}: sustained "
          f"{sustained:.1f} tiles/s ({t512:.1f} tiles512/s), one-scene "
          f"wall {(tn - t1) / reps:.2f}s, labels-to-host {t_host:.2f}s, "
          f"peak HBM {peak_gb:.2f} GiB, mem={mem}", flush=True)
    assert lab_host.shape == (rows * PATCH, cols * PATCH), lab_host.shape


if __name__ == "__main__":
    main()
