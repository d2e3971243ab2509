"""Bench the ensemble WHOLE-SCENE predict path on the real chip: the
reference's published ensemble-inference workflow (`utils.py:472-507` —
it votes per patch on the CPU) as this framework ships it from the
predict CLI — all member forwards + the on-device majority vote in one
jitted program over a full GID15 scene (6800x7200, 960 tiles @p224).

Members are the BASELINE ensemble-eval trio (Unetv2 + Unet + MobileNet)
with random-init weights written as real Orbax checkpoints, so the run
goes through the exact CLI construction path (`common.build_apply` with
``net: Ensemble`` -> traced member weights, `cli/common.py:107-148`).

Usage: python tools/ensemble_scene_bench.py [H W] [patch] [bc] [bt]
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, "/root/repo")

H = int(sys.argv[1]) if len(sys.argv) > 1 else 6800
W = int(sys.argv[2]) if len(sys.argv) > 2 else 7200
PATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 224
BC = int(sys.argv[4]) if len(sys.argv) > 4 else 256
BT = int(sys.argv[5]) if len(sys.argv) > 5 else 64
MEMBERS = ("Unetv2", "Unet", "MobileNet")


def main():
    from cvcs_tpu.cli import common
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
    from cvcs_tpu.models import build_model
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train import checkpoint as ckpt_lib

    tmp = tempfile.mkdtemp(prefix="ens_bench_")
    members_cfg = {}
    for name in MEMBERS:
        model, _ = build_model(name, 16, dtype=jnp.float32)
        state = create_train_state(
            model, build_optimizer("SGD2"),
            jnp.zeros((1, PATCH, PATCH, 3), jnp.uint8))
        ckpt = ckpt_lib.save_checkpoint(
            os.path.join(tmp, name), 0, state, [], [], 1, "SGD2")
        members_cfg[name] = str(ckpt)
    ens_yaml = os.path.join(tmp, "ensemble.yaml")
    with open(ens_yaml, "w") as f:
        yaml.safe_dump(members_cfg, f)

    cfg = dict(net="Ensemble", ensemble_config=ens_yaml, num_classes=15,
               precision="bf16")
    (apply_fn, variables, num_classes,
     returns_logits, requires_context, _) = common.build_apply(cfg, PATCH)
    seg = SceneSegmenter(
        apply_fn, variables,
        InferenceConfig(patch_size=PATCH, border_correction=BC,
                        batch_tiles=BT, num_classes=num_classes),
        returns_logits=returns_logits,
        requires_context=requires_context)

    rng = np.random.default_rng(0)
    scene = rng.integers(0, 256, (H, W, 3), np.uint8)
    rows, cols = H // PATCH, W // PATCH
    n_tiles = rows * cols
    print(f"Ensemble({'+'.join(MEMBERS)}): scene {H}x{W} -> {n_tiles} "
          f"tiles @p{PATCH}/bc{BC}, batch_tiles {BT}", flush=True)

    t_up = time.time()
    scene_pad, prows, pcols = seg.pad_scene(scene)
    jax.device_get(jnp.sum(scene_pad[0, 0]))
    print(f"upload+pad: {time.time() - t_up:.1f}s", flush=True)

    t0 = time.time()
    labels = seg.predict_padded(scene_pad, prows, pcols)
    jax.device_get(jnp.sum(labels))
    print(f"first (compile+run): {time.time() - t0:.1f}s", flush=True)

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
    t_each = (tn - t1) / reps
    sustained = n_tiles / t_each
    t512 = sustained / (512 * 512 / PATCH / PATCH)
    print(f"RESULT ensemble3 {H}x{W} p{PATCH} bc{BC} bt{BT}: sustained "
          f"{sustained:.1f} tiles/s ({t512:.1f} tiles512/s), one-scene "
          f"wall {t_each:.2f}s", flush=True)


if __name__ == "__main__":
    main()
