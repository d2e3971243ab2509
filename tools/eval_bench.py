"""Evaluation-path throughput on the real chip: forward + argmax +
on-device confusion accumulation (`utils.eval_model`, `utils.py:59-103`).

Usage: python tools/eval_bench.py [bs] [model] [patch]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
MODEL = sys.argv[2] if len(sys.argv) > 2 else "Unetv2"
PATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 224


def main():
    from cvcs_tpu.metrics import confusion
    from cvcs_tpu.models import build_model
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_predict_step

    model, spec = build_model(MODEL, 16)
    state = create_train_state(
        model, build_optimizer("SGD2"),
        jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    predict = make_predict_step(spec.returns_logits)

    @jax.jit
    def eval_batch(state, conf, image, mask):
        pred = predict(state, image, jnp.zeros((), jnp.uint8))
        return confusion.update_confusion(conf, pred, mask, num_classes=16)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, (BS, PATCH, PATCH, 3), np.uint8))
    mask = jnp.asarray(rng.integers(0, 16, (BS, PATCH, PATCH), np.int32))
    conf = confusion.confusion_matrix(16)
    conf = eval_batch(state, conf, image, mask)
    jax.device_get(jnp.sum(conf))

    def timed(n):
        nonlocal conf
        t0 = time.time()
        for _ in range(n):
            conf = eval_batch(state, conf, image, mask)
        jax.device_get(jnp.sum(conf))
        return time.time() - t0

    reps = 10
    t1 = timed(1)
    tn = timed(1 + reps)
    tiles = BS * reps / max(tn - t1, 1e-9) / (512 * 512 / PATCH / PATCH)
    print(f"RESULT eval {MODEL} bs{BS} p{PATCH}: "
          f"{(tn - t1) / reps / BS * 1000:.3f} ms/tile  "
          f"{tiles:.1f} tiles512/s (forward+argmax+confusion)", flush=True)


if __name__ == "__main__":
    main()
