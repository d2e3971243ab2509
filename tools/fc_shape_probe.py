"""Probe: is the fullconv band forward faster as ONE batch-1 wide tensor
or as a BATCH of column chunks with the same total pixels?

Measures marginal-rate forward time of Unetv2 (bf16) on:
  (1, 1376, 7232, 3)   — the bands-6 GID15 band (one full-width conv)
  (4, 1376, 1856, 3)   — 4 column chunks (+32px halo each, ~2.6% extra px)
  (8, 1376,  928, 3)   — 8 chunks (...)
  (16, 704, 928, 3)x2  — 32 squarer chunks via half-height bands
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from cvcs_tpu.models import build_model

    model, spec = build_model("Unetv2", 16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 224, 224, 3), jnp.float32), train=False)

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x.astype(jnp.float32), train=False)
        return jnp.sum(jnp.argmax(out, axis=-1).astype(jnp.uint8))

    rng = np.random.default_rng(0)
    shapes = [(1, 1376, 7232, 3), (4, 1376, 1856, 3), (8, 1376, 928, 3),
              (32, 704, 928, 3)]
    for shp in shapes:
        x = jnp.asarray(rng.integers(0, 256, shp, np.uint8))
        jax.device_get(fwd(variables, x))   # compile+warm

        def timed(n):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = fwd(variables, x)
            jax.device_get(out)
            return time.time() - t0

        t1 = timed(1)
        tn = timed(4)
        ms = (tn - t1) / 3 * 1000
        px = shp[0] * shp[1] * shp[2]
        print(f"shape {shp}: {ms:8.1f} ms  ({1e6 * ms / px:.3f} ns/px)",
              flush=True)


if __name__ == "__main__":
    main()
