"""Compile the flagship train step for the REAL TPU backend and dump the
compiled (post-fusion) HLO text, so trace fusion names (convert_reduce_fusion.N,
multiply_subtract_fusion.N, fusion.N) can be attributed to their contents
(conv vs BN-stats vs loss) and shapes.

Usage: python tools/dump_train_hlo.py [out.txt] [bs] [model]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_step_hlo.txt"
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 128
MODEL = sys.argv[3] if len(sys.argv) > 3 else "Unetv2"
K = 4
PATCH = 224
UPDATE_STATS = os.environ.get("UPDATE_STATS", "1") != "0"


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_multi_train_step

    model, spec = build_model(MODEL, 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    multi_step = make_multi_train_step(build_loss("CEL"),
                                       update_stats=UPDATE_STATS)
    images = jnp.zeros((K, BS, PATCH, PATCH, 3), jnp.uint8)
    masks = jnp.zeros((K, BS, PATCH, PATCH), jnp.int32)
    ctx = jnp.zeros((K, 1), jnp.uint8)
    compiled = multi_step.lower(state, images, masks, ctx,
                                jnp.float32(6e-3),
                                jax.random.key(0)).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {OUT}")


if __name__ == "__main__":
    main()
