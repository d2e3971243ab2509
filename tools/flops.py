"""Print XLA's flop estimate for a model's multi-train-step program
(compiled on the CPU backend — flop counts are backend-independent), plus
MFU at a given measured step time.

Usage: python tools/flops.py <model> <bs> [step_ms] [patch]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

MODEL = sys.argv[1] if len(sys.argv) > 1 else "Unetv2"
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 128
STEP_MS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
PATCH = int(sys.argv[4]) if len(sys.argv) > 4 else 224
V5E_PEAK = 197e12  # bf16 FLOP/s, TPU v5e


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import _train_step_impl

    model, spec = build_model(MODEL, 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    step = _train_step_impl(build_loss("CEL"), update_stats=False)
    lowered = jax.jit(step).lower(
        state, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8),
        jnp.zeros((BS, PATCH, PATCH), jnp.int32), jnp.zeros((1,), jnp.uint8),
        jnp.float32(6e-3), jax.random.key(0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    print(f"{MODEL} bs{BS} p{PATCH}: {flops / 1e12:.3f} TFLOP/step "
          f"({flops / BS / 1e9:.1f} GFLOP/tile)")
    if STEP_MS:
        mfu = flops / (STEP_MS / 1e3) / V5E_PEAK
        print(f"at {STEP_MS} ms/step: {flops / (STEP_MS / 1e3) / 1e12:.1f} "
              f"TFLOP/s = {100 * mfu:.1f}% MFU (v5e bf16 peak 197T)")


if __name__ == "__main__":
    main()
