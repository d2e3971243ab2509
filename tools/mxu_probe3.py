"""Probe 3: does the NCHW win on the isolated level-1 conv survive a
real training block (fwd + bwd + BN batch stats + ReLU fusion), and does
it hold (or at least not lose) at the deeper levels' shapes?

mxu_probe2.py measured NCHW 1.48x faster than NHWC on the isolated
bs128/224^2/c64 forward conv (2.18 vs 3.23 ms). The tunnel adds
run-to-run variance at this program size, so every comparison here is
A/B INTERLEAVED in one session (5 alternating trials, medians) — and the
unit under test is a 2x(conv+BN+ReLU) block with a gradient, i.e. the
shape of work the flagship step actually does at level 1.

Run on the real chip:  python tools/mxu_probe3.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")


def measure(fn, *args, reps=4):
    """One marginal-rate estimate (sec/call); caller interleaves."""
    def timed(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.device_get(out)
        return time.time() - t0

    t1 = timed(1)
    tn = timed(1 + reps)
    return (tn - t1) / reps


def block_fn(layout):
    """2x(conv3x3 + batch-stat BN + ReLU) level-1 block, loss + grads."""
    caxis = 3 if layout == "NHWC" else 1
    dn = (layout, "HWIO", layout)
    red = tuple(i for i in range(4) if i != caxis)
    bshape = [1, 1, 1, 1]

    def block(params, x):
        h = x
        for w, g, b in params:
            h = lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, axis=red)
            var = jnp.mean(jnp.square(hf), axis=red) - jnp.square(mean)
            shape = list(bshape)
            shape[caxis] = h.shape[caxis]
            h = (hf - mean.reshape(shape)) * (
                g.reshape(shape) * lax.rsqrt(var.reshape(shape) + 1e-5)
            ) + b.reshape(shape)
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        return jnp.mean(h.astype(jnp.float32) ** 2)

    @jax.jit
    def step(params, x):
        loss, grads = jax.value_and_grad(block)(params, x)
        return loss, jax.tree.map(jnp.sum, grads)

    return step


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    b, hw, c = 128, 224, 64

    cases = {}
    for layout in ("NHWC", "NCHW"):
        shape = (b, hw, hw, c) if layout == "NHWC" else (b, c, hw, hw)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        params = [
            (jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)),
                         jnp.bfloat16),
             jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
            for _ in range(2)]
        step = block_fn(layout)
        jax.device_get(step(params, x))   # compile + warm
        cases[layout] = (step, params, x)

    results = {k: [] for k in cases}
    for trial in range(5):   # interleaved A/B
        for k, (step, params, x) in cases.items():
            results[k].append(measure(step, params, x))
    for k, v in results.items():
        ms = [f"{t * 1e3:.1f}" for t in v]
        print(f"level-1 train block {k}: median {np.median(v) * 1e3:7.2f} ms"
              f"   trials {ms}", flush=True)

    # deeper-level forward convs, interleaved NHWC vs NCHW
    for (hw2, c2) in [(112, 128), (56, 256)]:
        fns = {}
        for layout in ("NHWC", "NCHW"):
            shape = ((b, hw2, hw2, c2) if layout == "NHWC"
                     else (b, c2, hw2, hw2))
            x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
            w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c2, c2)),
                            jnp.bfloat16)
            dn = (layout, "HWIO", layout)

            @jax.jit
            def conv(x, w, dn=dn):
                y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
                return jnp.sum(y.astype(jnp.float32))

            jax.device_get(conv(x, w))
            fns[layout] = (conv, x, w)
        results = {k: [] for k in fns}
        for trial in range(5):
            for k, (conv, x, w) in fns.items():
                results[k].append(measure(conv, x, w))
        for k, v in results.items():
            print(f"conv {hw2}^2 c{c2} {k}: median "
                  f"{np.median(v) * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
