"""Follow-up probes: can a batch-in-lanes layout lift the level-1 conv
off its C=64 lane ceiling?

mxu_probe.py measured the isolated level-1 conv (bs 128, 224^2, 64ch) at
~63% of scale while the level-2 shape (128ch) hits ~91% — consistent
with C_out=64 filling only half the MXU's 128-wide lane dim in NHWC.
The one reformulation that fixes the lane math WITHOUT changing the
model is batch-minor layout: out[c_out, px, b] = W[c_out, taps] @
patches[taps, b] puts K=9*64=576 and N=batch=128 — both full — at every
level, regardless of channel width. XLA accepts arbitrary conv
dimension_numbers, so this is one dim-spec away IF its TPU emitter
honors the layout instead of canonicalizing back.

Also: a timing-calibration leg (the first probe's sub-ms dots measured
above HBM bandwidth — quantify the marginal-rate inflation at small
program sizes with reps 4 vs 16), and the Winograd number at bs 32
(bs 128 OOMed on transform-domain padding) for the record.

Run on the real chip:  python tools/mxu_probe2.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

PEAK_TFLOPS = 197.0


def rate(fn, *args, reps=4):
    jax.device_get(fn(*args))

    def timed(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.device_get(out)
        return time.time() - t0

    est = []
    for _ in range(3):
        t1 = timed(1)
        tn = timed(1 + reps)
        est.append((tn - t1) / reps)
    return float(np.median(est))


def report(name, secs, flops):
    tf = flops / secs / 1e12
    print(f"{name:46s} {secs * 1e3:8.2f} ms  {tf:7.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:5.1f}% peak)", flush=True)
    return tf


def probe_layouts():
    print("== conv layouts at the level-1 shape (bs128 224^2 c64) ==",
          flush=True)
    rng = np.random.default_rng(0)
    b, hw, c = 128, 224, 64
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)
    flops = 2 * b * hw * hw * 9 * c * c
    x_nhwc = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)

    for lhs_spec, shape in [("NHWC", (b, hw, hw, c)),
                            ("CHWN", (c, hw, hw, b)),
                            ("NCHW", (b, c, hw, hw)),
                            ("HWCN", (hw, hw, c, b))]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        dn = (lhs_spec, "HWIO", lhs_spec)

        @jax.jit
        def conv(x, w, dn=dn):
            y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return jnp.sum(y.astype(jnp.float32))

        report(f"conv {lhs_spec} c64", rate(conv, x, w), flops)

    # level-2 CHWN for the same contrast the first probe drew in NHWC
    c2, hw2 = 128, 112
    w2 = jnp.asarray(0.05 * rng.standard_normal((3, 3, c2, c2)),
                     jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((c2, hw2, hw2, b)), jnp.bfloat16)

    @jax.jit
    def conv2(x, w):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("CHWN", "HWIO",
                                                        "CHWN"))
        return jnp.sum(y.astype(jnp.float32))

    report("conv CHWN c128 (level-2)", rate(conv2, x2, w2),
           2 * b * hw2 * hw2 * 9 * c2 * c2)


def probe_calibration():
    print("== timing calibration (marginal-rate inflation) ==", flush=True)
    rng = np.random.default_rng(1)
    m, k = 1 << 19, 576
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, 128)), jnp.bfloat16)

    @jax.jit
    def dot(a, b):
        return jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.float32))

    flops = 2 * m * k * 128
    report("dot N=128, reps=4 ", rate(dot, a, b, reps=4), flops)
    report("dot N=128, reps=16", rate(dot, a, b, reps=16), flops)
    # pure-bandwidth op: 590MB read + 590MB write; ceiling 819 GB/s
    big = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

    @jax.jit
    def scale(x):
        y = x * jnp.bfloat16(1.0001)
        return y, jnp.sum(y[:8, :8].astype(jnp.float32))

    def scale_sum(x):
        return scale(x)[1]

    nbytes = 2 * m * k * 2
    s = rate(scale_sum, big, reps=16)
    print(f"{'bf16 scale (1.2GB traffic), reps=16':46s} {s * 1e3:8.2f} ms  "
          f"{nbytes / s / 1e9:7.1f} GB/s (ceiling 819)", flush=True)


def probe_winograd_small():
    print("== pure-XLA winograd at bs32 (bs128 OOMed) ==", flush=True)
    from mxu_probe import winograd

    rng = np.random.default_rng(2)
    b, hw, c = 32, 224, 64
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)

    @jax.jit
    def wino_sum(x, w):
        return jnp.sum(winograd(x, w))

    @jax.jit
    def direct(x, w):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    flops = 2 * b * hw * hw * 9 * c * c
    report("direct  bs32 c64", rate(direct, x, w), flops)
    report("winograd bs32 c64 (effective)", rate(wino_sum, x, w), flops)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    probe_layouts()
    probe_calibration()
    probe_winograd_small()
