"""Level-1 conv headroom probes (round 3).

BASELINE.md's round-3 attribution closed ROADMAP item 1 with "the train
step is conv-emitter-bound at ~59% MFU; the remaining headroom would
require beating XLA's conv emitters". This script turns that sentence
into numbers, so a Pallas-direct-conv attempt is a measured decision and
not a guess. Three questions, each one program on the real chip:

  A. ISOLATED EMITTER RATE — what TFLOP/s does XLA's conv emitter reach
     on the exact level-1 shape that dominates the flagship step
     (bs 128, 224x224, 64->64ch 3x3, bf16), outside the fusion context?
     Contrast with the level-2 shape (112x112, 128ch) whose channel
     width fills the MXU lane dim.
  B. LANE-WIDTH TAX — an N=64 matmul leaves half the 128-lane MXU
     columns idle in the naive orientation. Measure dot rates at
     identical FLOPs for (M,576)x(576,64), (M/2,576)x(576,128), and the
     transposed orientation (64,576)x(576,Mpx) that puts PIXELS in the
     lane dim. If the transposed orientation recovers the N=128 rate,
     a restructured conv kernel has real headroom; if XLA's conv in A
     already matches the best dot rate, there is none.
  C. PURE-XLA WINOGRAD F(2x2,3x3) — 2.25x fewer MACs than direct, but
     the transform-domain tensors are 4x the activation size; unfused
     (XLA-level) that is HBM traffic. Measured to close the question
     (expected slower; only a fused-VMEM Pallas kernel could hide it).

Timing protocol: honest-measurement house rules (CLAUDE.md) — warm
program, chained dispatches, device_get of a small reduction to sync,
median of 3 marginal rates.

Run on the real chip:  python tools/mxu_probe.py
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

PEAK_TFLOPS = 197.0  # v5e bf16


def rate(fn, *args, reps=4):
    """Median-of-3 marginal-rate seconds per call of fn(*args)."""
    jax.device_get(fn(*args))  # compile + warm (real sync)

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
    print(f"{name:44s} {secs * 1e3:8.2f} ms  {tf:7.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:5.1f}% peak)", flush=True)
    return tf


DN = ("NHWC", "HWIO", "NHWC")


def probe_a():
    print("== A: isolated conv emitter rate ==", flush=True)
    rng = np.random.default_rng(0)
    for (b, hw, c) in [(128, 224, 64), (128, 112, 128), (128, 56, 256)]:
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)),
                        jnp.bfloat16)

        @jax.jit
        def conv(x, w):
            y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=DN)
            return jnp.sum(y.astype(jnp.float32))

        flops = 2 * b * hw * hw * 9 * c * c
        report(f"conv {b}x{hw}^2 c{c} 3x3", rate(conv, x, w), flops)


def probe_b():
    print("== B: MXU lane-width tax (dot orientations) ==", flush=True)
    rng = np.random.default_rng(1)
    k = 576
    m = 1 << 20
    cases = [
        ("dot (1M,576)x(576,64)   N=64 ", (m, k), (k, 64)),
        ("dot (512k,576)x(576,128) N=128", (m // 2, k), (k, 128)),
        ("dot (64,576)x(576,1M)  px-in-N", (64, k), (k, m)),
    ]
    for name, sa, sb in cases:
        a = jnp.asarray(rng.standard_normal(sa), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(sb), jnp.bfloat16)

        @jax.jit
        def dot(a, b):
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return jnp.sum(y)

        flops = 2 * sa[0] * sa[1] * sb[1]
        report(name, rate(dot, a, b), flops)


# Winograd F(2x2, 3x3) transform matrices (f32 transforms, bf16 matmuls).
BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
              np.float32)
G = np.array([[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd(x, w):
    """F(2x2,3x3) SAME conv via 16 transform-domain matmuls (pure XLA)."""
    b, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ht, wt = h // 2, wd // 2
    # (4, 4, B, ht, wt, C) overlapping 4x4 tiles at stride 2
    tiles = jnp.stack([
        jnp.stack([xp[:, di:di + 2 * ht:2, dj:dj + 2 * wt:2, :]
                   for dj in range(4)]) for di in range(4)])
    v = jnp.einsum("ai,bj,ijBhwc->abBhwc", BT, BT, tiles)
    u = jnp.einsum("ai,bj,ijco->abco", G, G, w.astype(jnp.float32))
    m = jnp.einsum("abBhwc,abco->abBhwo", v.astype(jnp.bfloat16),
                   u.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("ia,jb,abBhwo->Bhiwjo", AT, AT, m)
    return y.reshape(b, h, wd, o)


def probe_c():
    print("== C: pure-XLA Winograd F(2x2,3x3) vs direct ==", flush=True)
    rng = np.random.default_rng(2)
    b, hw, c = 128, 224, 64
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)

    @jax.jit
    def direct(x, w):
        return lax.conv_general_dilated(x.astype(jnp.float32),
                                        w.astype(jnp.float32), (1, 1),
                                        "SAME", dimension_numbers=DN)

    @jax.jit
    def wino_sum(x, w):
        return jnp.sum(winograd(x, w))

    # numerics check first (f32 direct as truth; bf16 matmul error expected)
    ref = jax.device_get(direct(x, w))
    got = jax.device_get(jax.jit(winograd)(x, w))
    err = np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"winograd rel max err vs f32 direct: {err:.2e}", flush=True)

    flops = 2 * b * hw * hw * 9 * c * c  # effective (direct-conv) FLOPs
    report("winograd 128x224^2 c64 (effective)", rate(wino_sum, x, w),
           flops)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    probe_a()
    probe_b()
    probe_c()
