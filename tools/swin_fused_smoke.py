"""On-chip smoke + A/B for the fused window-attention kernel.

Usage: python tools/swin_fused_smoke.py [stage]
  stage "smoke": tiny-shape compile + value check vs einsum path.
  stage "ab":    SwinUnet forward A/B at real shapes (bs 32 @224).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cvcs_tpu.models.swin import SwinUNet  # noqa: E402


def sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    print("backend:", jax.default_backend(), flush=True)
    if stage == "smoke":
        # SwinUnetTiny geometry at 224: the REAL window regimes
        # (56/8, 32pad/8, 16pad/8, 7/7) with small dims for fast compile
        kw = dict(num_classes=5, dims=(32, 64, 128, 256),
                  depths=(1, 1, 2, 1), heads=(1, 2, 4, 8), window=8)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 224, 224, 4))
        plain = SwinUNet(fused_attn=False, **kw)
        fused = SwinUNet(fused_attn=True, **kw)
        variables = plain.init(jax.random.PRNGKey(0), x)
        t0 = time.time()
        y_p = np.asarray(jax.jit(plain.apply)(variables, x))
        print(f"einsum compiled+ran in {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        y_f = np.asarray(jax.jit(fused.apply)(variables, x))
        print(f"fused  compiled+ran in {time.time()-t0:.1f}s", flush=True)
        scale = max(1.0, float(np.abs(y_p).max()))
        err = float(np.abs(y_f - y_p).max()) / scale
        print(f"rel max err: {err:.5f}")
        assert err < 5e-2, err
        print("SMOKE OK", flush=True)
        return

    # A/B at real shapes: bs 32, 224x224, 4 bands (the measured config)
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    x = jax.random.normal(jax.random.PRNGKey(1), (bs, 224, 224, 4),
                          jnp.bfloat16)
    results = {}
    for name, flag in (("einsum", False), ("fused", True)):
        model = SwinUNet(num_classes=16, fused_attn=flag)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        fwd = jax.jit(lambda v, xx: model.apply(v, xx))
        t0 = time.time()
        y = fwd(variables, x)
        sync(y)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        # marginal-rate timing: chain k calls, sync once
        for reps in (4, 12):
            t0 = time.time()
            y = x
            out = None
            for i in range(reps):
                out = fwd(variables, x + i * 0)  # same shapes, warm program
            sync(out)
            results[(name, reps)] = time.time() - t0
        d = (results[(name, 12)] - results[(name, 4)]) / 8
        print(f"{name}: {d*1000:.2f} ms/fwd (marginal, bs {bs}) "
              f"= {bs/d:.1f} tiles224/s = {bs/d/5.224:.1f} tiles512/s",
              flush=True)


if __name__ == "__main__":
    main()
