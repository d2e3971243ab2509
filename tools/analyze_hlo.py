"""Dump the compiled HLO of the flagship multi-step train program and
summarize the named fusions the profiler flagged (shapes + op kinds), plus
XLA's cost analysis."""

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = 4
PATCH = 224
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "fusion.903", "fusion.910", "multiply_subtract_fusion.208",
    "multiply_subtract_fusion.220", "fusion.897",
    "convert_reduce_fusion.75", "convert_reduce_fusion.58",
    "select_and_scatter.59", "reverse.31", "fusion.938",
]


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_multi_train_step

    model, spec = build_model("Unetv2", 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    multi_step = make_multi_train_step(build_loss("CEL"),
                                       update_stats=False)
    images = jnp.zeros((K, BS, PATCH, PATCH, 3), jnp.uint8)
    masks = jnp.zeros((K, BS, PATCH, PATCH), jnp.int32)
    ctx = jnp.zeros((K, 1), jnp.uint8)
    lowered = multi_step.lower(state, images, masks, ctx,
                               jnp.float32(6e-3), jax.random.key(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/multistep_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars -> /tmp/multistep_hlo.txt")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    if ca:
        flops = ca.get("flops", 0)
        print(f"cost_analysis flops={flops:.3e} "
              f"bytes accessed={ca.get('bytes accessed', 0):.3e}")
        # per-step (K steps inside)
        print(f"per-step flops={flops / K:.3e}")

    lines = txt.splitlines()
    for name in NAMES:
        # find the computation the fusion calls and its root ops
        pat = re.compile(rf"%{re.escape(name)} = ")
        for i, l in enumerate(lines):
            if pat.search(l):
                print(f"\n=== {name} ===")
                print(l.strip()[:500])
                m = re.search(r"calls=(%?[\w.\-]+)", l)
                if m:
                    comp = m.group(1).lstrip("%")
                    # print the computation body's interesting ops
                    in_comp = False
                    shown = 0
                    for l2 in lines:
                        if re.match(rf"%?{re.escape(comp)}\b", l2.strip()) \
                           and "{" in l2:
                            in_comp = True
                            continue
                        if in_comp:
                            s = l2.strip()
                            if s.startswith("}"):
                                break
                            if any(k in s for k in (
                                    "convolution", "dot(", "reduce(",
                                    "reduce-window", "scatter", "transpose",
                                    "broadcast", "multiply", "subtract",
                                    "convert", "exponential", "divide")):
                                if shown < 14:
                                    print("   ", s[:220])
                                shown += 1
                    if shown >= 14:
                        print(f"    ... ({shown} matching ops)")
                break


if __name__ == "__main__":
    main()
