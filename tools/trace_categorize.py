"""Categorize a jax.profiler trace by op kind (copy / LayerNorm-pattern /
conv / matmul-fusion / ...) — the round-4 SwinUnet audit's first probe.

Where `tools/profile_train.py`'s top-op table answers "is there one
mis-costed fusion?" (the SegFormer MixFFN case), this grouping answers
the follow-up when the tail is flat: WHAT KIND of work dominates. For
SwinUnet (base) it attributed 17% of device time to explicit copies and
18% to LayerNorm-pattern fusions with convs at only 10% — pointing at
the transformer encoder's data movement, not the decoder (BASELINE.md
round-4 Swin pass).

Usage: python tools/trace_categorize.py [trace_dir] [steps]
(defaults: /tmp/tb_trace_r3 — profile_train.py's output dir — and 4)
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tb_trace_r3"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

# enclosing aggregates double-count their leaves; drop them
_PREFIXES = (
    "convolution", "conv", "multiply_subtract", "convert_reduce",
    "reverse", "transpose", "copy", "dot", "reduce", "fusion", "dynamic",
    "select", "scatter", "rsqrt", "add", "broadcast", "iota", "bitcast",
)


def categorize(name: str) -> str:
    for p in _PREFIXES:
        if name.startswith(p):
            return p
    return "other:" + name.split(".")[0]


def main() -> None:
    traces = sorted(Path(TRACE_DIR).rglob("*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        raise SystemExit(f"no *.trace.json.gz under {TRACE_DIR}")
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    op = defaultdict(float)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        if (name.startswith(("jit_", "while")) or name.isdigit()):
            continue  # aggregates, not leaves
        op[name] += e["dur"]
    total = sum(op.values())
    cats = defaultdict(lambda: [0.0, 0])
    for n, d in op.items():
        c = cats[categorize(n)]
        c[0] += d
        c[1] += 1
    print(f"leaf device op-time {total / 1e3:.1f} ms over {STEPS} steps "
          f"({total / STEPS / 1e3:.1f} ms/step) — by category:")
    for name, (dur, cnt) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if dur / max(total, 1e-9) < 0.001:
            continue
        print(f"  {dur / 1e3:8.2f} ms {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name}  ({cnt} ops)")


if __name__ == "__main__":
    main()
