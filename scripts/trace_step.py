"""Device-trace attribution of a bench train step (jax.profiler on axon).

Captures an xplane trace of N train steps of the EXACT bench.py config
(tight edge caps, bf16) and aggregates per-fusion device time, answering
"where do the milliseconds between the kernel roofline floor and the
measured step go?" — the question PERF_ANALYSIS.md's analytic roofline
cannot answer for the non-DTP XLA tail.

Run: PYTHONPATH=. python scripts/trace_step.py [--task qm9] [--steps 10]
     [--top 40]

The trace.json.gz event names are XLA thunk names: Pallas kernels show up
as custom-calls with their kernel name, XLA fusions as `fusion.N` /
`loop_fusion` etc.  Device busy time is the sum of X-event durations on the
TPU pid; the step wall span divided by --steps gives per-step totals.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="qm9")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/equiformer_trace")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--loose-edges", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--flops-only", action="store_true")  # builder compat
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench

    batch_size = args.batch or bench.DEFAULT_BATCH[args.task]
    train_step, state, batches = bench.BUILDERS[args.task](args, batch_size)
    step = jax.jit(train_step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batches[i % len(batches)], sub)
    float(metrics["loss"])  # true sync on the axon tunnel

    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.outdir):
        for i in range(args.steps):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batches[i % len(batches)], sub)
        float(metrics["loss"])
    wall = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {wall*1e3:.1f} ms wall "
          f"({wall*1e3/args.steps:.2f} ms/step incl. one RTT)")

    traces = sorted(
        glob.glob(os.path.join(args.outdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    path = traces[-1]
    print(f"trace: {path}")
    with gzip.open(path) as fh:
        tr = json.load(fh)
    ev = tr.get("traceEvents", [])

    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                dev_pids.add(e["pid"])
    if not dev_pids:
        print("no device pid found in trace")
        return

    per_name = collections.Counter()
    calls = collections.Counter()
    spans = []
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            d = float(e.get("dur", 0.0))
            per_name[e["name"]] += d
            calls[e["name"]] += 1
            spans.append((float(e["ts"]), float(e["ts"]) + d))
    if not spans:
        print("no device events")
        return
    t_lo = min(s for s, _ in spans)
    t_hi = max(e for _, e in spans)
    span_ms = (t_hi - t_lo) / 1e3
    busy_us = sum(per_name.values())
    # union busy time (events can overlap across device lanes)
    spans.sort()
    union = 0.0
    cur_s, cur_e = spans[0]
    for s, e in spans[1:]:
        if s > cur_e:
            union += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    union += cur_e - cur_s

    n = args.steps
    print(f"device span {span_ms:.1f} ms = {span_ms/n:.2f} ms/step")
    print(f"device busy (sum)   {busy_us/1e3/n:8.3f} ms/step")
    print(f"device busy (union) {union/1e3/n:8.3f} ms/step")
    print(f"device idle (span-union) {(span_ms - union/1e3)/n:8.3f} ms/step")
    print(f"\n{'ms/step':>9}  {'calls/step':>10}  name")
    for name, d in per_name.most_common(args.top):
        print(f"{d/1e3/n:9.3f}  {calls[name]/n:10.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
