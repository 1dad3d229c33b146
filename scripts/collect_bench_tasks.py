"""Run bench.py for every task and assemble BENCH_TASKS_r{N}.json.

Tasks run sequentially (one TPU job at a time; CLAUDE.md).  Each row is the
bench.py JSON line plus multi-run statistics: with --runs N (default 5,
VERDICT r4 item 3) every task is benched N times in one session and the row
records all readings plus ``median``/``spread`` fields; ``value`` and
``vs_baseline`` are the MEDIAN reading (the repo's own ±3% tunnel-noise rule:
trust multi-run medians, not single readings).

The output JSON is rewritten after every completed run, and a per-task
timeout (or any subprocess failure) skips that run instead of aborting the
collection (ADVICE r4).

Run (from the repo root; do NOT set PYTHONPATH=. — that clobbers
/root/.axon_site and the axon TPU backend never registers, CLAUDE.md gotcha):

    python scripts/collect_bench_tasks.py --out BENCH_TASKS_r05.json
"""

import argparse
import json
import statistics
import subprocess
import sys


def run_once(task: str, timeout: int, extra_args=()):
    """One bench.py invocation -> parsed JSON row, or None on failure."""
    try:
        p = subprocess.run(
            [sys.executable, "bench.py", "--task", task, *extra_args],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"  TIMEOUT after {timeout}s", flush=True)
        return None
    line = None
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and "metric" in ln:
            line = ln
    if line is None:
        print(f"  FAILED: {p.stdout[-500:]}\n{p.stderr[-1000:]}", flush=True)
        return None
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_TASKS_r05.json")
    ap.add_argument("--tasks", default="qm9,oc20,md17,dens,oc20_18b")
    ap.add_argument("--runs", type=int, default=5,
                    help="bench runs per task; value/vs_baseline = median")
    ap.add_argument("--inprocess", action="store_true",
                    help="one bench.py subprocess per task with --repeat RUNS "
                         "measurement windows (one remote compile instead of "
                         "RUNS; needed for the 15-20 min HO-path compiles)")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-run subprocess timeout (seconds)")
    ap.add_argument("--merge", default=None,
                    help="existing json to merge rows into")
    args = ap.parse_args()

    rows = {}
    if args.merge:
        with open(args.merge) as fh:
            rows = json.load(fh)

    def flush():
        with open(args.out, "w") as fh:
            json.dump(rows, fh, indent=1)

    for task in args.tasks.split(","):
        if args.inprocess:
            print(f"== bench --task {task} --repeat {args.runs}", flush=True)
            row = run_once(task, args.timeout, (f"--repeat={args.runs}",))
            if row is None:
                print(f"  no successful run for {task}", flush=True)
                continue
            print(f"  {json.dumps(row)}", flush=True)
            rows[task] = row
            flush()
            continue
        readings = []
        row = None
        for i in range(args.runs):
            print(f"== bench --task {task} run {i + 1}/{args.runs}", flush=True)
            r = run_once(task, args.timeout)
            if r is None:
                continue
            print(f"  {json.dumps(r)}", flush=True)
            readings.append(r["value"])
            row = r  # keep the last full row (flops/mfu fields are run-stable)
            # incremental write after every run so a later crash loses nothing
            partial = dict(row)
            partial["runs"] = readings
            rows[task] = partial
            flush()
        if not readings:
            print(f"  no successful runs for {task}", flush=True)
            continue
        med = statistics.median(readings)
        row["runs"] = readings
        row["median"] = round(med, 2)
        row["spread"] = round(max(readings) - min(readings), 2)
        # report the median as the number of record; rescale vs_baseline
        if "vs_baseline" in row and row["value"]:
            row["vs_baseline"] = round(row["vs_baseline"] * med / row["value"], 3)
        row["value"] = round(med, 2)
        rows[task] = row
        flush()
        print(f"  {task}: median {med} over {readings}", flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
