"""Run bench.py for every task and assemble BENCH_TASKS_r{N}.json.

Tasks run sequentially (one TPU job at a time; CLAUDE.md).  Each row is the
bench.py JSON line plus a note.

Run: PYTHONPATH=. python scripts/collect_bench_tasks.py --out BENCH_TASKS_r04.json
"""

import argparse
import json
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_TASKS_r04.json")
    ap.add_argument("--tasks", default="qm9,oc20,md17,dens")
    ap.add_argument("--merge", default=None,
                    help="existing json to merge rows into")
    args = ap.parse_args()

    rows = {}
    if args.merge:
        with open(args.merge) as fh:
            rows = json.load(fh)
    for task in args.tasks.split(","):
        print(f"== bench --task {task}", flush=True)
        p = subprocess.run(
            [sys.executable, "bench.py", "--task", task],
            capture_output=True, text=True, timeout=3600,
        )
        line = None
        for ln in p.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{") and "metric" in ln:
                line = ln
        if line is None:
            print(f"  FAILED: {p.stdout[-500:]}\n{p.stderr[-1000:]}")
            continue
        rows[task] = json.loads(line)
        print(f"  {line}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
