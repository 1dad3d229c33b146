"""Check a training run's metrics.jsonl against a recorded loss envelope.

The envelope file (configs/first_run_envelope.json) records, per workload,
what a healthy first run looks like: a minimum number of logged train steps,
a ceiling on the FIRST logged loss (catches unit/normalization regressions
— an untrained model's loss has a known scale) and a ceiling on the LAST
logged loss (catches does-not-train regressions).  Envelopes are recorded
from this repo's synthetic soaks/smokes; on real data the same envelope
keys apply with dataset-specific values.

Usage: python scripts/check_envelope.py <metrics.jsonl> <envelope.json> <key>
Exit 0 = within envelope.
"""

import json
import sys


def main():
    metrics_path, env_path, key = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(env_path) as fh:
        env = json.load(fh)[key]
    losses = []
    with open(metrics_path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "loss" in rec:
                losses.append(float(rec["loss"]))
    if len(losses) < env["min_records"]:
        sys.exit(f"only {len(losses)} loss records; envelope expects >= "
                 f"{env['min_records']}")
    if not all(l == l and abs(l) != float("inf") for l in losses):
        sys.exit("non-finite loss in the run")
    if losses[0] > env["first_loss_max"]:
        sys.exit(f"first loss {losses[0]:.4f} above envelope "
                 f"{env['first_loss_max']} — check units/normalization")
    if losses[-1] > env["last_loss_max"]:
        sys.exit(f"last loss {losses[-1]:.4f} above envelope "
                 f"{env['last_loss_max']} — training is not progressing")
    print(f"envelope ok [{key}]: {len(losses)} records, first "
          f"{losses[0]:.4f} <= {env['first_loss_max']}, last "
          f"{losses[-1]:.4f} <= {env['last_loss_max']}")


if __name__ == "__main__":
    main()
