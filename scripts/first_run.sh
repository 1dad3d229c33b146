#!/usr/bin/env bash
# Real-data readiness drill: the documented, tested path from "you have the
# dataset files and (optionally) a torch/e3nn environment" to "constants
# parity verified, datasets validated, reference checkpoint ingested, and a
# training run progressing inside the recorded loss envelope".
#
# Usage:
#   scripts/first_run.sh                      # fixture mode: every stage runs
#                                             # against in-repo format-true
#                                             # fixtures (works in this
#                                             # container; proves the pipeline)
#   scripts/first_run.sh DATASETS_ROOT        # real datasets (qm9/ md17/ oc20/)
#   scripts/first_run.sh DATASETS_ROOT CKPT   # + a reference .pt checkpoint
#
# Every stage prints what it verified; the script exits non-zero at the first
# failing stage.  Tested end-to-end (fixture mode) by
# tests/test_first_run.py.

set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="${1:-}"
CKPT="${2:-}"
WORK="${FIRST_RUN_WORK:-$(mktemp -d)}"
echo "workdir: $WORK"

echo
echo "== stage 0: environment"
python - <<'EOF'
import sys

sys.path.insert(0, ".")
from equiformer_tpu.utils.platform import apply_platform_env

apply_platform_env()
import jax

print("jax", jax.__version__, "backend:", jax.default_backend(),
      "devices:", len(jax.devices()))
EOF

echo
echo "== stage 1: constants parity (CG / SH / wigner vs e3nn conventions)"
if python -c "import e3nn, torch" 2>/dev/null; then
    # live e3nn: dump its actual tables and cross-check the in-repo
    # derivations against them (the strongest parity evidence)
    python tools/gen_e3nn_constants.py --out "$WORK/e3nn_constants.json"
    E3NN_JSON="$WORK/e3nn_constants.json"
else
    echo "(no live e3nn here: running the independent sympy/scipy"
    echo " cross-validation of the same tables instead)"
    python -m pytest tests/test_independent_constants.py -q -x --no-header
    E3NN_JSON=""
fi

echo
echo "== stage 2: dataset validation (layout + structural parse + sha256 lock)"
if [ -n "$ROOT" ]; then
    DATA_ROOT="$ROOT"
else
    echo "(no datasets root given: assembling format-true fixtures)"
    DATA_ROOT="$WORK/datasets"
    mkdir -p "$DATA_ROOT/qm9" "$DATA_ROOT/md17" "$DATA_ROOT/oc20/train"
    python tools/gen_dataset_fixtures.py >/dev/null
    cp -r tests/fixtures/qm9_raw/raw "$DATA_ROOT/qm9/raw"
    cp tests/fixtures/md17_raw/raw/md17_aspirin.npz "$DATA_ROOT/md17/"
    python - "$DATA_ROOT" <<'EOF'
import sys

from equiformer_tpu.data.oc20_lmdb import write_is2re_lmdb
from equiformer_tpu.data.synthetic import oc20_like_dataset

write_is2re_lmdb(sys.argv[1] + "/oc20/train/data.lmdb",
                 oc20_like_dataset(8, seed=0))
EOF
fi
python -m equiformer_tpu.data.manifest "$DATA_ROOT" \
    --lock "$WORK/datasets.lock.json" --write-lock

echo
echo "== stage 3: reference checkpoint ingestion (torch-free .pt reader)"
if [ -n "$CKPT" ]; then
    SRC="$CKPT"
    MODEL="${FIRST_RUN_MODEL:-graph_attention_transformer_nonlinear_l2}"
    MODEL_KW=()
else
    echo "(no checkpoint given: building a reference-format .pt fixture)"
    SRC="$WORK/ref_fixture.pt"
    PYTHONPATH=".:${PYTHONPATH:-}" python - "$SRC" <<'EOF'
import sys

import numpy as np
import torch

from equiformer_tpu.utils.platform import apply_platform_env

apply_platform_env()
from equiformer_tpu.models import model_entrypoint
sys.path.insert(0, "tests")
from test_convert import build_synthetic_ref_state_dict

model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
    radius=5.0, num_basis=16, max_edges=512, nodes_per_graph=30)
sd = build_synthetic_ref_state_dict(model)
tsd = {"module." + k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
torch.save({"state_dict": tsd, "epoch": 3}, sys.argv[1])
print("wrote", sys.argv[1])
EOF
    MODEL="graph_attention_transformer_nonlinear_l2"
    MODEL_KW=(--model-kwargs radius=5.0 num_basis=16 max_edges=512
              nodes_per_graph=30)
fi
CONV_ARGS=("$SRC" "$WORK/converted.npz" --model "$MODEL")
[ ${#MODEL_KW[@]} -gt 0 ] && CONV_ARGS+=("${MODEL_KW[@]}")
[ -n "$E3NN_JSON" ] && CONV_ARGS+=(--e3nn-constants "$E3NN_JSON")
python tools/convert_checkpoint.py "${CONV_ARGS[@]}"

echo
echo "== stage 4: training smoke + recorded loss envelope"
python -m equiformer_tpu.cli.train_oc20 --synthetic --epochs 3 \
    --output-dir "$WORK/run" \
    --override model.num_layers=1 \
    "model.irreps_node_embedding=32x0e+16x1e" "model.irreps_feature=64x0e" \
    "model.irreps_head=8x0e+4x1e" "model.irreps_mlp_mid=48x0e+24x1e" \
    "model.number_of_basis=16" "model.fc_neurons=[16,16]" \
    "optim.batch_size=16"
python scripts/check_envelope.py "$WORK/run/metrics.jsonl" \
    configs/first_run_envelope.json oc20_synthetic_smoke

echo
echo "ALL STAGES GREEN"
if [ -z "$ROOT" ]; then
    echo "(fixture mode: rerun with your datasets root — and a reference"
    echo " checkpoint + an e3nn environment if you have them — to verify"
    echo " the real thing; then start real training, e.g.:"
    echo "   python -m equiformer_tpu.cli.train_qm9 --data-path \$ROOT/qm9 \\"
    echo "       --target 1 --epochs 300 --output-dir runs/qm9_alpha )"
fi
