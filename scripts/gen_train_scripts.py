#!/usr/bin/env python
"""Generate the launch-script grid under scripts/train/{qm9,md17,oc20}/.

Mirrors the reference script inventory (/root/reference/scripts/train/**, 65
scripts) with this repo's CLI: every (dataset, model family, target) cell the
reference ships a script for gets one here, with the same hyperparameters.
Idempotent: re-run after CLI changes and commit the diff.
"""

import os
import stat

ROOT = os.path.join(os.path.dirname(__file__), "train")

HEADER = "#!/bin/bash\n# {note}\n"

MOLECULES = [
    "aspirin", "benzene", "ethanol", "malonaldehyde",
    "naphthalene", "salicylic_acid", "toluene", "uracil",
]


def emit(path, note, lines):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    body = HEADER.format(note=note) + " \\\n    ".join(lines) + ' "$@"\n'
    with open(full, "w") as f:
        f.write(body)
    os.chmod(full, os.stat(full).st_mode | stat.S_IXUSR | stat.S_IXGRP)


def qm9():
    # reference scripts/train/qm9/equiformer/target@*.sh hyperparameter grid
    base = dict(model="graph_attention_transformer_nonlinear_l2", bs=128,
                basis=128, wd="5e-3", lr="5e-4", epochs=300, extra=[])
    grid = {t: dict(base) for t in range(12)}
    grid[5].update(model="graph_attention_transformer_nonlinear_bessel_l2_drop01", basis=8)
    grid[6].update(model="graph_attention_transformer_nonlinear_bessel_l2", basis=8)
    for t in (7, 8, 9, 10):  # the _dist (2-gpu) cells: dp 2 on the TPU mesh
        grid[t].update(
            model="graph_attention_transformer_nonlinear_bessel_l2_drop00",
            bs=32, basis=8, wd="0.0", lr="1.5e-4", epochs=600,
            extra=["--no-standardize", "--dp 2"],
        )
    for t, c in grid.items():
        dist = "_dist" if "--dp 2" in c["extra"] else ""
        emit(
            f"qm9/equiformer/target@{t}{dist}.sh",
            f"QM9 target {t} — analog of reference scripts/train/qm9/equiformer/target@{t}{dist}.sh",
            [
                "python -m equiformer_tpu.cli.train_qm9",
                f"--output-dir 'runs/qm9/equiformer/target@{t}'",
                f"--model-name '{c['model']}'",
                "--input-irreps '5x0e'",
                f"--target {t}",
                "--data-path 'datasets/qm9'",
                "--feature-type 'one_hot'",
                f"--batch-size {c['bs']}",
                "--radius 5.0",
                f"--num-basis {c['basis']}",
                "--drop-path 0.0",
                f"--weight-decay {c['wd']}",
                f"--lr {c['lr']}",
                f"--epochs {c['epochs']}",
                "--min-lr 1e-6",
                "--no-model-ema",
            ] + c["extra"],
        )
    # dp_equiformer (dot-product attention ablation): targets 0-4, 11
    for t in (0, 1, 2, 3, 4, 11):
        emit(
            f"qm9/dp_equiformer/target@{t}.sh",
            f"QM9 target {t}, dot-product attention — analog of scripts/train/qm9/dp_equiformer/target@{t}.sh",
            [
                "python -m equiformer_tpu.cli.train_qm9",
                f"--output-dir 'runs/qm9/dp_equiformer/target@{t}'",
                "--model-name 'dot_product_attention_transformer_l2'",
                "--input-irreps '5x0e'",
                f"--target {t}",
                "--data-path 'datasets/qm9'",
                "--feature-type 'one_hot'",
                "--batch-size 128",
                "--radius 5.0",
                "--num-basis 128",
                "--drop-path 0.0",
                "--weight-decay 5e-3",
                "--lr 5e-4",
                "--min-lr 1e-6",
                "--no-model-ema",
            ],
        )
    emit(
        "qm9/compute_stats.sh",
        "QM9 dataset statistics — analog of scripts/train/qm9/compute_stats.sh",
        [
            "python -m equiformer_tpu.cli.compute_stats",
            "--dataset qm9 --data-path 'datasets/qm9' --radius 5.0",
        ],
    )


def md17():
    # se_l2: lr 5e-4, bs 8, epochs 1500, fw 80; se_l3: lr 2e-4, bs 5, epochs
    # 2000, fw 100 (reference md17/equiformer/se_l{2,3}/target@*.sh)
    fam = {
        "se_l2": dict(model="graph_attention_transformer_nonlinear_exp_l2_md17",
                      lr="5e-4", bs=8, ebs=24, epochs=1500, fw=80),
        "se_l3": dict(model="graph_attention_transformer_nonlinear_exp_l3_md17",
                      lr="2e-4", bs=5, ebs=16, epochs=2000, fw=100),
    }
    for f, c in fam.items():
        for mol in MOLECULES:
            emit(
                f"md17/equiformer/{f}/target@{mol}.sh",
                f"MD17 {mol} ({f}) — analog of scripts/train/md17/equiformer/{f}/target@{mol}.sh",
                [
                    "python -m equiformer_tpu.cli.train_md17",
                    f"--output-dir 'runs/md17/equiformer/{f}/target@{mol}'",
                    f"--model-name '{c['model']}'",
                    "--input-irreps '64x0e'",
                    f"--molecule '{mol}'",
                    "--data-path 'datasets/md17'",
                    f"--epochs {c['epochs']}",
                    f"--lr {c['lr']}",
                    f"--batch-size {c['bs']}",
                    f"--eval-batch-size {c['ebs']}",
                    "--weight-decay 1e-6",
                    "--num-basis 32",
                    "--energy-weight 1",
                    f"--force-weight {c['fw']}",
                ],
            )
    # equiformer_dens: DeNS auxiliary denoising (reference md17/equiformer_dens)
    dens = {
        "se_l2": dict(cfg="configs/md17_dens/equiformer_dens_l2.yml",
                      lr="5e-4", bs=8, ebs=8, epochs=1500),
        "se_l3": dict(cfg="configs/md17_dens/equiformer_dens_l3.yml",
                      lr="2e-4", bs=5, ebs=5, epochs=2000),
    }
    for f, c in dens.items():
        for mol in MOLECULES:
            emit(
                f"md17/equiformer_dens/{f}/target@{mol}.sh",
                f"MD17 {mol} + DeNS ({f}) — analog of scripts/train/md17/equiformer_dens/{f}/target@{mol}.sh",
                [
                    "python -m equiformer_tpu.cli.train_md17",
                    "--use-dens",
                    f"--output-dir 'runs/md17/equiformer_dens/{f}/target@{mol}'",
                    f"--config-yml '{c['cfg']}'",
                    f"--molecule '{mol}'",
                    "--data-path 'datasets/md17'",
                    f"--epochs {c['epochs']}",
                    f"--lr {c['lr']}",
                    f"--batch-size {c['bs']}",
                    f"--eval-batch-size {c['ebs']}",
                    "--weight-decay 1e-6",
                    "--energy-weight 1",
                    "--force-weight 80",
                    "--denoising-pos-prob 0.25",
                    "--denoising-pos-weight 5.0",
                    "--denoising-pos-std 0.05",
                    "--denoising-corrupt-ratio 0.25",
                    "--use-denoising-pos-weight-linear-decay",
                ],
            )


def oc20():
    # reference oc20/is2re grid: (config cell, split, g@N GPUs -> --dp N).
    # the split selects the train LMDB path; config files carry the model.
    cells = [
        ("graph_attention_transformer", "l1_256_split@10k", "is2re/l1_256.yml", "10k", 1),
        ("graph_attention_transformer", "l1_256_split@100k_g@2", "is2re/l1_256.yml", "100k", 2),
        ("graph_attention_transformer", "l1_256_split@all_g@2", "is2re/l1_256.yml", "all", 2),
        ("graph_attention_transformer", "l1_256_split@all_g@4", "is2re/l1_256.yml", "all", 4),
        ("graph_attention_transformer", "l1_256_nonlinear_split@100k_g@2", "l1_256_nonlinear.yml", "100k", 2),
        ("graph_attention_transformer", "l1_256_nonlinear_split@all_g@2", "l1_256_nonlinear.yml", "all", 2),
        ("graph_attention_transformer", "l1_256_aux_split@100k_g@2", "is2re/l1_256_aux.yml", "100k", 2),
        ("graph_attention_transformer", "l1_256_nonlinear_aux_split@100k_g@2", "is2re/l1_256_nonlinear_aux.yml", "100k", 2),
        ("graph_attention_transformer", "l1_256_nonlinear_aux_split@all_g@2", "is2re/l1_256_nonlinear_aux.yml", "all", 2),
        ("graph_attention_transformer", "l1_256_nonlinear_aux_interpolation_split@100k_g@2",
         "is2re/l1_256_nonlinear_aux_interpolation.yml", "100k", 2),
        ("graph_attention_transformer", "l1_256_e3_nonlinear_split@all_g@2", "is2re/l1_256_e3_nonlinear.yml", "all", 2),
        ("graph_attention_transformer", "l1_256_blocks@18_nonlinear_aux_split@all_g@4",
         "l1_256_blocks18_nonlinear_aux.yml", "all", 4),
        ("dp_attention_transformer", "l1_256_split@all_g@2", "is2re/dp_l1_256.yml", "all", 2),
    ]
    for fam, name, cfg, split, g in cells:
        emit(
            f"oc20/is2re/{fam}/{name}.sh",
            f"OC20 IS2RE {name} — analog of scripts/train/oc20/is2re/{fam}/{name}.sh",
            [
                "python -m equiformer_tpu.cli.train_oc20",
                f"--config-yml 'configs/oc20/{cfg}'",
                f"--output-dir 'runs/oc20/is2re/{fam}/{name}'",
                "--override "
                f"dataset.train_src=datasets/oc20/is2re/{split}/train/data.lmdb "
                "dataset.val_src=datasets/oc20/is2re/all/val_id/data.lmdb",
                f"--dp {g}",
            ],
        )
    emit(
        "oc20/is2re/graph_attention_transformer/compute_stats.sh",
        "OC20 IS2RE statistics — analog of scripts/train/oc20/is2re/graph_attention_transformer/compute_stats.sh",
        [
            "python -m equiformer_tpu.cli.compute_stats",
            "--dataset oc20 --data-path 'datasets/oc20/is2re' --radius 5.0",
        ],
    )


if __name__ == "__main__":
    qm9()
    md17()
    oc20()
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"scripts under {ROOT}: {n}")
