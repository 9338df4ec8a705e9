"""Train + eval + render on the REAL shipped Tianchi ECG records, on chip.

VERDICT r4 item 5 / "What's missing" 1: the data pipeline and ROI ops were
oracle-verified against the reference on the real records
(tests/test_real_data.py), but the model/solver had only ever consumed the
synthetic corpus. The reference's whole train/val path runs on exactly these
records (/root/reference/codes/train_net.py:10-32 with
codes/data/tianchi/npy_data/tianchi_train_round1/{40723,11315}.npy); only two
waveform records ship, so full-dataset training is impossible here — this
tool runs the feasible real-data contact instead: overfit the two records,
eval PSNR/SSIM on their beats, and render a panorama from a real beat.

Recipe: each record is listed 16x in the generated split files, so one
batch-32 epoch step draws 32 independent (beat, jitter, partition, target)
samples from the two records — the reference recipe (SGD 0.1, MultiStep)
then overfits them in a few hundred steps.

    python tools/real_overfit.py [epochs=150]

Artifacts (committed under docs/real_overfit/):
  * metrics.json — final train losses + eval PSNR/SSIM + env
  * panorama_real_beat.png — 84-view panorama of a real 40723.npy beat
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
NPY_DIR = f"{REF}/codes/data/tianchi/npy_data/tianchi_train_round1"
INTERVAL_DIR = f"{REF}/codes/data/tianchi/tianchi_interval"
RECORDS = ("40723.json", "11315.json")
# 2 records x 256 = 512 examples -> 16 batch-32 steps per epoch, matching
# the synthetic convergence recipe's update count (150 x 16 = 2400 steps;
# the first cut used x16 = 1 step/epoch and its 150 total updates left the
# model at a near-constant output, best PSNR at epoch 4)
REPEAT = 256


def build_cfg(workdir: str, epochs: int):
    from electrocardio_panorama_tpu.config import get_cfg

    list_path = os.path.join(workdir, "records.txt")
    os.makedirs(workdir, exist_ok=True)
    with open(list_path, "w") as f:
        f.write("\n".join(list(RECORDS) * REPEAT) + "\n")

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "nef_net.yml")
    )
    cfg.DATA.train_label_path = list_path
    cfg.DATA.test_label_path = list_path
    cfg.DATA.train_data_root = NPY_DIR
    cfg.DATA.train_label_root = INTERVAL_DIR
    cfg.SOLVER.epochs = epochs
    cfg.SOLVER.lr_step = [int(epochs * 0.6), int(epochs * 0.85)]
    cfg.output_dir = workdir
    cfg.desc = "real_overfit"
    return cfg


def main(epochs: int = 150):
    if not os.path.isdir(NPY_DIR):
        raise SystemExit(f"reference records not found under {NPY_DIR}")
    import jax

    from electrocardio_panorama_tpu import main as train_main
    from electrocardio_panorama_tpu import render as render_main
    from electrocardio_panorama_tpu import val_net

    workdir = "output/real_overfit_run"
    cfg = build_cfg(workdir, epochs)
    print(f"[real_overfit] training {epochs} epochs on {RECORDS} "
          f"({jax.devices()[0].device_kind})")
    train_main.main(cfg)

    metrics = val_net.main(cfg, epoch=-1)

    art_dir = "docs/real_overfit"
    os.makedirs(art_dir, exist_ok=True)
    rest_out, _ = render_main.main(
        cfg, n_theta=7, n_phi=12,
        out_path=os.path.join(workdir, "real_panorama.npz"),
        plot_path=os.path.join(art_dir, "panorama_real_beat.png"),
        max_batches=1,
    )

    # ScalarWriter logs under cfg.output_dir/tf_logs (training/solver.py)
    scalars = os.path.join(workdir, "tf_logs", "scalars.jsonl")
    first_row = last_row = None
    if os.path.exists(scalars):
        rows = [json.loads(ln) for ln in open(scalars) if ln.strip()]
        if rows:
            first_row, last_row = rows[0], rows[-1]
    out = {
        "records": list(RECORDS),
        "epochs": epochs,
        "device": str(jax.devices()[0].device_kind),
        "platform": str(jax.devices()[0].platform),
        "eval": {k: float(v) for k, v in metrics.items()},
        "train_loss_all_first_epoch": (None if first_row is None
                                       else first_row.get("train_loss_all")),
        "train_loss_all_last_epoch": (None if last_row is None
                                      else last_row.get("train_loss_all")),
        "panorama_views": int(rest_out.shape[1]) if rest_out.shape[0] else 0,
    }
    with open(os.path.join(art_dir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("[real_overfit] " + json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
