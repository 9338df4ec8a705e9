"""Training entry point.

Usage (reference README.md:32 parity):
    python -m electrocardio_panorama_tpu.main --config-file configs/nef_net.yml
Optional trailing overrides: `SOLVER.epochs 3 TPU.steps_per_epoch 2`.
"""

from __future__ import annotations

import os

from electrocardio_panorama_tpu.cli import base_parser, cfg_from_args
from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
from electrocardio_panorama_tpu.parallel.multihost import (
    ensure_initialized,
    local_batch_slice,
)
from electrocardio_panorama_tpu.training.solver import Solver
from electrocardio_panorama_tpu.utils import seed_everything


def main(cfg):
    # multi-host (DCN) init must run before any backend touch; no-ops on a
    # single host (parallel/multihost.py — the jax.distributed replacement
    # for the reference's DataParallel device policy, solver.py:29-40)
    multihost = ensure_initialized()
    import jax

    seed_everything(cfg.seed)
    output_dir = os.path.join(cfg.output_dir, cfg.desc)
    os.makedirs(output_dir, exist_ok=True)

    # each process loads only its local slice of every global batch
    proc_slice = (
        local_batch_slice(cfg.DATA.batch_size)
        if multihost and jax.process_count() > 1
        else None
    )
    train_ds = build_dataset(cfg, phase="train")
    test_ds = build_dataset(cfg, phase="test")
    # reference DataLoader recipe: batch 32, shuffle train, drop_last;
    # weighted sampling (num_samples=5000) when the dataset exposes weights
    # (train_net.py:22-28)
    weights = (
        train_ds.get_label_weight()
        if cfg.DATA.weighted_sample and hasattr(train_ds, "get_label_weight")
        else None
    )
    train_dl = BeatLoader(
        train_ds, cfg.DATA.batch_size, shuffle=True, drop_last=True,
        seed=cfg.seed, num_threads=cfg.DATA.num_workers,
        sample_weights=weights, process_slice=proc_slice,
    )
    test_dl = BeatLoader(
        test_ds, cfg.DATA.batch_size, shuffle=False, drop_last=True,
        seed=cfg.seed + 1, num_threads=cfg.DATA.num_workers,
        process_slice=proc_slice,
    )
    solver = Solver(cfg)
    solver.train(train_dl, test_dl)


if __name__ == "__main__":
    args = base_parser("ecg generation").parse_args()
    cfg = cfg_from_args(args)
    print("Using config: ", cfg)
    main(cfg)
