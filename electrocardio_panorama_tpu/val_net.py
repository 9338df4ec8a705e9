"""Validation entry point (reference val_net.py:27-49).

    python -m electrocardio_panorama_tpu.val_net --config-file ... --epoch N
--epoch -1 (default) loads best_valid.pkl.
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


def main(cfg, epoch: int = -1):
    multihost = ensure_initialized()
    import jax

    seed_everything(cfg.seed)
    os.makedirs(os.path.join(cfg.output_dir, cfg.desc), exist_ok=True)
    proc_slice = (
        local_batch_slice(cfg.DATA.batch_size)
        if multihost and jax.process_count() > 1
        else None
    )
    test_ds = build_dataset(cfg, phase="test")
    test_dl = BeatLoader(test_ds, cfg.DATA.batch_size, shuffle=False, drop_last=True,
                         seed=cfg.seed + 1, num_threads=cfg.DATA.num_workers,
                         process_slice=proc_slice)
    solver = Solver(cfg, use_writer=False)
    return solver.val(test_dl, epoch=epoch)


if __name__ == "__main__":
    parser = base_parser("ecg generation eval")
    parser.add_argument("--epoch", default=-1, type=int)
    args = parser.parse_args()
    cfg = cfg_from_args(args)
    main(cfg, epoch=args.epoch)
