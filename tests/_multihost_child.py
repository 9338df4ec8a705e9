"""One process of the 2-process CPU multi-host test (tests/test_multihost.py).

Launched twice by the parent test with COORDINATOR_ADDRESS / NUM_PROCESSES /
PROCESS_ID set; runs the REAL training entry point (main.main) so the wiring
under test is exactly what a user launches: ensure_initialized ->
local_batch_slice loaders -> global-mesh Solver -> collective Orbax save.
"""

from __future__ import annotations

import sys


def make_cfg(output_dir: str, synth_root: str):
    """The shared parent/child recipe — 1 epoch, 2 steps, global batch 8 over
    an 8-device mesh, Orbax checkpoints."""
    from electrocardio_panorama_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.desc = "mh"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 8
    cfg.DATA.num_workers = 0
    cfg.MODEL.model = "model_nefnet"
    cfg.SOLVER.epochs = 1
    cfg.SOLVER.lr = 0.05
    cfg.TPU.steps_per_epoch = 2
    cfg.TPU.mesh_shape = [8]
    cfg.TPU.checkpoint_backend = "orbax"
    cfg.DATA.synthetic_root = synth_root
    cfg.output_dir = output_dir
    return cfg


def main():
    import os

    # Shed any inherited niceness: when the suite itself runs niced (e.g.
    # alongside a foreground training run on this 1-core host), a starved
    # child misses the Gloo TCP connect window of its peer's first collective
    # and the run dies with "Gloo context initialization failed: Connect
    # timeout" (observed once). The handshake needs both children scheduled;
    # priority 0 is safe for a <3 min test process (no-op if not permitted).
    try:
        os.setpriority(os.PRIO_PROCESS, 0, 0)
    except (OSError, AttributeError):
        pass

    import jax

    jax.config.update("jax_platforms", "cpu")

    from electrocardio_panorama_tpu.parallel.multihost import ensure_initialized

    assert ensure_initialized(), "coordinator env vars not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    output_dir, synth_root = sys.argv[1], sys.argv[2]
    cfg = make_cfg(output_dir, synth_root)

    from electrocardio_panorama_tpu import main as train_main

    train_main.main(cfg)
    print(f"CHILD_OK process={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
