"""Multi-host (multi-process) data parallelism — a REAL 2-process CPU run.

Spawns two children that each see 4 virtual CPU devices and join via
jax.distributed (the DCN equivalence for the reference's single-host
DataParallel policy, reference solver.py:29-40 / SURVEY.md section 2.3), then
asserts the trained parameters and metrics equal a single-process run of the
identical recipe — topology must not change the math — and that the collective
Orbax checkpoint layout restores. Also unit-covers local_batch_slice and the
loader's process_slice global-batch reconstruction.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_local_batch_slice_partitions(monkeypatch):
    from electrocardio_panorama_tpu.parallel import multihost

    # single process: identity slice
    sl = multihost.local_batch_slice(32)
    assert (sl.start, sl.stop) == (0, 32)
    # simulate a 4-process topology
    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 2)
    sl = multihost.local_batch_slice(32)
    assert (sl.start, sl.stop) == (16, 24)
    with pytest.raises(ValueError, match="divisible"):
        multihost.local_batch_slice(30)


def test_loader_process_slices_reassemble_global_batch(tmp_path):
    """Two process-sliced loaders concatenate to the single-process batch,
    example for example (global positions key the per-example RNG)."""
    from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
    from _multihost_child import make_cfg

    cfg = make_cfg(str(tmp_path / "out"), str(tmp_path / "synth"))
    ds = build_dataset(cfg, "train")
    mk = lambda ps: BeatLoader(  # noqa: E731
        ds, 8, shuffle=True, drop_last=True, seed=cfg.seed, process_slice=ps
    )
    full = next(iter(mk(None)))
    lo = next(iter(mk(slice(0, 4))))
    hi = next(iter(mk(slice(4, 8))))
    for k in ("data", "input_theta", "rois", "target_view"):
        np.testing.assert_array_equal(
            full[k], np.concatenate([lo[k], hi[k]], axis=0)
        )
    with pytest.raises(ValueError, match="drop_last"):
        BeatLoader(ds, 8, drop_last=False, process_slice=slice(0, 4))


def test_two_process_training_matches_single_process(tmp_path):
    """End-to-end: 2-process jax.distributed training via the real entry point
    == single-process training (params + best-psnr extras), and the Orbax
    multi-host checkpoint restores in a fresh single process."""
    from electrocardio_panorama_tpu.data import build_dataset
    from electrocardio_panorama_tpu.training.checkpoint import OrbaxCheckPointer
    from _multihost_child import make_cfg

    synth = str(tmp_path / "synth")
    # pre-generate the corpus so concurrent children never race the generator
    cfg_seed = make_cfg(str(tmp_path / "seed_out"), synth)
    build_dataset(cfg_seed, "train")

    # ---- single-process baseline over the SAME 8-device mesh (GSPMD)
    from electrocardio_panorama_tpu import main as train_main

    cfg_one = make_cfg(str(tmp_path / "one"), synth)
    train_main.main(cfg_one)
    one = OrbaxCheckPointer(os.path.join(cfg_one.output_dir, "mh")).load()
    assert one is not None
    params_one, _, _, extras_one = one

    # ---- 2-process run: 4 virtual devices per child, joined over DCN
    port = _free_port()
    out2 = str(tmp_path / "two")
    env = {
        **os.environ,
        "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        "ECGPAN_NO_COMPILE_CACHE": "1",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_child.py"),
             out2, synth],
            env={**env, "PROCESS_ID": str(pid)},
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        # generous bound: the host is 1 CPU core and may be shared with a
        # training run — under contention the two children plus the suite can
        # take several x the ~2 min idle wall time (observed flake at 600)
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
        assert "CHILD_OK" in out

    two = OrbaxCheckPointer(os.path.join(out2, "mh")).load()
    assert two is not None
    params_two, _, _, extras_two = two

    # topology must not change the math (same global batches, same RNG
    # streams, GSPMD-global BN stats; only collective scheduling may differ)
    for k in params_one:
        np.testing.assert_allclose(
            np.asarray(params_one[k]), np.asarray(params_two[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
    assert extras_two["epoch"] == extras_one["epoch"] == 0
    np.testing.assert_allclose(
        extras_two["best_test_psnr_gen"], extras_one["best_test_psnr_gen"],
        rtol=1e-4,
    )
