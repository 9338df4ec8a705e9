"""Host input-pipeline throughput: ms per batch-32 across thread counts.

The TPU train step is ~2.3 ms at batch 32 (bf16), so the loader decides
training throughput (reference hides this behind 16 worker processes,
train_net.py:27; this host has ONE core). Measured history at threads=0,
steady state (record/beat caches warm), IDLE host — numbers measured while
a pytest suite shared the single core read 59 -> 6.9 ms and overstated both
sides; always measure alone:

  r03 pre-optimization   26.1 ms/batch   (np.load x2 per example ~45%,
                                          full-matrix noise, np.pad stack)
  + record/beat LRU caches, single-lead noise, one-pass f32 assembly
                           2.6 ms/batch   (10.2x) — at parity with the
                                          2.3 ms device step: training is
                                          no longer input-bound

Run: python tools/bench_loader.py [--profile]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from electrocardio_panorama_tpu.config import get_cfg  # noqa: E402
from electrocardio_panorama_tpu.data import BeatLoader, build_dataset  # noqa: E402


def make_loader(num_threads: int):
    """The canonical loader-bench recipe (bench.py reuses it): the shipped
    3-lead training config over the repo's synthetic corpus, weighted-sampler
    epochs like real training."""
    cfg = get_cfg()
    cfg.DATA.dataset = "synthetic"
    cfg.output_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "output", "nef_net_synthetic",
    )
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.MODEL.jitter_factor = 2.5
    ds = build_dataset(cfg, "train")
    return BeatLoader(
        ds, 32, shuffle=True, drop_last=True, seed=1, num_threads=num_threads,
        sample_weights=[1.0] * len(ds), num_samples=5000,
    )


def measure(num_threads: int, batches: int = 80) -> float:
    dl = make_loader(num_threads)
    it = iter(dl)
    for _ in range(8):  # warm caches + pool spin-up
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in it:
        n += 1
        if n == batches:
            break
    dt = time.perf_counter() - t0
    # drain the abandoned iterator's pool cleanly
    del it
    return dt / n * 1e3


def main() -> None:
    # the axon sitecustomize pins jax_platforms="axon,cpu"; force CPU so this
    # standalone bench never blocks on a dead TPU tunnel (tests/conftest.py
    # pattern). Done here, not at module level: bench.py imports make_loader/
    # measure and must keep its axon backend.
    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--profile" in sys.argv:
        dl = make_loader(0)
        it = iter(dl)
        for _ in range(8):
            next(it)
        pr = cProfile.Profile()
        pr.enable()
        for i, _ in enumerate(it):
            if i == 40:
                break
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        return
    for nt in (0, 2, 4, 8):
        ms = measure(nt)
        print(f"threads={nt:2d}: {ms:7.2f} ms/batch  ({32e3 / ms:8.0f} samples/s)")


if __name__ == "__main__":
    main()
