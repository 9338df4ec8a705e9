"""Batch/width sweep giving the fused TRAINING decoder its verdict
(VERDICT r03 item 6): is there a regime where the recompute-backward Pallas
train decoder (ops/pallas/decoder_train.py) beats the XLA grouped 3-decode?

Round-3 finding: at batch 32 bf16 the fused path LOSES (2.59 vs 2.26 ms) —
the recompute backward + kernel-layout relayouts cost more than fusion saves.
This sweep times the full Solver train step at batch {32, 128, 512} bf16 for
TPU.train_decoder in {'xla', 'fused'} on the real chip, K-chained with tunnel
RTT subtracted (bench.py measurement rule).

Usage: python tools/sweep_train_decoder.py [K] [--encoder xla|fused]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _rtt(jax, jnp):
    @jax.jit
    def triv(x):
        return (x * 2).sum()

    x0 = jnp.ones((8, 128))
    float(triv(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x0))
    return (time.perf_counter() - t0) / 10


def _time(fn, args, reps=5, rtt=0.0):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return max(med - rtt, 0.5 * med)


def main(K=64, encoder="xla"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.training.solver import Solver

    print("devices:", jax.devices(), flush=True)
    rtt = _rtt(jax, jnp)
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    for B in (32, 128, 512):
        batch = _synth_batch(rng, B=B)
        args = tuple(
            jnp.asarray(batch[k]) for k in
            ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
        )
        k_eff = max(K // (B // 32), 8)
        res = {}
        for mode in ("xla", "fused"):
            cfg = get_cfg()
            cfg.desc = "debug"
            cfg.MODEL.model = "model_nefnet"
            cfg.DATA.lead_num = 3
            cfg.DATA.batch_size = B
            cfg.TPU.compute_dtype = "bfloat16"
            cfg.TPU.train_decoder = mode
            cfg.TPU.train_encoder = encoder
            cfg.output_dir = "/tmp/sweep_train_decoder"
            s = Solver(cfg, use_writer=False)
            p0, bn0 = s.model.init(jax.random.PRNGKey(0))
            opt0 = s.tx.init(p0)
            step = s._train_step

            def chain(p, bn, opt, key):
                def body(c, k):
                    p, bn, opt = c
                    p, bn, opt, losses = step(p, bn, opt, key, k,
                                              jnp.asarray(0),
                                              jnp.asarray(1), *args)
                    return (p, bn, opt), losses[0]

                (_, _, _), ls = jax.lax.scan(
                    body, (p, bn, opt), jnp.arange(k_eff, dtype=jnp.int32))
                return ls.sum()

            try:
                med = _time(jax.jit(chain),
                            (p0, bn0, opt0, jax.random.PRNGKey(9)),
                            rtt=rtt) / k_eff
                res[mode] = med
                print(f"B={B:4d} decoder={mode:5s}: {med*1e3:.3f} ms/step "
                      f"({B/med:,.0f} samples/s)", flush=True)
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(f"B={B:4d} decoder={mode:5s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        if "xla" in res and "fused" in res:
            print(f"B={B:4d} fused/xla = {res['fused']/res['xla']:.3f}x",
                  flush=True)


if __name__ == "__main__":
    kw = {}
    if "--encoder" in sys.argv:
        kw["encoder"] = sys.argv[sys.argv.index("--encoder") + 1]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")
           and a not in kw.values()]
    main(int(pos[0]) if pos else 64, **kw)
