"""A/B tiebreak: does the fused Pallas encoder win the bf16 train step?

Two prior measurements disagreed at batch 32 bf16:
  * tools/verify_fused_encoder.py (Solver._train_step, scan-chained):
    xla 2.838 vs fused 2.553 ms/step — fused wins by 0.285 ms;
  * bench.py's lean train chain (hand-built loss + optax, scan-chained):
    xla 2.253 vs fused 2.292 ms/step — fused loses by 0.04 ms.

Each tool was internally consistent, so either the HARNESSES differ (the
Solver step carries work the lean chain lacks) or machine drift between the
two processes poisoned one of them. This tool removes both confounders: it
compiles all four (harness x encoder) programs in ONE process and times them
INTERLEAVED (round-robin reps), so drift hits every config equally.

Usage: python tools/ab_train_encoder.py [K] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main(K=256, reps=7):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.losses import loss_wrapper
    from electrocardio_panorama_tpu.training.optim import get_optimizer
    from electrocardio_panorama_tpu.training.precision import (
        cast_floats, cast_floats_f32)
    from electrocardio_panorama_tpu.training.solver import Solver

    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def triv(x):
        return (x * 2).sum()

    x0 = jnp.ones((8, 128))
    float(triv(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x0))
    rtt = (time.perf_counter() - t0) / 10
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    B = 32
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    args = tuple(
        jnp.asarray(batch[k]) for k in
        ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )

    import optax

    progs = {}

    # fused = tower-checkpoint backward (production default);
    # fused-reco = pure recompute backward (TPU.encoder_ckpt=False)
    for mode in ("xla", "fused", "fused-reco"):
        enc_mode = "fused" if mode.startswith("fused") else "xla"
        ckpt = mode == "fused"
        # ---- Solver harness (what training actually runs)
        cfg = get_cfg()
        cfg.desc = "debug"
        cfg.MODEL.model = "model_nefnet"
        cfg.DATA.lead_num = 3
        cfg.DATA.batch_size = B
        cfg.TPU.compute_dtype = "bfloat16"
        cfg.TPU.train_encoder = enc_mode
        cfg.TPU.encoder_ckpt = ckpt
        cfg.output_dir = "/tmp/ab_train_encoder"
        s = Solver(cfg, use_writer=False)
        p0, bn0 = s.model.init(jax.random.PRNGKey(0))
        opt0 = s.tx.init(p0)
        step = s._train_step

        def chain(p, bn, opt, key, _step=step):
            def body(c, k):
                p, bn, opt = c
                p, bn, opt, losses = _step(p, bn, opt, key, k, jnp.asarray(0),
                                           jnp.asarray(1), *args)
                return (p, bn, opt), losses[0]

            (_, _, _), ls = jax.lax.scan(
                body, (p, bn, opt), jnp.arange(K, dtype=jnp.int32))
            return ls.sum()

        progs[f"solver/{mode}"] = (
            jax.jit(chain), (p0, bn0, opt0, jax.random.PRNGKey(9))
        )

        # ---- bench.py-style lean harness (hand-built step, threefry keys)
        cfgb = get_cfg()
        cfgb.MODEL.model = "model_nefnet"
        cfgb.DATA.lead_num = 3
        model = build_model(cfgb)
        pb, bnb = model.init(jax.random.PRNGKey(0))
        tx = get_optimizer(cfgb)
        optb = tx.init(pb)
        if enc_mode == "fused":
            from electrocardio_panorama_tpu.ops.pallas.encoder_fused import (
                make_fused_encode_fn)

            ekw = {"encode_fn": make_fused_encode_fn(cfgb.DATA.lead_num,
                                                     cfgb.MODEL.theta_L,
                                                     tower_ckpt=ckpt)}
        else:
            ekw = {}
        castc = lambda t: cast_floats(t, jnp.bfloat16)  # noqa: E731
        data, input_theta, target_theta, rois, target_view, _noise = args

        @jax.jit
        def bchain(p, bn, opt, rng_key, _ekw=ekw):
            def one_step(carry, k):
                p, bn, opt = carry

                def loss_fn(pp):
                    pp, d, it, tt = castc((pp, data, input_theta, target_theta))
                    (out, sp, sl), new_bn = model.apply(
                        pp, bn, d, it, tt, rois,
                        phase="train", rng=jax.random.fold_in(rng_key, k),
                        shuffle_idx=(0, 1), **_ekw,
                    )
                    out, sp, sl = cast_floats_f32((out, sp, sl))
                    loss, *_ = loss_wrapper(out, sp, sl,
                                            target_view[:, None, :], cfgb)
                    return loss, new_bn

                (loss, new_bn), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                updates, opt = tx.update(grads, opt, p)
                p = optax.apply_updates(p, updates)
                bn = dict(bn)
                bn.update(new_bn)
                return (p, bn, opt), loss

            (_, _, _), ls = jax.lax.scan(
                one_step, (p, bn, opt), jnp.arange(K))
            return ls.sum()

        progs[f"bench/{mode}"] = (
            bchain, (pb, bnb, optb, jax.random.PRNGKey(9))
        )

    # compile everything first
    for nm, (fn, a) in progs.items():
        t0 = time.perf_counter()
        float(fn(*a))
        print(f"compiled {nm:12s} in {time.perf_counter()-t0:.1f}s", flush=True)

    # interleaved timing
    times = {nm: [] for nm in progs}
    for r in range(reps):
        for nm, (fn, a) in progs.items():
            t0 = time.perf_counter()
            float(fn(*a))
            times[nm].append(time.perf_counter() - t0)

    print(f"\nK={K} reps={reps} (per-step ms, RTT {rtt*1e3:.1f} ms "
          "subtracted once per chain):", flush=True)
    med = {}
    for nm, ts in times.items():
        m = float(np.median(ts))
        m = max(m - rtt, 0.5 * m) / K
        med[nm] = m
        print(f"  {nm:12s}: {m*1e3:.3f} ms/step  "
              f"(spread {1e3*(max(ts)-min(ts))/K:.3f})", flush=True)
    for h in ("solver", "bench"):
        d = med[f"{h}/xla"] - med[f"{h}/fused"]
        print(f"  {h}: fused {'WINS' if d > 0 else 'LOSES'} by "
              f"{abs(d)*1e3:.3f} ms/step", flush=True)
        dc = med[f"{h}/fused-reco"] - med[f"{h}/fused"]
        print(f"  {h}: tower-ckpt {'WINS' if dc > 0 else 'LOSES'} vs "
              f"recompute by {abs(dc)*1e3:.3f} ms/step", flush=True)
    print(f"  harness overhead (solver/xla - bench/xla): "
          f"{(med['solver/xla']-med['bench/xla'])*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:3]]
    main(*a)
