"""On-chip verify + A/B for the tower-checkpoint encoder backward.

Built for a flaky tunnel: every result is appended to /tmp/ckpt_verify.jsonl
as soon as it lands, so a mid-run stall still leaves the completed stages on
disk.

Stages (one process, serialized TPU work):
  1. e2e: two Solver train steps at batch 32 bf16 with TPU.encoder_ckpt=True
     (the production default) — proves the checkpointed backward runs on the
     real chip inside the full training step and produces a finite loss.
  2. parity: grads of the fused encode (ckpt=True vs ckpt=False) on chip —
     the CPU interpret-mode test pins bitwise equality; here we re-check on
     hardware (exact equality expected: same kernel code produced the
     checkpointed values the recompute would rebuild).
  3. ab: Solver._train_step timing, K-step scan chain, interleaved reps, for
     xla / fused-ckpt / fused-recompute.

Usage: python tools/verify_encoder_ckpt.py [K] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

OUT = "/tmp/ckpt_verify.jsonl"


def emit(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main(K=128, reps=5):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.training.solver import Solver

    emit({"stage": "init", "devices": str(jax.devices())})

    B = 32
    batch = _synth_batch(np.random.default_rng(0), B=B)
    args = tuple(
        jnp.asarray(batch[k]) for k in
        ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )

    def make_solver(enc_mode, ckpt):
        cfg = get_cfg()
        cfg.desc = "debug"
        cfg.MODEL.model = "model_nefnet"
        cfg.DATA.lead_num = 3
        cfg.DATA.batch_size = B
        cfg.TPU.compute_dtype = "bfloat16"
        cfg.TPU.train_encoder = enc_mode
        cfg.TPU.encoder_ckpt = ckpt
        cfg.output_dir = "/tmp/verify_encoder_ckpt"
        s = Solver(cfg, use_writer=False)
        p0, bn0 = s.model.init(jax.random.PRNGKey(0))
        opt0 = s.tx.init(p0)
        return s, (p0, bn0, opt0)

    # ---- stage 1: two real train steps under the production default
    s, (p, bn, opt) = make_solver("fused", True)
    key = jax.random.PRNGKey(7)
    loss = None
    for i in range(2):
        p, bn, opt, losses = s._train_step(
            p, bn, opt, key, jnp.asarray(i), jnp.asarray(0), jnp.asarray(1),
            *args)
        loss = float(losses[0])
    assert np.isfinite(loss), loss
    emit({"stage": "e2e", "steps": 2, "loss": loss, "ok": True})

    # ---- stage 2: on-chip grad parity ckpt vs recompute
    import electrocardio_panorama_tpu.ops.pallas.encoder_fused as EF
    from electrocardio_panorama_tpu.models.nefnet import angular_encode, linear
    from electrocardio_panorama_tpu.ops.roi import roi_align_ramp

    L = 3
    params, _ = s.model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(batch["data"], jnp.bfloat16)
    thetas = jnp.asarray(batch["input_theta"])
    m6, mc20, mc22 = EF.draw_masks(jax.random.PRNGKey(3), B, L, jnp.bfloat16)
    enc = angular_encode(thetas, 1)
    gate1 = linear(enc, params["mlp1.weight"].astype(jnp.bfloat16),
                   params["mlp1.bias"].astype(jnp.bfloat16))
    xph, gexp, ramp = EF.prep_encoder_inputs(x, gate1,
                                             roi_align_ramp(batch["rois"]))
    w = EF.pack_encoder_weights(params, L, jnp.bfloat16)

    def run(ckpt):
        def f(wa, g):
            z1, z2g = EF.encode_fused_train((L, 8, False, ckpt), wa, xph, g,
                                            ramp, m6, mc20, mc22)
            return (jnp.sum(z1.astype(jnp.float32) * 1.3)
                    + jnp.sum(z2g.astype(jnp.float32) ** 2))

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(w, gexp)

    v0, (gw0, gg0) = run(False)
    for mode in ("tower", "full"):
        v1, (gw1, gg1) = run(mode)
        dmax = max(float(jnp.max(jnp.abs(gw0[k].astype(jnp.float32)
                                         - gw1[k].astype(jnp.float32))))
                   for k in gw0)
        dg = float(jnp.max(jnp.abs(gg0.astype(jnp.float32)
                                   - gg1.astype(jnp.float32))))
        emit({"stage": "parity", "mode": mode, "v_ckpt": float(v1),
              "v_reco": float(v0), "grad_w_maxdiff": dmax,
              "grad_g_maxdiff": dg,
              "ok": bool(dmax == 0.0 and dg == 0.0 and float(v0) == float(v1))})

    # ---- stage 3: interleaved Solver-harness timing
    progs = {}
    for name, (mode, ckpt) in {
        "xla": ("xla", False),
        "fused-ckpt": ("fused", "tower"),
        "fused-full": ("fused", "full"),
        "fused-reco": ("fused", False),
    }.items():
        sv, (p0, bn0, opt0) = make_solver(mode, ckpt)
        step = sv._train_step

        def chain(p, bn, opt, key, _step=step):
            def body(c, k):
                p, bn, opt = c
                p, bn, opt, losses = _step(p, bn, opt, key, k, jnp.asarray(0),
                                           jnp.asarray(1), *args)
                return (p, bn, opt), losses[0]

            (_, _, _), ls = jax.lax.scan(
                body, (p, bn, opt), jnp.arange(K, dtype=jnp.int32))
            return ls.sum()

        progs[name] = (jax.jit(chain), (p0, bn0, opt0, jax.random.PRNGKey(9)))

    # rtt
    triv = jax.jit(lambda x: (x * 2).sum())
    x0 = jnp.ones((8, 128))
    float(triv(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x0))
    rtt = (time.perf_counter() - t0) / 10
    emit({"stage": "rtt", "ms": round(rtt * 1e3, 2)})

    for name, (fn, a0) in progs.items():
        t0 = time.perf_counter()
        float(fn(*a0))
        emit({"stage": "compile", "name": name,
              "s": round(time.perf_counter() - t0, 1)})

    times = {n: [] for n in progs}
    for r in range(reps):
        for name, (fn, a0) in progs.items():
            t0 = time.perf_counter()
            float(fn(*a0))
            dt = (time.perf_counter() - t0 - rtt) / K
            times[name].append(dt * 1e3)
            emit({"stage": "rep", "name": name, "rep": r,
                  "ms_per_step": round(dt * 1e3, 4)})

    med = {n: round(float(np.median(v)), 4) for n, v in times.items()}
    emit({"stage": "verdict", "median_ms_per_step": med,
          "ckpt_vs_reco_ms": round(med["fused-reco"] - med["fused-ckpt"], 4),
          "full_vs_ckpt_ms": round(med["fused-ckpt"] - med["fused-full"], 4),
          "ckpt_vs_xla_ms": round(med["xla"] - med["fused-ckpt"], 4)})


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
