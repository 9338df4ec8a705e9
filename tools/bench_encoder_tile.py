"""A/B the fused encoder's batch tile nb on the real chip.

The backward runs on a (lead, batch) grid; nb=8 was adopted in round 4 as
the provably-fitting tile. Analytically nb=16 needs 43.3 MiB (L=1, bf16,
bwd) against the 100 MiB budget — but round 4 measured spill slots the
model cannot see, so the verdict needs the chip. A bigger tile halves the
per-lead weight-stream revisits and doubles the dots' lane width
(n = nb*128), which is where the kernel's ~45% executed-roofline sits.

Times the FULL production train step (Solver harness, bf16, B=32, K=64
scan-chained, RTT-subtracted) with make_fused_encode_fn(nb=...).

Usage: python tools/bench_encoder_tile.py [K=64]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_RTT = 0.0


def _time(fn, args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - _RTT, 1e-9)


def main(K=64):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.losses import loss_wrapper
    from electrocardio_panorama_tpu.ops.pallas.encoder_fused import (
        make_fused_encode_fn)
    from electrocardio_panorama_tpu.training.optim import get_optimizer
    from electrocardio_panorama_tpu.training.precision import (
        cast_floats, cast_floats_f32)

    K = int(K)
    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    cfg.TPU.compute_dtype = "bfloat16"
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = get_optimizer(cfg)
    opt_state = tx.init(params)

    global _RTT

    @jax.jit
    def _triv(x):
        return x + 1.0

    float(_triv(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(_triv(jnp.float32(0.0)))
    _RTT = (time.perf_counter() - t0) / 20
    print(f"  (tunnel rtt {_RTT*1e3:.1f} ms, subtracted; K={K})")

    B = 32
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    it = jnp.asarray(batch["input_theta"])
    tt = jnp.asarray(batch["target_theta"])
    rois = jnp.asarray(batch["rois"])
    tv = jnp.asarray(batch["target_view"])
    datas = jnp.asarray(
        np.stack([batch["data"] + 1e-4 * k for k in range(K)]), jnp.float32
    )
    castc = lambda t: cast_floats(t, jnp.bfloat16)  # noqa: E731
    rng0 = jax.random.PRNGKey(7)

    for nb in (8, 16, 32):
        enc_fn = make_fused_encode_fn(cfg.DATA.lead_num, cfg.MODEL.theta_L,
                                      nb=nb)

        def loss_and_bn(p, bn, d, _enc=enc_fn):
            pp, dd, itc, ttc = castc((p, d, it, tt))
            (out, sp, sl), new_bn = model.apply(
                pp, bn, dd, itc, ttc, rois, phase="train", rng=rng0,
                shuffle_idx=(0, 1), encode_fn=_enc)
            out, sp, sl = cast_floats_f32((out, sp, sl))
            new_bn = cast_floats_f32(new_bn)
            loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
            return loss, new_bn

        grad_fn = jax.value_and_grad(loss_and_bn, has_aux=True)

        @jax.jit
        def chain(p, bn, opt, ds, _g=grad_fn):
            def body(c, d):
                p, bn, opt = c
                (loss, new_bn), g = _g(p, bn, d)
                updates, opt = tx.update(g, opt, p)
                return (optax.apply_updates(p, updates), new_bn, opt), loss

            (_, _, _), ls = jax.lax.scan(body, (p, bn, opt), ds)
            return ls.sum()

        try:
            med = _time(chain, (params, bn_state, opt_state, datas)) / K
            print(f"  nb={nb:2d} FULL train step: {med*1e3:7.3f} ms/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — Mosaic VMEM verdicts print here
            print(f"  nb={nb:2d} FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
