"""Decompose the train step's post-gradient tail on the real TPU.

bench_train_parts r5 shows FULL step (fused enc) 2.563 ms vs
fwd+loss+grads 2.190 ms — a ~0.4-0.6 ms tail for SGD-momentum +
BN-EMA carry on a 7.6M-param / 53-leaf tree whose bandwidth floor is
~0.19 ms (5 x 30.5 MB f32 at ~800 GB/s). This tool answers WHERE the tail
goes and whether a flat-buffer momentum (one fused elementwise kernel
instead of 53) pays:

  1. backward-only chain: grads consumed by a scalar sum, params carried
     unchanged — the honest fwd+loss+grads cost (nothing DCE-able).
  2. + SGD-momentum update (the production tail) = baseline full step.
  3. + plain SGD (no momentum): removes 60 MB/step of momentum traffic.
  4. + flat momentum: grads raveled+concatenated into ONE [7.6M] vector,
     momentum held flat, per-leaf slices applied to params. More traffic
     (concat + slice-back) but 1 momentum kernel instead of 53.

Usage: python tools/bench_opt_tail.py [K=64]
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
    momentum = 0.9  # training/optim.py: SGD is optax.sgd(momentum=0.9)
    lr = float(cfg.SOLVER.lr)

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
    enc_fn = make_fused_encode_fn(cfg.DATA.lead_num, cfg.MODEL.theta_L)

    def loss_and_bn(p, bn, d):
        pp, dd, itc, ttc = castc((p, d, it, tt))
        (out, sp, sl), new_bn = model.apply(
            pp, bn, dd, itc, ttc, rois, phase="train", rng=rng0,
            shuffle_idx=(0, 1), encode_fn=enc_fn)
        out, sp, sl = cast_floats_f32((out, sp, sl))
        new_bn = cast_floats_f32(new_bn)
        loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
        return loss, new_bn

    grad_fn = jax.value_and_grad(loss_and_bn, has_aux=True)

    def run(name, one):
        @jax.jit
        def chain(p, bn, opt, m, ds):
            def body(c, d):
                return one(c, d)

            (_, _, _, _), ls = jax.lax.scan(body, (p, bn, opt, m), ds)
            return ls.sum()

        m0 = jax.tree.map(jnp.zeros_like, params)
        med = _time(chain, (params, bn_state, opt_state, m0, datas)) / K
        print(f"  {name:36s}: {med*1e3:7.3f} ms/step")
        return med

    # 1. backward only: grads reduced to a scalar, params NOT updated —
    # consume every grad leaf so nothing is DCE-able
    def bwd_only(c, d):
        p, bn, opt, m = c
        (loss, new_bn), g = grad_fn(p, bn, d)
        gs = sum(x.sum() for x in jax.tree.leaves(g))
        return (p, new_bn, opt, m), loss + gs * 1e-20

    run("fwd+loss+grads (all leaves, no opt)", bwd_only)

    # 2. production: optax SGD-momentum via tx.update
    def full_optax(c, d):
        import optax

        p, bn, opt, m = c
        (loss, new_bn), g = grad_fn(p, bn, d)
        updates, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, updates), new_bn, opt, m), loss

    base = run("+ optax SGD-momentum (production)", full_optax)

    # 3. plain SGD, hand-rolled: p -= lr*g (no momentum traffic)
    def plain_sgd(c, d):
        p, bn, opt, m = c
        (loss, new_bn), g = grad_fn(p, bn, d)
        p = jax.tree.map(lambda a, b: a - lr * b, p, g)
        return (p, bn if new_bn is None else new_bn, opt, m), loss

    run("+ plain SGD (no momentum)", plain_sgd)

    # 4. hand-rolled momentum as a pytree (same math as optax trace)
    def tree_momentum(c, d):
        p, bn, opt, m = c
        (loss, new_bn), g = grad_fn(p, bn, d)
        m = jax.tree.map(lambda mm, gg: momentum * mm + gg, m, g)
        p = jax.tree.map(lambda a, mm: a - lr * mm, p, m)
        return (p, new_bn, opt, m), loss

    run("+ hand momentum (pytree)", tree_momentum)

    # 5. flat momentum: one [N] vector; concat grads, slice updates back
    leaves = jax.tree.leaves(params)
    sizes = [int(np.prod(x.shape)) for x in leaves]
    offs = np.cumsum([0] + sizes)

    def flat_momentum(c, d):
        p, bn, opt, m = c  # m: flat [N]
        (loss, new_bn), g = grad_fn(p, bn, d)
        gl, tdef = jax.tree.flatten(g)
        gflat = jnp.concatenate([x.ravel() for x in gl])
        m = momentum * m + gflat
        pl = jax.tree.leaves(p)
        pl = [a - lr * jax.lax.dynamic_slice(m, (int(o),), (s,)).reshape(a.shape)
              for a, o, s in zip(pl, offs[:-1], sizes)]
        p = jax.tree.unflatten(jax.tree.structure(p), pl)
        return (p, new_bn, opt, m), loss

    @jax.jit
    def chain_flat(p, bn, opt, m, ds):
        (_, _, _, _), ls = jax.lax.scan(
            lambda c, d: flat_momentum(c, d), (p, bn, opt, m), ds)
        return ls.sum()

    mflat = jnp.zeros((int(offs[-1]),), jnp.float32)
    med = _time(chain_flat, (params, bn_state, opt_state, mflat, datas)) / K
    print(f"  {'+ flat momentum (one [N] vector)':36s}: {med*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main(*sys.argv[1:])
