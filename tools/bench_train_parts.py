"""Component cost breakdown of the training step on the real TPU.

Times forward+backward of nested sub-pipelines (encoder tower -> full encode
-> encode + 3 train-BN decodes -> full step incl. loss+SGD), K-chained with
per-step-varying operands (scan-hoisting trap) and a host scalar pull per
sample (tunnel RTT trap). Differences between successive rows locate the
train-step time, which decides where a training-mode Pallas kernel pays
(VERDICT round-2 item 1).

Usage: python tools/bench_train_parts.py [f32|bf16]
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


def main(mode="bf16"):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.encoder import encoder_apply
    from electrocardio_panorama_tpu.models.losses import loss_wrapper
    from electrocardio_panorama_tpu.models.nefnet import (
        _decode, encode_latents, query_gates)
    from electrocardio_panorama_tpu.training.optim import get_optimizer
    from electrocardio_panorama_tpu.training.precision import (
        cast_floats, cast_floats_f32)

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = get_optimizer(cfg)
    opt_state = tx.init(params)

    # tunnel RTT: subtract the fixed host<->device round trip so per-step
    # deltas are not inflated by rtt/K (~0.36 ms at K=64 on this tunnel)
    global _RTT

    @jax.jit
    def _triv(x):
        return x + 1.0

    float(_triv(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(_triv(jnp.float32(0.0)))
    _RTT = (time.perf_counter() - t0) / 20
    print(f"  (tunnel rtt {_RTT*1e3:.1f} ms, subtracted)")

    B, K = 32, 64
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    cdtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    mixed = cdtype != jnp.float32
    castc = lambda t: cast_floats(t, cdtype)  # noqa: E731

    data = jnp.asarray(batch["data"])
    it = jnp.asarray(batch["input_theta"])
    tt = jnp.asarray(batch["target_theta"])
    rois = jnp.asarray(batch["rois"])
    tv = jnp.asarray(batch["target_view"])
    # K distinct data perturbations defeat scan hoisting
    datas = jnp.stack([data + 1e-6 * k for k in range(K)])

    def run(name, grad_fn):
        @jax.jit
        def chain(p, ds):
            def body(c, d):
                return c + grad_fn(p, d), None
            acc, _ = jax.lax.scan(body, 0.0, ds)
            return acc

        med = _time(chain, (params, datas)) / K
        print(f"  {name:34s}: {med*1e3:7.3f} ms/step")
        return med

    rng0 = jax.random.PRNGKey(7)

    # ---- 1. encoder tower only (grouped resnet stem+layer1), fwd+bwd
    def tower_loss(p, d):
        if mixed:
            p, d = castc((p, d))
        w = encoder_apply(p, "W_encoder", d, lead_num=3, rng=rng0, train=True)
        return w.astype(jnp.float32).sum()

    run("encoder tower fwd+bwd", lambda p, d: jax.grad(tower_loss)(p, d)[
        "W_encoder.conv1.weight"].astype(jnp.float32).sum())

    # ---- 2. full encode (tower + gates + w/z convs + ROI + z2_conv2), fwd+bwd
    def encode_loss(p, d):
        if mixed:
            p, d, itc = castc((p, d, it))
        else:
            itc = it
        lat = encode_latents(p, d, itc, rois, lead_num=3, rng=rng0, train=True)
        return lat.latent_all.astype(jnp.float32).sum()

    run("full encode fwd+bwd", lambda p, d: jax.grad(encode_loss)(p, d)[
        "W_encoder.conv1.weight"].astype(jnp.float32).sum())

    # ---- 3. encode + three train-BN decodes, fwd+bwd
    def fwd3_loss(p, d):
        if mixed:
            p, d, itc, ttc = castc((p, d, it, tt))
        else:
            itc, ttc = it, tt
        lat = encode_latents(p, d, itc, rois, lead_num=3, rng=rng0, train=True)
        gate_q = query_gates(p, ttc)
        s = dict(bn_state)
        o1, u = _decode(p, s, lat.latent_all, gate_q, train=True)
        s.update(u)
        sp_all = jnp.concatenate(
            [jnp.take(lat.z1.reshape(B, 3, 128, 128), 0, axis=1), lat.z2_mean], axis=1)
        o2, u = _decode(p, s, sp_all, gate_q, train=True)
        s.update(u)
        sl_all = jnp.concatenate(
            [lat.z1_mean, jnp.take(lat.z2.reshape(B, 3, 128, 128), 1, axis=1)], axis=1)
        o3, u = _decode(p, s, sl_all, gate_q, train=True)
        return (o1.astype(jnp.float32).sum() + o2.astype(jnp.float32).sum()
                + o3.astype(jnp.float32).sum())

    # ---- 3b. encode + ONE train-BN decode (isolates the per-decode cost)
    def fwd1_loss(p, d):
        if mixed:
            p, d, itc, ttc = castc((p, d, it, tt))
        else:
            itc, ttc = it, tt
        lat = encode_latents(p, d, itc, rois, lead_num=3, rng=rng0, train=True)
        gate_q = query_gates(p, ttc)
        o1, _ = _decode(p, dict(bn_state), lat.latent_all, gate_q, train=True)
        return o1.astype(jnp.float32).sum()

    run("encode + 1 train decode fwd+bwd", lambda p, d: jax.grad(fwd1_loss)(p, d)[
        "W_encoder.conv1.weight"].astype(jnp.float32).sum())

    run("encode + 3 train decodes fwd+bwd", lambda p, d: jax.grad(fwd3_loss)(p, d)[
        "W_encoder.conv1.weight"].astype(jnp.float32).sum())

    # ---- 3c. forward + LOSS + grads, no optimizer/BN-EMA/scan-carried params
    def loss_only(p, d):
        if mixed:
            pp, dd, itc, ttc = castc((p, d, it, tt))
        else:
            pp, dd, itc, ttc = p, d, it, tt
        (out, sp, sl), new_bn = model.apply(
            pp, bn_state, dd, itc, ttc, rois, phase="train", rng=rng0,
            shuffle_idx=(0, 1))
        if mixed:
            out, sp, sl = cast_floats_f32((out, sp, sl))
        loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
        return loss

    run("fwd + loss + grads (no opt)", lambda p, d: jax.grad(loss_only)(p, d)[
        "W_encoder.conv1.weight"].astype(jnp.float32).sum())

    # ---- 3d. optimizer update alone (grads = params as a stand-in pytree)
    @jax.jit
    def opt_chain(p, opt, ks):
        def one(carry, k):
            p, opt = carry
            grads = jax.tree.map(lambda x: x * (1e-9 * (1 + k)), p)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt), updates[
                "W_encoder.conv1.weight"].astype(jnp.float32).sum()

        (_, _), ls = jax.lax.scan(one, (p, opt), ks)
        return ls.sum()

    med = _time(opt_chain, (params, opt_state, jnp.arange(K))) / K
    print(f"  {'SGD update alone (incl. fake grads)':34s}: {med*1e3:7.3f} ms/step")

    # ---- 4. full train step (forward + loss + grads + SGD update)
    @jax.jit
    def full_chain(p, bn, opt, ds):
        def one(carry, d):
            p, bn, opt = carry

            def loss_fn(pp):
                if mixed:
                    pp, dd, itc, ttc = castc((pp, d, it, tt))
                else:
                    dd, itc, ttc = d, it, tt
                (out, sp, sl), new_bn = model.apply(
                    pp, bn, dd, itc, ttc, rois, phase="train", rng=rng0,
                    shuffle_idx=(0, 1))
                if mixed:
                    out, sp, sl = cast_floats_f32((out, sp, sl))
                    new_bn = cast_floats_f32(new_bn)
                loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
                return loss, new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, new_opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), new_bn, new_opt), loss

        (_, _, _), losses = jax.lax.scan(one, (p, bn, opt), ds)
        return losses.sum()

    med = _time(full_chain, (params, bn_state, opt_state, datas)) / K
    print(f"  {'FULL train step':34s}: {med*1e3:7.3f} ms/step")

    # ---- 5. full step with the fused Pallas encoder (TPU.train_encoder)
    if mixed and jax.devices()[0].platform != "cpu":
        from electrocardio_panorama_tpu.ops.pallas.encoder_fused import (
            make_fused_encode_fn)

        ekw = {"encode_fn": make_fused_encode_fn(cfg.DATA.lead_num,
                                                 cfg.MODEL.theta_L)}

        @jax.jit
        def full_chain_fe(p, bn, opt, ds):
            def one(carry, d):
                p, bn, opt = carry

                def loss_fn(pp):
                    pp, dd, itc, ttc = castc((pp, d, it, tt))
                    (out, sp, sl), new_bn = model.apply(
                        pp, bn, dd, itc, ttc, rois, phase="train", rng=rng0,
                        shuffle_idx=(0, 1), **ekw)
                    out, sp, sl = cast_floats_f32((out, sp, sl))
                    new_bn = cast_floats_f32(new_bn)
                    loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
                    return loss, new_bn

                (loss, new_bn), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                updates, new_opt = tx.update(grads, opt, p)
                return (optax.apply_updates(p, updates), new_bn, new_opt), loss

            (_, _, _), losses = jax.lax.scan(one, (p, bn, opt), ds)
            return losses.sum()

        med = _time(full_chain_fe, (params, bn_state, opt_state, datas)) / K
        print(f"  {'FULL train step (fused encoder)':34s}: {med*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main(*sys.argv[1:])
