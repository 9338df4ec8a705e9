"""On-chip verification + timing of the fused Pallas ENCODER
(ops/pallas/encoder_fused.py) on the real TPU (axon).

Checks, in order (each prints its numbers):
  1. eval forward parity, f32: fused kernel vs the on-chip XLA encode path
     (encode_latents), which is itself parity-proven vs torch goldens
     (tests/test_model_parity.py). Expect corr ~1.0, max ~1e-6.
  2. eval forward, bf16: correlation vs the f32 XLA path (storage rounding
     only). Expect corr > 0.999.
  3. train forward + gradients, bf16, IDENTICAL pre-scaled dropout masks:
     fused kernel vs the mask-explicit XLA oracle (tests/test_pallas_encoder
     _mask_oracle) both ON CHIP in bf16. Reports per-key grad correlation
     (bf16 storage rounding bounds the match).
  4. full train-step timing at batch 32 bf16: TPU.train_encoder 'xla' vs
     'fused', K-chained with the measured tunnel RTT subtracted per sample
     (bench.py measurement rule).

Usage: python tools/verify_fused_encoder.py [K]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _load_oracle():
    root = _ROOT
    spec = importlib.util.spec_from_file_location(
        "enc_oracle", f"{root}/tests/test_pallas_encoder.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1]), float(np.abs(a - b).max())


def main(K=256):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.models.nefnet import encode_latents, init_nefnet
    from electrocardio_panorama_tpu.ops import angular_encode, linear, roi_reverse_1d
    from electrocardio_panorama_tpu.ops.pallas import encoder_fused as EF
    from electrocardio_panorama_tpu.ops.roi import roi_align_ramp

    print("devices:", jax.devices(), flush=True)
    rtt = _rtt(jax, jnp)
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    B, L = 32, 3
    params, bn_state = init_nefnet(jax.random.PRNGKey(0), lead_num=L)
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    x = jnp.asarray(batch["data"])
    it = jnp.asarray(batch["input_theta"])
    rois = jnp.asarray(batch["rois"]).astype(jnp.float32)

    # ---- 1. eval forward parity f32
    ref = jax.jit(
        lambda p: encode_latents(p, x, it, rois, lead_num=L, train=False)
    )(params)
    fn32 = EF.make_fused_encode_fn(L)
    lat32 = jax.jit(lambda p: fn32(p, x, it, rois, train=False))(params)
    for nm in ("z1", "z2", "latent_all"):
        c, m = _corr(getattr(lat32, nm), getattr(ref, nm))
        print(f"eval f32   {nm:10s}: corr {c:.9f}  max {m:.2e}", flush=True)

    # ---- 2. eval forward bf16
    pb = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, params
    )
    fnb = EF.make_fused_encode_fn(L)
    latb = jax.jit(
        lambda p: fnb(p, x.astype(jnp.bfloat16), it.astype(jnp.bfloat16),
                      rois, train=False)
    )(pb)
    for nm in ("z1", "z2", "latent_all"):
        c, m = _corr(getattr(latb, nm), getattr(ref, nm))
        print(f"eval bf16  {nm:10s}: corr {c:.6f}  max {m:.2e}", flush=True)

    # ---- 3. train grads bf16, identical masks, vs mask-explicit XLA oracle
    T = _load_oracle()
    m6, mc20, mc22 = EF.draw_masks(jax.random.PRNGKey(3), B, L, jnp.bfloat16)
    om = T._masks_model_layout(m6, mc20, mc22)  # stays bf16 (oracle runs bf16)
    xb, itb = x.astype(jnp.bfloat16), it.astype(jnp.bfloat16)

    def run_kernel(p):
        enc = angular_encode(itb, 1)
        gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])
        xph, gexp, ramp = EF.prep_encoder_inputs(xb, gate1, roi_align_ramp(rois))
        w = EF.pack_encoder_weights(p, L, jnp.bfloat16)
        z1k, z2gk = EF.encode_fused_train((L, 8, False), w, xph, gexp, ramp,
                                          m6, mc20, mc22)
        z1, z2g = EF.unpack_outputs(z1k, z2gk, L)
        z2 = roi_reverse_1d(z2g, rois)
        return z1.astype(jnp.float32), z2.astype(jnp.float32)

    def run_oracle(p):
        z1, z2r, _ = T._mask_oracle(p, xb, itb, rois, om, lead_num=L)
        return z1.astype(jnp.float32), z2r.astype(jnp.float32)

    t1 = jnp.asarray(rng.normal(0, 1, (B, 384, 128)), jnp.float32)

    def loss_of(run):
        def f(p):
            z1, z2 = run(p)
            return jnp.sum(z1 * t1) + jnp.sum(z2 * z2)
        return f

    zk = jax.jit(run_kernel)(pb)
    zo = jax.jit(run_oracle)(pb)
    for a, b, nm in zip(zk, zo, ("z1", "z2")):
        c, m = _corr(a, b)
        print(f"train fwd bf16 {nm:6s}: corr {c:.6f}  max {m:.2e}", flush=True)

    gk = jax.jit(jax.grad(loss_of(run_kernel)))(pb)
    go = jax.jit(jax.grad(loss_of(run_oracle)))(pb)
    worst = (None, 1.0)
    for k in sorted(gk):
        if k.split(".")[0] not in ("W_encoder", "w_conv", "z1_conv",
                                   "z2_conv1", "z2_conv2", "mlp1"):
            continue
        a, b = np.asarray(gk[k], np.float64), np.asarray(go[k], np.float64)
        if np.abs(b).max() == 0:
            continue
        c = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        if c < worst[1]:
            worst = (k, c)
        print(f"grad bf16 {k:42s}: corr {c:.6f}", flush=True)
    print(f"WORST grad corr: {worst[0]} {worst[1]:.6f}", flush=True)

    # ---- 4. train-step timing, batch 32 bf16, xla vs fused encoder
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.training.solver import Solver

    for mode in ("xla", "fused"):
        cfg = get_cfg()
        cfg.desc = "debug"
        cfg.MODEL.model = "model_nefnet"
        cfg.DATA.lead_num = 3
        cfg.DATA.batch_size = B
        cfg.TPU.compute_dtype = "bfloat16"
        cfg.TPU.train_encoder = mode
        cfg.output_dir = "/tmp/verify_fused_encoder"
        s = Solver(cfg, use_writer=False)
        p0, bn0 = s.model.init(jax.random.PRNGKey(0))
        opt0 = s.tx.init(p0)
        args = tuple(
            jnp.asarray(batch[k]) for k in
            ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
        )
        step = s._train_step

        def chain(p, bn, opt, key):
            def body(c, k):
                p, bn, opt = c
                p, bn, opt, losses = step(p, bn, opt, k, jnp.asarray(0),
                                          jnp.asarray(1), *args)
                return (p, bn, opt), losses[0]

            keys = jax.random.split(key, K)
            (_, _, _), ls = jax.lax.scan(body, (p, bn, opt), keys)
            return ls.sum()

        cj = jax.jit(chain)
        med = _time(cj, (p0, bn0, opt0, jax.random.PRNGKey(9)), rtt=rtt) / K
        print(f"train step bf16 B=32 encoder={mode:5s}: {med*1e3:.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
