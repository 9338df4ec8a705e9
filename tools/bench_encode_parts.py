"""Fine-grained cost breakdown of encode_latents (the z-convs/ROI block) on
the real TPU — fwd+bwd, K-chained, mixed precision like the Solver.

bench_train_parts.py locates ~1.0 ms of the 2.3 ms train step in "full encode
minus tower"; this tool splits that region into its five components so the
next optimization targets the right one. Row DIFFERENCES are the component
costs (and cancel tunnel RTT).

Usage: python tools/bench_encode_parts.py [f32|bf16] [K] [reps] [only_stage]
(K defaults to 256 — sized so per-step tunnel RTT is negligible; for a CPU
smoke run pass a small K and only_stage=reverse, which exercises the whole
pipeline in one compile.)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _time(fn, args, reps=5):
    reps = int(reps)
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(mode="bf16", k=256, reps=5, only_stage=""):
    import os

    import jax

    # the axon sitecustomize pins jax_platforms="axon,cpu" regardless of the
    # env var; honor an explicit JAX_PLATFORMS=cpu so smoke runs don't hang
    # on backend init when the TPU tunnel is unreachable
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.blocks import model_block
    from electrocardio_panorama_tpu.models.encoder import encoder_apply
    from electrocardio_panorama_tpu.models.nefnet import (
        ALIGN_SIZE, FEAT_LEN, ROI_SEGMENTS, SPATIAL_SCALE)
    from electrocardio_panorama_tpu.ops import (
        angular_encode, conv_transpose1d_k2s2, linear, roi_align_1d,
        roi_reverse_1d)
    from electrocardio_panorama_tpu.training.precision import cast_floats

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))

    B, K, L = 32, int(k), 3
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    cdtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    mixed = cdtype != jnp.float32

    data = jnp.asarray(batch["data"])
    it = jnp.asarray(batch["input_theta"])
    rois = jnp.asarray(batch["rois"])
    datas = jnp.stack([data + 1e-6 * k for k in range(K)])
    rng0 = jax.random.PRNGKey(7)

    def run(name, upto):
        # upto: tower < wconv < zconv < align < z2conv2 < reverse
        def loss(p, d):
            if mixed:
                p, d, itc = cast_floats((p, d, it), cdtype)
            else:
                itc = it
            rngs = jax.random.split(rng0, 8)
            w = encoder_apply(p, "W_encoder", d, lead_num=L, rng=rngs[0],
                              train=True)
            if upto == "tower":
                return w.astype(jnp.float32).sum()
            enc = angular_encode(itc, 1)
            gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])
            w = (w.reshape(B, L, 128, FEAT_LEN) * gate1[..., None]).reshape(
                B, 128 * L, FEAT_LEN)
            w = model_block(p, "w_conv.0", w, groups=L, rng=rngs[1], train=True)
            if upto == "wconv":
                return w.astype(jnp.float32).sum()
            w4 = w.reshape(B, L, 128, FEAT_LEN)
            z1 = w4[:, :, :64].reshape(B, 64 * L, FEAT_LEN)
            z2 = w4[:, :, 64:].reshape(B, 64 * L, FEAT_LEN)
            z1 = model_block(p, "z1_conv.0", z1, groups=L, rng=rngs[2], train=True)
            z2 = model_block(p, "z2_conv1.0", z2, groups=L, rng=rngs[3], train=True)
            if upto == "zconv":
                return (z1.astype(jnp.float32).sum()
                        + z2.astype(jnp.float32).sum())
            a = roi_align_1d(z2, rois, size=ALIGN_SIZE, spatial_scale=SPATIAL_SCALE)
            a = a.reshape(B, 128 * L * ROI_SEGMENTS, ALIGN_SIZE)
            if upto == "align":
                return (z1.astype(jnp.float32).sum()
                        + a.astype(jnp.float32).sum())
            G7 = ROI_SEGMENTS * L
            a = model_block(p, "z2_conv2.0", a, groups=G7, rng=rngs[4], train=True)
            a = conv_transpose1d_k2s2(a, p["z2_conv2.1.weight"],
                                      p["z2_conv2.1.bias"], groups=G7)
            a = model_block(p, "z2_conv2.2", a, groups=G7, rng=rngs[5], train=True)
            if upto == "z2conv2":
                return (z1.astype(jnp.float32).sum()
                        + a.astype(jnp.float32).sum())
            z2g = a.reshape(B, 128 * L, ROI_SEGMENTS, 2 * ALIGN_SIZE)
            z2 = roi_reverse_1d(z2g, rois, spatial_scale=SPATIAL_SCALE,
                                out_len=FEAT_LEN)
            z1_mean = z1.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
            z2_mean = z2.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
            return (z1_mean.astype(jnp.float32).sum()
                    + z2_mean.astype(jnp.float32).sum())

        def grad_scalar(p, d):
            return jax.grad(loss)(p, d)["W_encoder.conv1.weight"].astype(
                jnp.float32).sum()

        @jax.jit
        def chain(p, ds):
            def body(c, d):
                return c + grad_scalar(p, d), None
            acc, _ = jax.lax.scan(body, 0.0, ds)
            return acc

        med = _time(chain, (params, datas), reps=reps) / K
        print(f"  through {name:8s}: {med*1e3:7.3f} ms/step fwd+bwd", flush=True)
        return med

    print(f"encode breakdown mode={mode} B={B} K={K} "
          f"(row DIFFERENCES are the component costs; RTT cancels)", flush=True)
    prev = 0.0
    stages = ("tower", "wconv", "zconv", "align", "z2conv2", "reverse")
    for upto in ((only_stage,) if only_stage else stages):
        med = run(upto, upto)
        if prev:
            print(f"      +{(med-prev)*1e3:6.3f} ms = {upto}", flush=True)
        prev = med


if __name__ == "__main__":
    main(*sys.argv[1:])
