"""Measure the encode stage's share of the fused panorama path, and the
effect of running the encode itself in bf16 (params cast, native-MXU convs).

Also reports end-to-end waveform correlation of the bf16-encode pipeline vs
the all-f32 pipeline, so the speed/precision trade is explicit.

Usage: python tools/bench_encode_share.py
"""

from __future__ import annotations

import time

import numpy as np


def _time(fn, args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates
    from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
        fold_decoder_bn,
        fused_decode_views,
    )

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))

    B, V, K = 32, 336, 8
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    data = jnp.asarray(batch["data"])
    input_theta = jnp.asarray(batch["input_theta"])
    rois = jnp.asarray(batch["rois"])
    vstack = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32))

    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    params_bf16 = cast(params)

    # ---- encode alone, K-chained (f32 vs bf16 params/inputs)
    @jax.jit
    def enc_f32(p, d, it, r):
        def body(c, _):
            lat = model.encode(p, d, it, r).latent_all
            return c + lat.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
        return acc

    @jax.jit
    def enc_bf16(p, d, it, r):
        def body(c, _):
            lat = model.encode(p, d.astype(jnp.bfloat16), it.astype(jnp.bfloat16), r).latent_all
            return c + lat.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
        return acc

    t_enc_f32 = _time(enc_f32, (params, data, input_theta, rois)) / K
    t_enc_bf16 = _time(enc_bf16, (params_bf16, data, input_theta, rois)) / K

    # ---- full fused path with each encode flavor (bf16 storage decode)
    folded = fold_decoder_bn(params, bn_state, dtype=jnp.bfloat16)

    def full(pe, encode_dtype):
        @jax.jit
        def chain(p, f, d, it, r, vs):
            lat = model.encode(
                p, d.astype(encode_dtype), it.astype(encode_dtype), r
            ).latent_all.astype(jnp.bfloat16)

            def body(c, v):
                # use the jitted argument p (NOT the outer f32 params): the
                # closure would bake f32 gates into the "bf16 encode" timing
                g = query_gates(p, v).astype(jnp.bfloat16)
                out = fused_decode_views(f, lat, g, v_tile=16)
                return c + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc
        return _time(chain, (pe, folded, data, input_theta, rois, vstack))

    t_full_f32enc = full(params, jnp.float32)
    t_full_bf16enc = full(params_bf16, jnp.bfloat16)

    # ---- correlation: full pipeline bf16-encode vs all-f32 reference
    # 84 views (the paper's panorama grid): the full-V XLA decode materializes
    # [B*V, 256..128, 128..512] intermediates and exhausts HBM
    v1 = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, 84, 2)).astype(np.float32))
    lat_f32 = model.encode(params, data, input_theta, rois).latent_all
    ref = np.asarray(model.decode_views(params, bn_state, lat_f32, v1)).ravel()
    lat_b = model.encode(
        params_bf16, data.astype(jnp.bfloat16), input_theta.astype(jnp.bfloat16), rois
    ).latent_all.astype(jnp.bfloat16)
    g1 = query_gates(params, v1).astype(jnp.bfloat16)
    out_b = np.asarray(fused_decode_views(folded, lat_b, g1, v_tile=16)).ravel()
    corr = float(np.corrcoef(ref, out_b)[0, 1])

    views = K * B * V / K  # per launch
    print(f"encode f32 : {t_enc_f32*1e3:8.3f} ms/launch")
    print(f"encode bf16: {t_enc_bf16*1e3:8.3f} ms/launch")
    print(f"full fused (bf16 decode) + f32 encode : {t_full_f32enc*1e3:8.3f} ms "
          f"({K*B*V/t_full_f32enc:,.0f} views/s)  encode share ~{100*K*t_enc_f32/t_full_f32enc:.1f}%")
    print(f"full fused (bf16 decode) + bf16 encode: {t_full_bf16enc*1e3:8.3f} ms "
          f"({K*B*V/t_full_bf16enc:,.0f} views/s)  encode share ~{100*K*t_enc_bf16/t_full_bf16enc:.1f}%")
    print(f"end-to-end correlation (bf16 encode + bf16 fused decode vs all-f32): {corr:.6f}")


if __name__ == "__main__":
    main()
