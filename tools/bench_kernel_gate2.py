"""Gate-stage variant for the dot-fused decoder kernel: broadcast multiply
instead of an explicit pltpu.repeat latent copy.

The fresh stage profile (tools/bench_kernel_pp_stages.py, 2026-08-18) puts
the gate stage at 2.09 ms/launch. Its VPU traffic per program is three
[VT*256, 128] images: the repeated latent (pltpu.repeat — an explicit ~1 MB
VMEM copy), the selector product p1g, and the gated output h. This variant
removes the explicit repeat by computing h as a BATCHED broadcast multiply

    h3[v] = lat[None] * gcol3[v]     (lat [256,128] bf16, gcol3 [vt,256,1])

so Mosaic can fuse the latent broadcast into the multiply instead of
materializing a repeated copy first. Everything downstream is unchanged;
outputs must be bitwise-equal to production (same products, same order).

Usage: python tools/bench_kernel_gate2.py [K] [reps]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(k=32, reps=5):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import electrocardio_panorama_tpu.ops.pallas.decoder_fused as df
    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates

    FEAT, SEQ, QW = df.FEAT, df.SEQ, df.SEQ // 4

    def kernel_v2(latent_ref, gpack_ref, m1_ref, m2_ref, ones_ref,
                  selw_ref, u1eo_ref, abm_ref, c01_ref, c23_ref,
                  w1, b1, w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
                  out_ref, *, vt: int, storage_dtype):
        od = storage_dtype

        def brep(vec):
            return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)

        def r3(h2, c):
            return h2.astype(od).reshape(vt, c, h2.shape[1])

        def wb(w2d):
            return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

        zc = jnp.zeros((vt * 128, 1), od)

        # ---- gate stage, variant: batched broadcast multiply, no lat repeat
        p1g = df._dot2_vc(m1_ref[:], gpack_ref[0, 0].astype(od)).astype(od)
        gcol = df._dot2_vc(p1g * m2_ref[:], ones_ref[:, :8]).astype(od)
        gc3 = gcol[:, 0:1].reshape(vt, 256, 1)
        lat3 = jnp.broadcast_to(latent_ref[0].astype(od)[None], (vt, 256, FEAT))
        h3 = lat3 * gc3                                           # [vt,256,128]

        # ---- rest identical to production _decoder_kernel_pp
        acc = None
        for kk in range(3):
            g = df._bdot_vc(wb(w1[kk]), h3).astype(od)
            y = df._bdot_vc(g, wb(u1eo_ref[kk]))
            acc = y if acc is None else acc + y
        Y = jnp.maximum(acc.reshape(vt * 128, 256) + brep(b1[:]), 0.0).astype(od)

        e, o = Y[:, :FEAT], Y[:, FEAT:]
        X0 = jnp.concatenate([zc, o[:, :FEAT - 1], e], axis=1)
        X2 = jnp.concatenate([o, e[:, 1:], zc], axis=1)
        ce_co = (df._bdot_vc(wb(w2[0]), r3(X0, 128))
                 + df._bdot_vc(wb(w2[1]), r3(Y, 128))
                 + df._bdot_vc(wb(w2[2]), r3(X2, 128)))
        Y = jnp.maximum(ce_co.reshape(vt * 128, 256) + brep(b2[:]), 0.0).astype(od)

        e, o = Y[:, :FEAT], Y[:, FEAT:]
        om = jnp.concatenate([zc, o[:, :FEAT - 1]], axis=1)
        ep = jnp.concatenate([e[:, 1:], zc], axis=1)
        e3, o3, om3, ep3 = r3(e, 128), r3(o, 128), r3(om, 128), r3(ep, 128)
        AB = [wb(abm_ref[kk]) for kk in range(3)]
        PL = df._bdot_vc(AB[0], om3) + df._bdot_vc(AB[1], e3) + df._bdot_vc(AB[2], o3)
        PR = df._bdot_vc(AB[0], e3) + df._bdot_vc(AB[1], o3) + df._bdot_vc(AB[2], ep3)
        xb0 = jnp.concatenate(
            [e[:, 0:1], jnp.zeros((vt * 128, 7), od)], axis=1).reshape(vt, 128, 8)
        xb1 = jnp.concatenate(
            [o[:, QW - 1:QW], jnp.zeros((vt * 128, 7), od)], axis=1
        ).reshape(vt, 128, 8)
        corrL = df._bdot_vc(wb(c01_ref[:]), xb0).reshape(vt * 128, 8)
        corrR = df._bdot_vc(wb(c23_ref[:]), xb1).reshape(vt * 128, 8)
        z127 = jnp.zeros((vt * 128, QW - 1), jnp.float32)
        PL = PL.reshape(vt * 128, QW) + jnp.concatenate([corrL[:, 0:1], z127], axis=1)
        PR = PR.reshape(vt * 128, QW) + jnp.concatenate([z127, corrR[:, 0:1]], axis=1)
        bb = brep(b3_2d[:])
        PL = jnp.maximum(PL + bb, 0.0).astype(od)
        PR = jnp.maximum(PR + bb, 0.0).astype(od)

        PRs, PLs = df._shiftR_vc(PR), df._shiftL_vc(PL)
        PL3, PR3 = r3(PL, 128), r3(PR, 128)
        PRs3, PLs3 = r3(PRs, 128), r3(PLs, 128)
        q0 = df._bdot_vc(wb(w4a[:]), PL3) + df._bdot_vc(wb(w4b[:]), PRs3)
        q1 = df._bdot_vc(wb(w4c[:]), PL3) + df._bdot_vc(wb(w4d[:]), PR3)
        q2 = df._bdot_vc(wb(w4b[:]), PL3) + df._bdot_vc(wb(w4a[:]), PR3)
        q3 = df._bdot_vc(wb(w4c[:]), PR3) + df._bdot_vc(wb(w4d[:]), PLs3)
        bb = pltpu.repeat(b4[:].reshape(-1, 1), vt, axis=0)
        q0 = jnp.maximum(q0.reshape(vt * 64, QW) + bb, 0.0)
        q1 = jnp.maximum(q1.reshape(vt * 64, QW) + bb, 0.0)
        q2 = jnp.maximum(q2.reshape(vt * 64, QW) + bb, 0.0)
        q3 = jnp.maximum(q3.reshape(vt * 64, QW) + bb, 0.0)

        Q1 = jnp.concatenate([q0, q1, q2, q3], axis=1).astype(od)
        q3m = df._shiftR_vc(q3.astype(od))
        q0p = df._shiftL_vc(q0.astype(od))
        Q0 = jnp.concatenate([q3m, Q1[:, : 3 * QW]], axis=1)
        Q2 = jnp.concatenate([Q1[:, QW:], q0p], axis=1)
        out = (df._dot2_vc(selw_ref[0], Q0) + df._dot2_vc(selw_ref[1], Q1)
               + df._dot2_vc(selw_ref[2], Q2)) + b5_2d[:]
        out_ref[0] = jax.nn.sigmoid(out / 3.0).astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("v_tile",))
    def decode_v2(folded, latent_all, gates, *, v_tile=16):
        B, V = gates.shape[0], gates.shape[1]
        dtype = folded["w1"].dtype
        latent_all = latent_all.astype(jnp.float32)
        gates = gates.astype(jnp.float32)
        pad = (-V) % v_tile
        if pad:
            gates = jnp.concatenate(
                [gates, jnp.zeros((B, pad, gates.shape[2]), gates.dtype)], axis=1)
        Vp = V + pad
        n_vt = Vp // v_tile
        gpack = gates.reshape(B, n_vt, v_tile * 2, 128)
        selw = df.conv5_selectors(v_tile, folded["w5"], dtype)
        u1eo, ab_m, c01, c23, b3_2, w4a, w4b, w4c, w4d = df.dotfuse_operands(folded)
        m1, m2, ones128 = df.gate_expand_selectors(v_tile, dtype)
        kernel = functools.partial(kernel_v2, vt=v_tile, storage_dtype=dtype)
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
        out = pl.pallas_call(
            kernel,
            grid=(B, n_vt),
            in_specs=[
                pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, v_tile * 2, 128), lambda b, v: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec((1, v_tile, SEQ), lambda b, v: (b, v, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Vp, SEQ), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
        )(
            latent_all, gpack, m1, m2, ones128, selw, u1eo, ab_m, c01, c23,
            folded["w1"], folded["b1"], folded["w2"], folded["b2"], b3_2,
            w4a, w4b, w4c, w4d, folded["b4"],
            folded["b5"].reshape(1, 1),
        )
        out = out.reshape(B, Vp, 4, QW).transpose(0, 1, 3, 2).reshape(B, Vp, SEQ)
        return out[:, :V] if pad else out

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    B, V, K = 32, 336, int(k)
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    fargs = (jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
             jnp.asarray(batch["rois"]))
    vstack = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32))
    folded = df.fold_decoder_bn(params, bn_state, dtype=jnp.bfloat16)

    triv = jax.jit(lambda x: x + 1.0)
    float(triv(jnp.float32(0.0)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt {rtt*1e3:.1f} ms  B={B} V={V} K={K}")

    latent = model.encode(params, *fargs).latent_all.astype(jnp.bfloat16)
    gates = query_gates(params, vstack[0]).astype(jnp.bfloat16)
    ref = np.asarray(df.fused_decode_views(folded, latent, gates, v_tile=16))
    out = np.asarray(decode_v2(folded, latent, gates, v_tile=16))
    mx = np.abs(out - ref).max()
    print(f"gate-v2 vs production: max|d| {mx:.2e} "
          f"({'bitwise' if mx == 0 else 'NOT bitwise'})")

    def bench(decode_fn, name):
        @jax.jit
        def chain(p, f, data, input_theta, rois, vs):
            lat = model.encode(p, data, input_theta, rois).latent_all
            lat = lat.astype(jnp.bfloat16)

            def body(carry, v):
                g = query_gates(p, v).astype(jnp.bfloat16)
                o = decode_fn(f, lat, g, v_tile=16)
                return carry + o.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

        args = (params, folded, *fargs, vstack)
        float(chain(*args))
        ts = []
        for _ in range(int(reps)):
            t0 = time.perf_counter()
            float(chain(*args))
            ts.append(time.perf_counter() - t0)
        med = max(float(np.median(ts)) - rtt, 1e-9)
        print(f"{name:12s}: {K * B * V / med:11.1f} views/s ({med/K*1e3:6.3f} ms/launch)")

    bench(df.fused_decode_views, "production")
    bench(decode_v2, "gate-v2")


if __name__ == "__main__":
    main(*sys.argv[1:])
