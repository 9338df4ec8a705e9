"""Per-stage cost breakdown of the POLYPHASE (layout-B, packed-gate) decoder
kernel on the real TPU — the production bf16 path since the polyphase adoption.

Same method as bench_kernel_stages.py (which profiles the layout-A kernel):
truncated kernel variants stop after stage k and reduce the live activation
into the output block so nothing is DCE'd; successive row DIFFERENCES are the
per-stage costs (differences also cancel the axon tunnel RTT exactly).

Stages: empty (DMA + fixed cost) -> gate -> upconv1 -> conv2 -> upconv2
        -> conv4 -> conv5 (= the full production kernel body).

Usage: python tools/bench_kernel_pp_stages.py [v_tile]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(v_tile=16):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from electrocardio_panorama_tpu.ops.pallas import decoder_fused as df

    dtype = jnp.bfloat16
    vt = int(v_tile)
    B, V, K = 32, 336, 8
    FEAT, SEQ, QW = df.FEAT, df.SEQ, df.QW
    n_vt = V // vt

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(B, 256, FEAT)).astype(np.float32))
    # K DISTINCT gate stacks (a loop-invariant operand lets XLA hoist the
    # pallas_call out of the scan — the "K launches" collapse to one)
    gates_k = jnp.asarray(rng.normal(size=(K, B, V, 256)).astype(np.float32))

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    folded = df.fold_decoder_bn(params, bn_state, dtype=dtype)

    selw = df.conv5_selectors(vt, folded["w5"], dtype)
    u1e, u1o, ab3, c3 = df.polyphase_matrices(folded)
    m1, m2, ones128 = df.gate_expand_selectors(vt, dtype)

    STAGES = ["empty", "gate", "upconv1", "conv2", "upconv2", "conv4", "conv5"]

    def kernel(latent_ref, gpack_ref, m1_ref, m2_ref, ones_ref,
               selw_ref, u1e_ref, u1o_ref, ab3_ref, c3_ref,
               w1, b1, w2, b2, b3r, w4, b4, b5_2d,
               out_ref, *, stop: str):
        od = dtype

        def emit(*planes):
            # keep the truncated pipeline live: reduce each live plane into
            # the output block (sublane reduce then a [1, N] sum — the only
            # reduction shapes this Mosaic toolchain accepts); planes may
            # have different shapes, so each reduces to a scalar on its own
            total = 0.0
            for plane in planes:
                red = jnp.sum(plane.astype(jnp.float32), axis=0, keepdims=True)
                total = total + red.sum()
            out_ref[0] = jnp.zeros((vt, SEQ), jnp.float32) + total

        def brep(vec):
            return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)

        def r3(h2, c):
            return h2.astype(od).reshape(vt, c, h2.shape[1])

        def wb(w2d, cout, cin):
            return jnp.broadcast_to(w2d[None], (vt, cout, cin))

        if stop == "empty":
            # touch every DMA'd block so the data movement is not elided
            emit(latent_ref[0], gpack_ref[0, 0])
            return

        lat_rep = pltpu.repeat(latent_ref[0].astype(od), vt, axis=0)
        p1g = df._dot2_vc(m1_ref[:], gpack_ref[0, 0].astype(od)).astype(od)
        gb = df._dot2_vc(p1g * m2_ref[:], ones_ref[:]).astype(od)
        h = lat_rep * gb
        if stop == "gate":
            emit(h)
            return

        h3 = h.reshape(vt, 256, FEAT)
        ae = ao = None
        for k in range(3):
            g = df._bdot_vc(wb(w1[k], 128, 256), h3).astype(od)
            ye = df._bdot_vc(g, jnp.broadcast_to(u1e_ref[k][None], (vt, FEAT, FEAT)))
            yo = df._bdot_vc(g, jnp.broadcast_to(u1o_ref[k][None], (vt, FEAT, FEAT)))
            ae = ye if ae is None else ae + ye
            ao = yo if ao is None else ao + yo
        bb = brep(b1[:])
        e = jnp.maximum(ae.reshape(vt * 128, FEAT) + bb, 0.0).astype(od)
        o = jnp.maximum(ao.reshape(vt * 128, FEAT) + bb, 0.0).astype(od)
        if stop == "upconv1":
            emit(e, o)
            return

        om, ep = df._shiftR_vc(o), df._shiftL_vc(e)
        W2 = [wb(w2[k], 128, 128) for k in range(3)]
        ce = (df._bdot_vc(W2[0], r3(om, 128)) + df._bdot_vc(W2[1], r3(e, 128))
              + df._bdot_vc(W2[2], r3(o, 128)))
        co = (df._bdot_vc(W2[0], r3(e, 128)) + df._bdot_vc(W2[1], r3(o, 128))
              + df._bdot_vc(W2[2], r3(ep, 128)))
        bb = brep(b2[:])
        e = jnp.maximum(ce.reshape(vt * 128, FEAT) + bb, 0.0).astype(od)
        o = jnp.maximum(co.reshape(vt * 128, FEAT) + bb, 0.0).astype(od)
        if stop == "conv2":
            emit(e, o)
            return

        om, ep = df._shiftR_vc(o), df._shiftL_vc(e)
        e3, o3, om3, ep3 = r3(e, 128), r3(o, 128), r3(om, 128), r3(ep, 128)
        A = [wb(ab3_ref[k], 64, 128) for k in range(3)]
        Bm = [wb(ab3_ref[3 + k], 64, 128) for k in range(3)]
        p0 = df._bdot_vc(A[0], om3) + df._bdot_vc(A[1], e3) + df._bdot_vc(A[2], o3)
        p1 = df._bdot_vc(Bm[0], om3) + df._bdot_vc(Bm[1], e3) + df._bdot_vc(Bm[2], o3)
        p2 = df._bdot_vc(A[0], e3) + df._bdot_vc(A[1], o3) + df._bdot_vc(A[2], ep3)
        p3 = df._bdot_vc(Bm[0], e3) + df._bdot_vc(Bm[1], o3) + df._bdot_vc(Bm[2], ep3)
        xb0 = jnp.concatenate(
            [e[:, 0:1], jnp.zeros((vt * 128, 7), od)], axis=1).reshape(vt, 128, 8)
        xb1 = jnp.concatenate(
            [o[:, QW - 1:QW], jnp.zeros((vt * 128, 7), od)], axis=1
        ).reshape(vt, 128, 8)
        corr = [df._bdot_vc(wb(c3_ref[k], 64, 128), xb)
                for k, xb in ((0, xb0), (1, xb0), (2, xb1), (3, xb1))]
        z127 = jnp.zeros((vt * 64, QW - 1), jnp.float32)
        p0 = p0.reshape(vt * 64, QW) + jnp.concatenate(
            [corr[0].reshape(vt * 64, 8)[:, 0:1], z127], axis=1)
        p1 = p1.reshape(vt * 64, QW) + jnp.concatenate(
            [corr[1].reshape(vt * 64, 8)[:, 0:1], z127], axis=1)
        p2 = p2.reshape(vt * 64, QW) + jnp.concatenate(
            [z127, corr[2].reshape(vt * 64, 8)[:, 0:1]], axis=1)
        p3 = p3.reshape(vt * 64, QW) + jnp.concatenate(
            [z127, corr[3].reshape(vt * 64, 8)[:, 0:1]], axis=1)
        bb = brep(b3r[:])
        p0 = jnp.maximum(p0 + bb, 0.0).astype(od)
        p1 = jnp.maximum(p1 + bb, 0.0).astype(od)
        p2 = jnp.maximum(p2 + bb, 0.0).astype(od)
        p3 = jnp.maximum(p3 + bb, 0.0).astype(od)
        if stop == "upconv2":
            emit(p0, p1, p2, p3)
            return

        p3m, p0p = df._shiftR_vc(p3), df._shiftL_vc(p0)
        P = [r3(x, 64) for x in (p0, p1, p2, p3, p3m, p0p)]
        W4 = [wb(w4[k], 64, 64) for k in range(3)]
        q0 = df._bdot_vc(W4[0], P[4]) + df._bdot_vc(W4[1], P[0]) + df._bdot_vc(W4[2], P[1])
        q1 = df._bdot_vc(W4[0], P[0]) + df._bdot_vc(W4[1], P[1]) + df._bdot_vc(W4[2], P[2])
        q2 = df._bdot_vc(W4[0], P[1]) + df._bdot_vc(W4[1], P[2]) + df._bdot_vc(W4[2], P[3])
        q3 = df._bdot_vc(W4[0], P[2]) + df._bdot_vc(W4[1], P[3]) + df._bdot_vc(W4[2], P[5])
        bb = brep(b4[:])
        q0 = jnp.maximum(q0.reshape(vt * 64, QW) + bb, 0.0)
        q1 = jnp.maximum(q1.reshape(vt * 64, QW) + bb, 0.0)
        q2 = jnp.maximum(q2.reshape(vt * 64, QW) + bb, 0.0)
        q3 = jnp.maximum(q3.reshape(vt * 64, QW) + bb, 0.0)
        if stop == "conv4":
            emit(q0, q1, q2, q3)
            return

        q3m, q0p = df._shiftR_vc(q3.astype(od)), df._shiftL_vc(q0.astype(od))

        def sdot(k, h2):
            return df._dot2_vc(selw_ref[k], h2.astype(od))

        r0 = sdot(0, q3m) + sdot(1, q0) + sdot(2, q1)
        r1 = sdot(0, q0) + sdot(1, q1) + sdot(2, q2)
        r2 = sdot(0, q1) + sdot(1, q2) + sdot(2, q3)
        r3_ = sdot(0, q2) + sdot(1, q3) + sdot(2, q0p)
        out = jnp.concatenate([r0, r1, r2, r3_], axis=1) + b5_2d[:]
        out_ref[0] = jax.nn.sigmoid(out / 3.0).astype(out_ref.dtype)

    def build(stop):
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16
        call = pl.pallas_call(
            functools.partial(kernel, stop=stop),
            grid=(B, n_vt),
            in_specs=[
                pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, vt * 2, 128), lambda b, v: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec((1, vt, SEQ), lambda b, v: (b, v, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, V, SEQ), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
        )

        @jax.jit
        def chain(lat, gg):
            def body(c, g_step):
                gpack = g_step.reshape(B, n_vt, vt * 2, 128)
                out = call(lat, gpack, m1, m2, ones128, selw, u1e, u1o, ab3, c3,
                           folded["w1"], folded["b1"], folded["w2"], folded["b2"],
                           folded["b3"], folded["w4"], folded["b4"],
                           folded["b5"].reshape(1, 1))
                return c + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, gg)
            return acc

        return chain

    prev = 0.0
    print(f"polyphase kernel v_tile={vt}  (per launch of {B}x{V} views; "
          f"DELTAS are the per-stage costs and cancel tunnel RTT)", flush=True)
    for stop in STAGES:
        chain = build(stop)
        float(chain(latent, gates_k))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(latent, gates_k))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) / K
        print(f"  through {stop:7s}: {med*1e3:7.3f} ms  (+{(med-prev)*1e3:6.3f} ms)",
              flush=True)
        prev = med


if __name__ == "__main__":
    main(*sys.argv[1:])
