"""Per-stage cost breakdown of the DOT-FUSED (layout-B, packed-gate) decoder
kernel on the real TPU — the production bf16 path since the dot-fusion
adoption (the body mirrors decoder_fused._decoder_kernel_pp exactly).

Same method as bench_kernel_stages.py (which profiles the layout-A kernel):
truncated kernel variants stop after stage k and reduce the live activation
into the output block so nothing is DCE'd; successive row DIFFERENCES are the
per-stage costs (differences also cancel the axon tunnel RTT exactly).

Stages: empty (DMA + fixed cost) -> gate -> upconv1 -> conv2 -> upconv2
        -> conv4 -> conv5 (= the full production kernel body).

Usage: python tools/bench_kernel_pp_stages.py [v_tile] [interpret]
(pass a second arg "interpret" with JAX_PLATFORMS=cpu for a smoke run:
timings are meaningless but every stage variant executes)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(v_tile=16, interpret=""):
    interpret = interpret == "interpret"
    import os

    import jax

    # the axon sitecustomize pins jax_platforms="axon,cpu" regardless of the
    # env var; honor an explicit JAX_PLATFORMS=cpu so interpret smoke runs
    # don't hang on backend init when the TPU tunnel is unreachable
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from electrocardio_panorama_tpu.ops.pallas import decoder_fused as df

    dtype = jnp.bfloat16
    vt = int(v_tile)
    # interpret smoke runs shrink the workload: correctness of every stage
    # variant is the point there, not timing
    B, V, K = (2, 2 * int(v_tile), 1) if interpret else (32, 336, 8)
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
    u1eo, ab_m, c01, c23, b3_2, w4a, w4b, w4c, w4d = df.dotfuse_operands(folded)
    m1, m2, ones128 = df.gate_expand_selectors(vt, dtype)

    STAGES = ["empty", "gate", "upconv1", "conv2", "upconv2", "conv4", "conv5"]

    def kernel(latent_ref, gpack_ref, m1_ref, m2_ref, ones_ref,
               selw_ref, u1eo_ref, abm_ref, c01_ref, c23_ref,
               w1, b1, w2, b2, b3_2d, w4a_r, w4b_r, w4c_r, w4d_r, b4, b5_2d,
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

        def wb(w2d):
            return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

        zc = jnp.zeros((vt * 128, 1), od)

        if stop == "empty":
            # touch every DMA'd block so the data movement is not elided
            emit(latent_ref[0], gpack_ref[0, 0])
            return

        # gate stage in COLUMN form
        lat_rep = pltpu.repeat(latent_ref[0].astype(od), vt, axis=0)
        p1g = df._dot2_vc(m1_ref[:], gpack_ref[0, 0].astype(od)).astype(od)
        gcol = df._dot2_vc(p1g * m2_ref[:], ones_ref[:, :8]).astype(od)
        h = lat_rep * gcol[:, 0:1]
        if stop == "gate":
            emit(h)
            return

        # upconv1: 3 channel dots + 3 N-fused upsample dots -> Y = [e|o]
        h3 = h.reshape(vt, 256, FEAT)
        acc = None
        for k in range(3):
            g = df._bdot_vc(wb(w1[k]), h3).astype(od)
            y = df._bdot_vc(g, wb(u1eo_ref[k]))
            acc = y if acc is None else acc + y
        Y = jnp.maximum(acc.reshape(vt * 128, 256) + brep(b1[:]), 0.0).astype(od)
        if stop == "upconv1":
            emit(Y)
            return

        # conv2 N-fused
        e, o = Y[:, :FEAT], Y[:, FEAT:]
        X0 = jnp.concatenate([zc, o[:, :FEAT - 1], e], axis=1)
        X2 = jnp.concatenate([o, e[:, 1:], zc], axis=1)
        ce_co = (df._bdot_vc(wb(w2[0]), r3(X0, 128))
                 + df._bdot_vc(wb(w2[1]), r3(Y, 128))
                 + df._bdot_vc(wb(w2[2]), r3(X2, 128)))
        Y = jnp.maximum(ce_co.reshape(vt * 128, 256) + brep(b2[:]), 0.0).astype(od)
        if stop == "conv2":
            emit(Y)
            return

        # upconv2 M-stacked
        e, o = Y[:, :FEAT], Y[:, FEAT:]
        om = jnp.concatenate([zc, o[:, :FEAT - 1]], axis=1)
        ep = jnp.concatenate([e[:, 1:], zc], axis=1)
        e3, o3, om3, ep3 = r3(e, 128), r3(o, 128), r3(om, 128), r3(ep, 128)
        AB = [wb(abm_ref[k]) for k in range(3)]
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
        PL = PL.reshape(vt * 128, QW) + jnp.concatenate(
            [corrL[:, 0:1], z127], axis=1)
        PR = PR.reshape(vt * 128, QW) + jnp.concatenate(
            [z127, corrR[:, 0:1]], axis=1)
        bb = brep(b3_2d[:])
        PL = jnp.maximum(PL + bb, 0.0).astype(od)
        PR = jnp.maximum(PR + bb, 0.0).astype(od)
        if stop == "upconv2":
            emit(PL, PR)
            return

        # conv4 at K=128
        PRs, PLs = df._shiftR_vc(PR), df._shiftL_vc(PL)
        PL3, PR3 = r3(PL, 128), r3(PR, 128)
        PRs3, PLs3 = r3(PRs, 128), r3(PLs, 128)
        q0 = df._bdot_vc(wb(w4a_r[:]), PL3) + df._bdot_vc(wb(w4b_r[:]), PRs3)
        q1 = df._bdot_vc(wb(w4c_r[:]), PL3) + df._bdot_vc(wb(w4d_r[:]), PR3)
        q2 = df._bdot_vc(wb(w4b_r[:]), PL3) + df._bdot_vc(wb(w4a_r[:]), PR3)
        q3 = df._bdot_vc(wb(w4c_r[:]), PR3) + df._bdot_vc(wb(w4d_r[:]), PLs3)
        bb = pltpu.repeat(b4[:].reshape(-1, 1), vt, axis=0)
        q0 = jnp.maximum(q0.reshape(vt * 64, QW) + bb, 0.0)
        q1 = jnp.maximum(q1.reshape(vt * 64, QW) + bb, 0.0)
        q2 = jnp.maximum(q2.reshape(vt * 64, QW) + bb, 0.0)
        q3 = jnp.maximum(q3.reshape(vt * 64, QW) + bb, 0.0)
        if stop == "conv4":
            emit(q0, q1, q2, q3)
            return

        # conv5 N-fused
        Q1 = jnp.concatenate([q0, q1, q2, q3], axis=1).astype(od)
        q3m = df._shiftR_vc(q3.astype(od))
        q0p = df._shiftL_vc(q0.astype(od))
        Q0 = jnp.concatenate([q3m, Q1[:, : 3 * QW]], axis=1)
        Q2 = jnp.concatenate([Q1[:, QW:], q0p], axis=1)
        out = (df._dot2_vc(selw_ref[0], Q0) + df._dot2_vc(selw_ref[1], Q1)
               + df._dot2_vc(selw_ref[2], Q2)) + b5_2d[:]
        out_ref[0] = jax.nn.sigmoid(out / 3.0).astype(out_ref.dtype)

    def build(stop):
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
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
            interpret=interpret,
        )

        @jax.jit
        def chain(lat, gg):
            def body(c, g_step):
                gpack = g_step.reshape(B, n_vt, vt * 2, 128)
                out = call(lat, gpack, m1, m2, ones128, selw, u1eo, ab_m,
                           c01, c23,
                           folded["w1"], folded["b1"], folded["w2"],
                           folded["b2"], b3_2, w4a, w4b, w4c, w4d,
                           folded["b4"], folded["b5"].reshape(1, 1))
                return c + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, gg)
            return acc

        return chain

    prev = 0.0
    print(f"dot-fused kernel v_tile={vt}  (per launch of {B}x{V} views; "
          f"DELTAS are the per-stage costs and cancel tunnel RTT)", flush=True)
    for stop in STAGES:
        chain = build(stop)
        float(chain(latent, gates_k))  # compile
        ts = []
        for _ in range(1 if interpret else 5):
            t0 = time.perf_counter()
            float(chain(latent, gates_k))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) / K
        print(f"  through {stop:7s}: {med*1e3:7.3f} ms  (+{(med-prev)*1e3:6.3f} ms)",
              flush=True)
        prev = med


if __name__ == "__main__":
    main(*sys.argv[1:])
