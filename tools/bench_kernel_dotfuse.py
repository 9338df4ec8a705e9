"""Dot-fusion decoder kernel prototype — fewer, wider MXU dots.

The production polyphase kernel issues 54 dots per program, most with
N=128 and conv4's with K=64 (half the MXU's 128-lane contraction). This
variant restructures every stage around fewer, better-shaped dots (30 total):

  * upconv1: the per-parity upsample matrices concat along N on the host
    (u1eo [3, 128, 256]) -> 3 upsample dots instead of 6; the stage emits
    Y = [e|o] as ONE [VT*128, 256] plane.
  * conv2 (N-fused): [ce|co] = W0 @ [om|e] + W1 @ [e|o] + W2 @ [o|ep].
    [e|o] is the previous stage's output VERBATIM; the other two operands
    are single 3-piece lane concats that subsume the shift copies the
    production kernel already pays. 3 dots (N=256) instead of 6.
  * upconv2 (M-stacked): [p0;p1] = (A_k;B_k) @ (om,e,o) and
    [p2;p3] = (A_k;B_k) @ (e,o,ep) — the A/B weight pairs stack along M on
    the host (dense, no zero padding), 6 dots [128,128]@[128,128] instead
    of 12 [64,128]@[128,128]; edge corrections stack the same way (2 dots
    instead of 4).
  * conv4 (K=128): with the phase pairs channel-stacked, each output phase
    is TWO dots with concatenated weight blocks, e.g.
    q0 = [W1 W2] @ [p0;p1] + [0 W0] @ shiftR([p2;p3]).
    8 dots at K=128 (full contraction util) instead of 12 at K=64: 1.33x
    the MACs at 2x the K-utilization.
  * conv5 (N-fused): r = S0 @ [q3m|q0|q1|q2] + S1 @ [q0|q1|q2|q3]
    + S2 @ [q1|q2|q3|q0p] — 3 selector dots (N=512) instead of 12; the
    middle operand is one concat, the outer two reuse 384 of its lanes.
  * gate (column form): the stage profile puts the gate at 1.87 ms vs
    ~0.5 ideal — the [VT*256, 128] ones-broadcast matmul (67M MACs/program)
    dominates. Instead reduce the expanded gate to a ONE-LANE column with a
    narrow N=8 dot (gcol = (m1@packed * m2) @ ones[:, :8], 4M MACs) and
    apply it with a lane-broadcast MULTIPLY (the same [N,1]-against-[N,128]
    broadcast the bias adds already use). One-lane intermediates are fine
    in VMEM — the poison was only ever the one-lane DMA block image.

Summation order changes (conv4's two-dot split, fused K-loops), so outputs
are compared to the production kernel at f32-noise tolerance rather than
bitwise.

Usage: python tools/bench_kernel_dotfuse.py [v_tile]
"""

from __future__ import annotations

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
    gates_k = jnp.asarray(rng.normal(size=(K, B, V, 256)).astype(np.float32))

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    folded = df.fold_decoder_bn(params, bn_state, dtype=dtype)

    # ---- host-side operator prep -------------------------------------------
    u1e, u1o, ab3, c3 = df.polyphase_matrices(folded)
    u1eo = jnp.concatenate([u1e, u1o], axis=2)            # [3, 128, 256]
    ab_m = jnp.concatenate([ab3[:3], ab3[3:]], axis=1)    # [3, 128, 128] (A;B)
    c01 = jnp.concatenate([c3[0], c3[1]], axis=0)         # [128, 128]
    c23 = jnp.concatenate([c3[2], c3[3]], axis=0)
    b3_2 = jnp.concatenate([folded["b3"], folded["b3"]])  # [128] f32

    w4f = [np.asarray(w, np.float32) for w in folded["w4"]]  # 3 x [64, 64]
    z64 = np.zeros((64, 64), np.float32)

    def cat2(a, b):
        return jnp.asarray(np.concatenate([a, b], axis=1)).astype(dtype)

    w4_12 = cat2(w4f[1], w4f[2])   # q0 <- PL
    w4_z0 = cat2(z64, w4f[0])      # q0 <- shiftR(PR); q2 <- PL
    w4_01 = cat2(w4f[0], w4f[1])   # q1 <- PL; q3 <- PR
    w4_2z = cat2(w4f[2], z64)      # q1 <- PR; q3 <- shiftL(PL)

    selw = df.conv5_selectors(vt, folded["w5"], dtype)
    m1, m2, ones128 = df.gate_expand_selectors(vt, dtype)

    def kernel(latent_ref, gpack_ref, m1_ref, m2_ref, ones_ref,
               selw_ref, u1eo_ref, abm_ref, c01_ref, c23_ref,
               w1, b1, w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
               out_ref):
        od = dtype

        def brep(vec):
            return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)

        def r3(h2, c):
            return h2.astype(od).reshape(vt, c, h2.shape[1])

        def wb(w2d):
            return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

        zc = jnp.zeros((vt * 128, 1), od)

        # gate stage in COLUMN form: expand to [VT*256, 1] via a narrow dot,
        # then one lane-broadcast multiply against the repeated latent
        lat_rep = pltpu.repeat(latent_ref[0].astype(od), vt, axis=0)
        p1g = df._dot2_vc(m1_ref[:], gpack_ref[0, 0].astype(od)).astype(od)
        gcol = df._dot2_vc(p1g * m2_ref[:], ones_ref[:, :8]).astype(od)
        h = lat_rep * gcol[:, 0:1]                         # [VT*256, 128]

        # upconv1: 3 channel dots + 3 N-fused upsample dots -> Y = [e|o]
        h3 = h.reshape(vt, 256, FEAT)
        acc = None
        for k in range(3):
            g = df._bdot_vc(wb(w1[k]), h3).astype(od)      # [vt, 128, 128]
            y = df._bdot_vc(g, wb(u1eo_ref[k]))            # [vt, 128, 256]
            acc = y if acc is None else acc + y
        # bias column broadcasts across both parity halves along lanes
        Y = jnp.maximum(acc.reshape(vt * 128, 256) + brep(b1[:]), 0.0).astype(od)

        # conv2 N-fused: [ce|co] = W0@[om|e] + W1@[e|o] + W2@[o|ep]
        e, o = Y[:, :FEAT], Y[:, FEAT:]
        X0 = jnp.concatenate([zc, o[:, :FEAT - 1], e], axis=1)
        X2 = jnp.concatenate([o, e[:, 1:], zc], axis=1)
        ce_co = (df._bdot_vc(wb(w2[0]), r3(X0, 128))
                 + df._bdot_vc(wb(w2[1]), r3(Y, 128))
                 + df._bdot_vc(wb(w2[2]), r3(X2, 128)))
        Y = jnp.maximum(ce_co.reshape(vt * 128, 256) + brep(b2[:]), 0.0).astype(od)

        # upconv2 M-stacked: PL = [p0;p1] over (om,e,o); PR = [p2;p3] over
        # (e,o,ep); edge corrections stacked the same way
        e, o = Y[:, :FEAT], Y[:, FEAT:]
        om, ep = jnp.concatenate([zc, o[:, :FEAT - 1]], axis=1), \
            jnp.concatenate([e[:, 1:], zc], axis=1)
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

        # conv4 at K=128: two concat-weight dots per output phase
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

        # conv5 N-fused: 3 selector dots over [vt*64, 512] operands
        Q1 = jnp.concatenate([q0, q1, q2, q3], axis=1).astype(od)
        q3m = df._shiftR_vc(q3.astype(od))
        q0p = df._shiftL_vc(q0.astype(od))
        Q0 = jnp.concatenate([q3m, Q1[:, : 3 * QW]], axis=1)
        Q2 = jnp.concatenate([Q1[:, QW:], q0p], axis=1)
        out = (df._dot2_vc(selw_ref[0], Q0) + df._dot2_vc(selw_ref[1], Q1)
               + df._dot2_vc(selw_ref[2], Q2)) + b5_2d[:]
        out_ref[0] = jax.nn.sigmoid(out / 3.0).astype(out_ref.dtype)

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
    call = pl.pallas_call(
        kernel,
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

    wargs = (m1, m2, ones128, selw, u1eo, ab_m, c01, c23,
             folded["w1"], folded["b1"], folded["w2"], folded["b2"], b3_2,
             w4_12, w4_z0, w4_01, w4_2z, folded["b4"],
             folded["b5"].reshape(1, 1))

    def prep(g):
        return g.reshape(g.shape[0], n_vt, vt * 2, 128)

    def interleave(out):
        return out.reshape(B, V, 4, QW).transpose(0, 1, 3, 2).reshape(B, V, SEQ)

    @jax.jit
    def chain(lat, gg):
        def body(c, g_step):
            out = interleave(call(lat, prep(g_step), *wargs))
            return c + out.sum(), None

        acc, _ = jax.lax.scan(body, 0.0, gg)
        return acc

    try:
        out_b = call(latent, prep(gates_k[0]), *wargs)
        out_b = np.asarray(jax.jit(interleave)(out_b))
    except Exception as e:  # noqa: BLE001
        print(f"dotfuse FAILED: {str(e)[:800]}", flush=True)
        return
    out_a = df.fused_decode_views(folded, latent.astype(dtype),
                                  gates_k[0].astype(dtype), v_tile=vt)
    a = np.asarray(out_a, np.float64).ravel()
    bv = np.asarray(out_b, np.float64).ravel()
    corr = np.corrcoef(a, bv)[0, 1]
    print(f"dotfuse vs production: corr {corr:.7f} mae {np.abs(a - bv).mean():.2e} "
          f"max {np.abs(a - bv).max():.2e}", flush=True)

    float(chain(latent, gates_k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(latent, gates_k))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) / K
    print(f"dotfuse vt{vt}: {med * 1e3:7.3f} ms/launch raw at K={K} "
          f"({B * V / med:,.0f} views/s decode-chain, RTT-inclusive)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
