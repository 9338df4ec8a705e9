"""Polyphase decoder kernel prototype — cut upconv2's dense upsample matmul.

In the adopted layout-B kernel, each fused (x2 upsample -> k3 conv) stage
computes sum_k W_k @ (h @ U_k) where U_k is a DENSE [n, 2n] matrix with only
two nonzeros per column. For upconv2 (Cin=128, n=256) the h @ U_k dots are
80% of the stage FLOPs spent multiplying mostly-zeros. The classical fix is
the POLYPHASE decomposition: conv(up(x)) splits into per-output-parity k3
convs at the NARROW width,

  y[2i]   = A_0 x[i-1] + A_1 x[i] + A_2 x[i+1]
  y[2i+1] = B_0 x[i-1] + B_1 x[i] + B_2 x[i+1]
  A_0 = .75W_0+.25W_1   A_1 = .25W_0+.75W_1+.75W_2   A_2 = .25W_2
  B_0 = .25W_0          B_1 = .75W_0+.75W_1+.25W_2   B_2 = .25W_1+.75W_2

(exact for torch Upsample(x2, linear, align_corners=False) + k3 zero-pad
conv, EXCEPT at the clamped edges: four single-column corrections
  y_e[:,0]   += .25(W_1-W_0) x[:,0]    y_e[:,n-1] += .25 W_2     x[:,n-1]
  y_o[:,0]   += .25 W_0      x[:,0]    y_o[:,n-1] += .25(W_1-W_2) x[:,n-1]
computed as narrow N=8 batched dots and injected by lane concat.)

FLOP accounting per view: upconv2 31.5M -> 12.6M (-60%); every other stage
is FLOP-neutral in phase form (upconv1 keeps its U-matmul form with U's
columns pre-split by output parity so it BIRTHS the signal in (even, odd)
planes; conv2 runs 2-phase; upconv2 maps 2 -> 4 phases; conv4/conv5 run
4-phase). The kernel emits phase-BLOCKED rows [vb, 4*128]; XLA interleaves
to time order outside (a [B,V,128,4]->[B,V,512] transpose).

Usage: VT=16 python tools/bench_kernel_polyphase.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from electrocardio_panorama_tpu.ops.pallas import decoder_fused as df

    dtype = jnp.bfloat16
    vt = int(os.environ.get("VT", "16"))
    B, V, K = 32, 336, 8
    n_vt = V // vt
    FEAT, SEQ = df.FEAT, df.SEQ
    QW = SEQ // 4  # 128: quarter-width phase planes

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

    # --- host-side operator prep -------------------------------------------
    # upconv1: U columns split by output parity (even cols / odd cols)
    u1 = np.stack([np.asarray(m, np.float64)
                   for m in df.upsample_shift_matrices(FEAT, jnp.float64)])
    u1e = jnp.asarray(u1[:, :, 0::2]).astype(dtype)  # [3, 128, 128]
    u1o = jnp.asarray(u1[:, :, 1::2]).astype(dtype)

    # upconv2: polyphase A/B matrices + edge-correction matrices (combined in
    # f32 from the folded taps, rounded once)
    w3 = np.asarray(folded["w3"], np.float32)  # [3, 64, 128]
    ab3 = np.stack([
        0.75 * w3[0] + 0.25 * w3[1],                    # A0
        0.25 * w3[0] + 0.75 * w3[1] + 0.75 * w3[2],     # A1
        0.25 * w3[2],                                   # A2
        0.25 * w3[0],                                   # B0
        0.75 * w3[0] + 0.75 * w3[1] + 0.25 * w3[2],     # B1
        0.25 * w3[1] + 0.75 * w3[2],                    # B2
    ])
    ab3 = jnp.asarray(ab3).astype(dtype)  # [6, 64, 128]
    c3 = np.stack([
        0.25 * (w3[1] - w3[0]),  # p0 col 0   (x col = e[:,0])
        0.25 * w3[0],            # p1 col 0   (e[:,0])
        0.25 * w3[2],            # p2 col 127 (o[:,127])
        0.25 * (w3[1] - w3[2]),  # p3 col 127 (o[:,127])
    ])
    c3 = jnp.asarray(c3).astype(dtype)  # [4, 64, 128]

    selw = df.conv5_selectors(vt, folded["w5"], dtype)  # [3, vt, vt*64]

    # packed-gate expansion (the [vt*256, 1] column block is one lane wide —
    # its DMA costs ~3.9 ms/launch; ship gates packed [vt*2, 128] and expand
    # by exact selector matmuls in-kernel)
    vc = np.arange(vt * 256)
    m1 = jnp.asarray((vc[:, None] // 128 == np.arange(vt * 2)[None, :])
                     .astype(np.float32)).astype(dtype)
    m2 = jnp.asarray((vc[:, None] % 128 == np.arange(128)[None, :])
                     .astype(np.float32)).astype(dtype)
    ones128 = jnp.ones((128, 128), dtype)

    # PAIR4=1: conv4's [64,64] weights quarter-fill the MXU; pair two views
    # per batch element with block-diagonal weights (2x stream utilization)
    pair4 = os.environ.get("PAIR4", "0") == "1"
    w4_np = np.asarray(folded["w4"], np.float32)
    w4bd_np = np.zeros((3, 128, 128), np.float32)
    w4bd_np[:, :64, :64] = w4_np
    w4bd_np[:, 64:, 64:] = w4_np
    w4bd = jnp.asarray(w4bd_np).astype(dtype)

    def bdot(a3, b3):
        return jax.lax.dot_general(
            a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bcast(w2d):
        return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

    def brep(vec):
        return pltpu.repeat(vec.reshape(-1, 1).astype(jnp.float32), vt, axis=0)

    def shiftR(h2):  # x[i-1], zero at col 0
        z = jnp.zeros((h2.shape[0], 1), h2.dtype)
        return jnp.concatenate([z, h2[:, :-1]], axis=1)

    def shiftL(h2):  # x[i+1], zero at last col
        z = jnp.zeros((h2.shape[0], 1), h2.dtype)
        return jnp.concatenate([h2[:, 1:], z], axis=1)

    def sdot(sel2, h2):
        return jax.lax.dot_general(
            sel2, h2.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot2(a2, b2):
        return jax.lax.dot_general(
            a2, b2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(latent_ref, gcol_ref, m1_ref, m2_ref, ones_ref,
               sel_ref, u1e_ref, u1o_ref, ab3_ref, c3_ref,
               w1, b1, w2, b2, b3r, w4, b4, b5_2d, out_ref):
        lat_rep = pltpu.repeat(latent_ref[0].astype(dtype), vt, axis=0)
        packed = gcol_ref[0, 0].astype(dtype)                  # [vt*2, 128]
        p1g = dot2(m1_ref[:], packed).astype(dtype)            # [vt*256, 128]
        gb = dot2(p1g * m2_ref[:], ones_ref[:]).astype(dtype)
        h = lat_rep * gb                                       # [vt*256, 128]

        # upconv1 -> 2-phase (e, o), each [vt*128, 128]
        h3 = h.reshape(vt, 256, FEAT)
        ae = ao = None
        for k in range(3):
            g = bdot(bcast(w1[k]), h3).astype(dtype)           # [vt,128,128]
            ye = bdot(g, bcast(u1e_ref[k]))
            yo = bdot(g, bcast(u1o_ref[k]))
            ae = ye if ae is None else ae + ye
            ao = yo if ao is None else ao + yo
        bb = brep(b1[:])
        e = jnp.maximum(ae.reshape(vt * 128, FEAT) + bb, 0.0).astype(dtype)
        o = jnp.maximum(ao.reshape(vt * 128, FEAT) + bb, 0.0).astype(dtype)

        # conv2 in 2-phase: c_e = V0 o[i-1] + V1 e + V2 o ; c_o = V0 e + V1 o + V2 e[i+1]
        def r3(h2, c):
            return h2.astype(dtype).reshape(vt, c, h2.shape[1])

        om, ep = shiftR(o), shiftL(e)
        ce = bdot(bcast(w2[0]), r3(om, 128)) + bdot(bcast(w2[1]), r3(e, 128)) \
            + bdot(bcast(w2[2]), r3(o, 128))
        co = bdot(bcast(w2[0]), r3(e, 128)) + bdot(bcast(w2[1]), r3(o, 128)) \
            + bdot(bcast(w2[2]), r3(ep, 128))
        bb = brep(b2[:])
        e = jnp.maximum(ce.reshape(vt * 128, FEAT) + bb, 0.0).astype(dtype)
        o = jnp.maximum(co.reshape(vt * 128, FEAT) + bb, 0.0).astype(dtype)

        # upconv2: 2-phase -> 4-phase via A/B matrices (the FLOP win)
        om, ep = shiftR(o), shiftL(e)
        e3, o3, om3, ep3 = r3(e, 128), r3(o, 128), r3(om, 128), r3(ep, 128)
        A = [bcast(ab3_ref[k]) for k in range(3)]
        Bm = [bcast(ab3_ref[3 + k]) for k in range(3)]
        p0 = bdot(A[0], om3) + bdot(A[1], e3) + bdot(A[2], o3)
        p1 = bdot(Bm[0], om3) + bdot(Bm[1], e3) + bdot(Bm[2], o3)
        p2 = bdot(A[0], e3) + bdot(A[1], o3) + bdot(A[2], ep3)
        p3 = bdot(Bm[0], e3) + bdot(Bm[1], o3) + bdot(Bm[2], ep3)
        # edge-clamp corrections: narrow N=8 dots on the boundary columns,
        # injected by lane concat (correction cols: p0/p1 at 0, p2/p3 at 127)
        xb0 = jnp.concatenate(
            [e[:, 0:1], jnp.zeros((vt * 128, 7), dtype)], axis=1
        ).reshape(vt, 128, 8)
        xb1 = jnp.concatenate(
            [o[:, QW - 1:QW], jnp.zeros((vt * 128, 7), dtype)], axis=1
        ).reshape(vt, 128, 8)
        z127 = jnp.zeros((vt * 64, QW - 1), jnp.float32)
        corr = [bdot(bcast(c3_ref[k]), xb)
                for k, xb in ((0, xb0), (1, xb0), (2, xb1), (3, xb1))]
        p0 = p0.reshape(vt * 64, QW) + jnp.concatenate(
            [corr[0].reshape(vt * 64, 8)[:, 0:1], z127], axis=1)
        p1 = p1.reshape(vt * 64, QW) + jnp.concatenate(
            [corr[1].reshape(vt * 64, 8)[:, 0:1], z127], axis=1)
        p2 = p2.reshape(vt * 64, QW) + jnp.concatenate(
            [z127, corr[2].reshape(vt * 64, 8)[:, 0:1]], axis=1)
        p3 = p3.reshape(vt * 64, QW) + jnp.concatenate(
            [z127, corr[3].reshape(vt * 64, 8)[:, 0:1]], axis=1)
        bb = brep(b3r[:])
        p0 = jnp.maximum(p0 + bb, 0.0).astype(dtype)
        p1 = jnp.maximum(p1 + bb, 0.0).astype(dtype)
        p2 = jnp.maximum(p2 + bb, 0.0).astype(dtype)
        p3 = jnp.maximum(p3 + bb, 0.0).astype(dtype)

        # conv4 in 4-phase (f32-carried output)
        p3m, p0p = shiftR(p3), shiftL(p0)
        if pair4:
            def rp(x):  # two views per batch element (block-diag weights)
                return x.astype(dtype).reshape(vt // 2, 128, QW)

            P = [rp(x) for x in (p0, p1, p2, p3, p3m, p0p)]
            W4 = [jnp.broadcast_to(w4[k][None], (vt // 2, 128, 128))
                  for k in range(3)]
        else:
            P = [r3(x, 64) for x in (p0, p1, p2, p3, p3m, p0p)]
            W4 = [bcast(w4[k]) for k in range(3)]
        q0 = bdot(W4[0], P[4]) + bdot(W4[1], P[0]) + bdot(W4[2], P[1])
        q1 = bdot(W4[0], P[0]) + bdot(W4[1], P[1]) + bdot(W4[2], P[2])
        q2 = bdot(W4[0], P[1]) + bdot(W4[1], P[2]) + bdot(W4[2], P[3])
        q3 = bdot(W4[0], P[2]) + bdot(W4[1], P[3]) + bdot(W4[2], P[5])
        bb = brep(b4[:])
        q0 = jnp.maximum(q0.reshape(vt * 64, QW) + bb, 0.0)
        q1 = jnp.maximum(q1.reshape(vt * 64, QW) + bb, 0.0)
        q2 = jnp.maximum(q2.reshape(vt * 64, QW) + bb, 0.0)
        q3 = jnp.maximum(q3.reshape(vt * 64, QW) + bb, 0.0)

        # conv5 in 4-phase: selector dots on shifted planes, f32 tail
        q3m, q0p = shiftR(q3.astype(dtype)), shiftL(q0.astype(dtype))
        r0 = sdot(sel_ref[0], q3m) + sdot(sel_ref[1], q0) + sdot(sel_ref[2], q1)
        r1 = sdot(sel_ref[0], q0) + sdot(sel_ref[1], q1) + sdot(sel_ref[2], q2)
        r2 = sdot(sel_ref[0], q1) + sdot(sel_ref[1], q2) + sdot(sel_ref[2], q3)
        r3_ = sdot(sel_ref[0], q2) + sdot(sel_ref[1], q3) + sdot(sel_ref[2], q0p)
        out = jnp.concatenate([r0, r1, r2, r3_], axis=1) + b5_2d[:]  # [vt, 512]
        out_ref[0] = jax.nn.sigmoid(out / 3.0)

    # m1, m2, ones, sel, u1e, u1o, ab3, c3 + w1,b1,w2,b2,b3r,w4,b4,b5 = 16
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16
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

    wargs = (folded["w1"], folded["b1"], folded["w2"], folded["b2"],
             folded["b3"], w4bd if pair4 else folded["w4"], folded["b4"],
             folded["b5"].reshape(1, 1))

    def prep(g):
        return g.reshape(g.shape[0], n_vt, vt * 2, 128)  # packed gate block

    def interleave(out):
        # phase-blocked [B, V, 4*128] -> time order [B, V, 512]
        return out.reshape(B, V, 4, QW).transpose(0, 1, 3, 2).reshape(B, V, SEQ)

    @jax.jit
    def chain(lat, gg):
        def body(c, g_step):
            out = interleave(call(lat, prep(g_step), m1, m2, ones128,
                                  selw, u1e, u1o, ab3, c3, *wargs))
            return c + out.sum(), None

        acc, _ = jax.lax.scan(body, 0.0, gg)
        return acc

    try:
        out_b = call(latent, prep(gates_k[0]), m1, m2, ones128,
                     selw, u1e, u1o, ab3, c3, *wargs)
        out_b = np.asarray(jax.jit(interleave)(out_b))
    except Exception as e:  # noqa: BLE001
        print(f"polyphase FAILED: {str(e)[:500]}", flush=True)
        return
    out_a = df.fused_decode_views(folded, latent.astype(dtype),
                                  gates_k[0].astype(dtype), v_tile=16)
    a = np.asarray(out_a, np.float64).ravel()
    bv = np.asarray(out_b, np.float64).ravel()
    corr = np.corrcoef(a, bv)[0, 1]
    print(f"polyphase vs production: corr {corr:.7f} mae {np.abs(a - bv).mean():.2e} "
          f"max {np.abs(a - bv).max():.2e}", flush=True)

    float(chain(latent, gates_k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(latent, gates_k))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) / K
    print(f"polyphase vt{vt}: {med * 1e3:7.3f} ms/launch "
          f"({B * V / med:,.0f} views/s decode-chain)", flush=True)


if __name__ == "__main__":
    main()
