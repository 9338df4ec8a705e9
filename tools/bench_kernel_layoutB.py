"""Layout-B decoder kernel prototype: (view, channel)-row activations.

The production kernel (ops/pallas/decoder_fused.py) keeps activations
channel-major [C, VT*t]; its two residual costs are (a) the gate stage's
selector-matmul + multiply traffic and (b) the per-tap [Cout, VT*n] ->
[Cout*VT, n] sublane relayout inside each fused upsample+conv
(docs/KERNELS.md round-3 section). This prototype stores activations
row-major (view, channel) as 2-D [VT*C, t]:

  * gate stage = sublane-repeat of the latent x a pre-reshaped [VT*256, 1]
    gate column (prepared in XLA — free) — no selector matmuls;
  * channel mixes and the upsample are BATCHED dot_generals over the view
    dim; [VT*C, t] <-> [VT, C, t] views are free, so no relayouts;
  * lane shifts are exact without masks (each row is one view's one channel);
  * conv5 (Cout=1) via a 0/1 row-selector matmul.

Mosaic discipline learned while building this (this toolchain crashes its
compile helper on): 3-D broadcasts (x3d * v[:, :, None]), multi-axis
reductions (sum(axis=(1, 2))), batched dots with M=1 — so ALL elementwise
work stays 2-D and bias columns come from sublane-repeat.

Usage: python tools/bench_kernel_layoutB.py [gate|upconv1|conv2|upconv2|conv4|conv5]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(stop="conv5"):
    import os

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

    def bdot(a3, b3):
        """Batched [vt, M, Kc] @ [vt, Kc, N] -> [vt, M, N] f32 accumulation."""
        return jax.lax.dot_general(
            a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bcast(w2d):
        return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

    def brep(vec):
        """[C] -> [vt*C, 1] f32 bias column (sublane tile)."""
        return pltpu.repeat(vec.reshape(-1, 1).astype(jnp.float32), vt, axis=0)

    def upconv(h2, w_taps, b, u3, cin, n_in):
        cout = w_taps.shape[1]
        h3 = h2.reshape(vt, cin, n_in)
        acc = None
        for k in range(3):
            g = bdot(bcast(w_taps[k]), h3).astype(h2.dtype)
            y = bdot(g, bcast(u3[k]))
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vt * cout, 2 * n_in) + brep(b)
        return jnp.maximum(acc2, 0.0).astype(h2.dtype)

    def shift2(h2, k):
        if k == 1:
            return h2
        z = jnp.zeros((h2.shape[0], 1), h2.dtype)
        if k == 0:
            return jnp.concatenate([z, h2[:, :-1]], axis=1)
        return jnp.concatenate([h2[:, 1:], z], axis=1)

    def conv(h2, w_taps, b, cin, t, relu, carry_f32=False):
        cout = w_taps.shape[1]
        acc = None
        for k in range(3):
            s3 = shift2(h2, k).astype(w_taps.dtype).reshape(vt, cin, t)
            y = bdot(bcast(w_taps[k]), s3)
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vt * cout, t) + brep(b)
        if relu:
            acc2 = jnp.maximum(acc2, 0.0)
        return acc2 if carry_f32 else acc2.astype(h2.dtype)

    # conv5 (Cout=1) as three WEIGHTED row-selector matmuls: selw_k[v, v*64+c]
    # = w5[k, 0, c] (weights baked into the selector OUTSIDE the kernel — the
    # in-kernel [64]-vector reshapes crash this Mosaic), shifts after.
    sel_np = (np.arange(vt * 64) // 64 == np.arange(vt)[:, None]).astype(np.float32)
    w5_np = np.asarray(folded["w5"], np.float32)  # [3, 1, 64]
    selw_np = np.stack([sel_np * np.tile(w5_np[k, 0], vt)[None, :] for k in range(3)])
    selw = jnp.asarray(selw_np).astype(dtype)  # [3, vt, vt*64]

    def conv5_selw(h2, selw_ref, b2d):
        gs = []
        for k in range(3):
            gs.append(jax.lax.dot_general(
                selw_ref[k], h2.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # [vt, SEQ]
        z = jnp.zeros((vt, 1), jnp.float32)
        left = jnp.concatenate([z, gs[0][:, :-1]], axis=1)
        right = jnp.concatenate([gs[2][:, 1:], z], axis=1)
        return left + gs[1] + right + b2d

    # GATE=selmm: replace the sublane-repeat latent tile with one weighted
    # 0/1 row-selector matmul Srep [vt*256, 256], Srep[v*256+c, c] = 1 —
    # the tiled latent rides the MXU instead of a 16-copy sublane repeat
    gate_mode = os.environ.get("GATE", "repeat")
    srep_np = (np.arange(vt * 256)[:, None] % 256 == np.arange(256)[None, :])
    srep = jnp.asarray(srep_np.astype(np.float32)).astype(dtype)

    # GATE=packmm: the [vt*256, 1] gate column block is ONE LANE wide — its
    # VMEM image is 128x inflated and its DMA costs ~3.9 ms/launch (measured:
    # empty-kernel 7.52 -> 3.64 ms packed). Ship gates PACKED [vt*2, 128]
    # (a pure reshape) and expand in-kernel by exact selector matmuls:
    #   P1 = M1 @ packed   (row vc <- packed row vc//128)
    #   G0 = P1 * M2       (isolate lane vc%128)
    #   Gb = G0 @ ones     (broadcast the single nonzero across lanes)
    vc = np.arange(vt * 256)
    m1_np = (vc[:, None] // 128 == np.arange(vt * 2)[None, :])
    m2_np = (vc[:, None] % 128 == np.arange(128)[None, :])
    m1 = jnp.asarray(m1_np.astype(np.float32)).astype(dtype)    # [vt*256, vt*2]
    m2 = jnp.asarray(m2_np.astype(np.float32)).astype(dtype)    # [vt*256, 128]
    ones128 = jnp.ones((128, 128), dtype)

    # CONV4=pair: conv4's [64,64] weight quarter-fills the 128x128 MXU; pair
    # two views per batched-dot row block with block-diagonal weights
    conv4_mode = os.environ.get("CONV4", "plain")
    w4_np = np.asarray(folded["w4"], np.float32)  # [3, 64, 64]
    w4bd_np = np.zeros((3, 128, 128), np.float32)
    w4bd_np[:, :64, :64] = w4_np
    w4bd_np[:, 64:, 64:] = w4_np
    w4bd = jnp.asarray(w4bd_np).astype(dtype)

    def conv_pair(h2, w4bd_ref, b, cin, t):
        """conv4, 2 views per batch element via block-diag weights, f32 out."""
        acc = None
        for k in range(3):
            s3 = shift2(h2, k).astype(dtype).reshape(vt // 2, 2 * cin, t)
            y = bdot(jnp.broadcast_to(w4bd_ref[k][None], (vt // 2, 2 * cin, 2 * cin)), s3)
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vt * cin, t) + brep(b)
        return jnp.maximum(acc2, 0.0)

    def dot2(a2, b2):
        return jax.lax.dot_general(
            a2, b2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(latent_ref, gcol_ref, srep_ref, m1_ref, m2_ref, ones_ref,
               w4bd_ref, sel_ref, u1_ref, u2_ref,
               w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref):
        def finish(hh):
            red = jnp.sum(hh.astype(jnp.float32), axis=1, keepdims=True)
            out_ref[0] = jnp.zeros((vt, SEQ), jnp.float32) + jnp.sum(red)

        if stop == "empty":
            out_ref[0] = jnp.zeros((vt, SEQ), jnp.float32)
            return
        lat = latent_ref[0].astype(dtype)                      # [256, 128]
        if gate_mode == "selmm":
            lat_rep = dot2(srep_ref[:], lat).astype(dtype)     # [vt*256, 128]
        else:
            lat_rep = pltpu.repeat(lat, vt, axis=0)            # [vt*256, 128]
        if stop == "repeat":
            return finish(lat_rep)
        if gate_mode == "packmm":
            packed = gcol_ref[0, 0].astype(dtype)              # [vt*2, 128]
            p1 = dot2(m1_ref[:], packed).astype(dtype)         # [vt*256, 128]
            gb = dot2(p1 * m2_ref[:], ones_ref[:]).astype(dtype)
            h = lat_rep * gb                                   # [vt*256, 128]
        else:
            g_col = gcol_ref[0, 0].astype(dtype)               # [vt*256, 1]
            h = lat_rep * g_col                                # [vt*256, 128]

        if stop == "gate":
            return finish(h)
        h = upconv(h, w1[:], b1[:], u1_ref[:], 256, FEAT)      # [vt*128, 256]
        if stop == "upconv1":
            return finish(h)
        h = conv(h, w2[:], b2[:], 128, 2 * FEAT, True)         # [vt*128, 256]
        if stop == "conv2":
            return finish(h)
        h = upconv(h, w3[:], b3[:], u2_ref[:], 128, 2 * FEAT)  # [vt*64, 512]
        if stop == "upconv2":
            return finish(h)
        if conv4_mode == "pair":
            h = conv_pair(h, w4bd_ref, b4[:], 64, SEQ)            # [vt*64, 512] f32
        else:
            h = conv(h, w4[:], b4[:], 64, SEQ, True, carry_f32=True)
        if stop == "conv4":
            return finish(h)
        h = conv5_selw(h, sel_ref, b5[:])                      # [vt, 512] f32
        out_ref[0] = jax.nn.sigmoid(h / 3.0)

    # srep, m1, m2, ones, w4bd, sel, u1, u2 + 10 w
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 18
    if gate_mode == "packmm":
        gspec = pl.BlockSpec((1, 1, vt * 2, 128), lambda b, v: (b, v, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        gspec = pl.BlockSpec((1, 1, vt * 256, 1), lambda b, v: (b, v, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_vt),
        in_specs=[
            pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
            gspec,
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, vt, SEQ), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V, SEQ), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
    )

    u1 = df.upsample_shift_matrices(FEAT, dtype)
    u2 = df.upsample_shift_matrices(2 * FEAT, dtype)
    wargs = (folded["w1"], folded["b1"], folded["w2"], folded["b2"],
             folded["w3"], folded["b3"], folded["w4"], folded["b4"],
             folded["w5"], folded["b5"].reshape(1, 1))  # bias as (1,1): 2-D broadcast

    def gcol(g):
        # [B, V, 256] -> (v, c)-ordered gate block per view tile, prepared in
        # XLA (a pure reshape — no kernel relayout). packmm ships it PACKED
        # [vt*2, 128] (tile-dense); other modes as the [vt*256, 1] column.
        if gate_mode == "packmm":
            return g.reshape(g.shape[0], n_vt, vt * 2, 128)
        return g.reshape(g.shape[0], n_vt, vt * 256, 1)

    @jax.jit
    def chain(lat, gg):
        def body(c, g_step):
            out = call(lat, gcol(g_step), srep, m1, m2, ones128, w4bd,
                       selw, u1, u2, *wargs)
            return c + out.sum(), None

        acc, _ = jax.lax.scan(body, 0.0, gg)
        return acc

    try:
        out_b = call(latent, gcol(gates_k[0]), srep, m1, m2, ones128, w4bd,
                     selw, u1, u2, *wargs)
        np.asarray(out_b)
    except Exception as e:  # noqa: BLE001
        print(f"layoutB[{stop}] FAILED: {str(e)[:300]}", flush=True)
        return
    if stop == "conv5":
        out_a = df.fused_decode_views(folded, latent.astype(dtype),
                                      gates_k[0].astype(dtype), v_tile=vt)
        a = np.asarray(out_a, np.float64).ravel()
        bvals = np.asarray(out_b, np.float64).ravel()
        corr = np.corrcoef(a, bvals)[0, 1]
        print(f"layoutB vs production: corr {corr:.7f} mae {np.abs(a-bvals).mean():.2e}",
              flush=True)

    float(chain(latent, gates_k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(latent, gates_k))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) / K
    print(f"layoutB[{stop}]: {med*1e3:7.3f} ms/launch ({B*V/med:,.0f} views/s decode-chain)",
          flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
