"""Beat-tiled layout-B decoder kernel prototype.

The adopted layout-B kernel (ops/pallas/decoder_fused.py::_decoder_kernel_vc)
runs one grid program per (beat, view-tile): 32 beats x 21 tiles = 672
programs/launch at vt=16. The stage profile attributes the residual gap to
per-program fixed cost (prologue/epilogue, DMA waits) across those programs
(docs/KERNELS.md). Program count is B*V/(vt*bt) — so fusing a BEAT TILE into
each program divides it directly.

Row-order trick that makes this free: order activation rows (view, beat,
channel) instead of (beat, view, channel). Then

  pltpu.repeat(latent_block [BT*256, 128], VT, axis=0)

produces rows ordered (rep, b, c) == (v, b, c) — exactly the tiled latent the
gate stage needs, with no per-beat concat. Everything downstream is batched
over the (v, b) pair axis (vb = VT*BT) exactly as layout B batches over v.
The gate column is pre-arranged in XLA to (v, b, c) order; the output array
is view-major [V, B, 512] (block = [vt, bt, 512] tile), transposed back to
[B, V, 512] outside the kernel.

Costs that grow with vb: conv5's weighted row-selector matmul is
[vb, vb*64] @ [vb*64, 512] — quadratic in vb (~0.1 ms/launch at vb=16,
~0.2 at 32, ~0.45 at 64, bf16 MXU) — and per-stage VMEM scales linearly
(vb=32 ~ the vt=32 estimate; vb=64 brushes the 100 MiB budget).

Usage: VT=16 BT=2 python tools/bench_kernel_beattile.py
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
    bt = int(os.environ.get("BT", "2"))
    vb = vt * bt
    B, V, K = 32, 336, 8
    n_vt, n_bt = V // vt, B // bt
    FEAT, SEQ = df.FEAT, df.SEQ
    print(f"vt={vt} bt={bt} vb={vb} programs={n_vt * n_bt} (base 672)", flush=True)

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
        return jax.lax.dot_general(
            a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bcast(w2d):
        return jnp.broadcast_to(w2d[None], (vb, *w2d.shape))

    def brep(vec):
        return pltpu.repeat(vec.reshape(-1, 1).astype(jnp.float32), vb, axis=0)

    def upconv(h2, w_taps, b, u3, cin, n_in):
        cout = w_taps.shape[1]
        h3 = h2.reshape(vb, cin, n_in)
        acc = None
        for k in range(3):
            g = bdot(bcast(w_taps[k]), h3).astype(h2.dtype)
            y = bdot(g, bcast(u3[k]))
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vb * cout, 2 * n_in) + brep(b)
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
            s3 = shift2(h2, k).astype(w_taps.dtype).reshape(vb, cin, t)
            y = bdot(bcast(w_taps[k]), s3)
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vb * cout, t) + brep(b)
        if relu:
            acc2 = jnp.maximum(acc2, 0.0)
        return acc2 if carry_f32 else acc2.astype(h2.dtype)

    selw = df.conv5_selectors(vb, folded["w5"], dtype)  # [3, vb, vb*64]

    def conv5_selw(h2, selw_ref, b2d):
        gs = [
            jax.lax.dot_general(
                selw_ref[k], h2.astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for k in range(3)
        ]
        z = jnp.zeros((vb, 1), jnp.float32)
        left = jnp.concatenate([z, gs[0][:, :-1]], axis=1)
        right = jnp.concatenate([gs[2][:, 1:], z], axis=1)
        return left + gs[1] + right + b2d

    def kernel(latent_ref, gcol_ref, sel_ref, u1_ref, u2_ref,
               w1, b1, w2, b2, w3, b3, w4, b4, b5_2d, out_ref):
        # latent block: [bt*256, 128] (beats stacked down sublanes);
        # repeat by VT gives rows (v, b, c) — the full tiled latent.
        lat_rep = pltpu.repeat(latent_ref[0].astype(dtype), vt, axis=0)
        h = lat_rep * gcol_ref[0, 0].astype(dtype)             # [vb*256, 128]
        h = upconv(h, w1[:], b1[:], u1_ref[:], 256, FEAT)      # [vb*128, 256]
        h = conv(h, w2[:], b2[:], 128, 2 * FEAT, True)         # [vb*128, 256]
        h = upconv(h, w3[:], b3[:], u2_ref[:], 128, 2 * FEAT)  # [vb*64, 512]
        h = conv(h, w4[:], b4[:], 64, SEQ, True, carry_f32=True)
        h = conv5_selw(h, sel_ref, b5_2d[:])                   # [vb, 512] f32
        out_ref[0, 0] = jax.nn.sigmoid(h / 3.0)

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    call = pl.pallas_call(
        kernel,
        # beat tile on the SLOW grid axis: the latent block index only
        # changes n_bt times per launch, so Mosaic re-fetches it rarely
        grid=(n_bt, n_vt),
        in_specs=[
            pl.BlockSpec((1, bt * 256, FEAT), lambda nb, nv: (nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, vb * 256, 1), lambda nb, nv: (nv, nb, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        # rows stay (v, b)-ordered per program; the [n_vt, n_bt, vb, SEQ]
        # layout keeps the block's last-two dims tile-aligned (vb % 8, 512)
        out_specs=pl.BlockSpec((1, 1, vb, SEQ), lambda nb, nv: (nv, nb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_vt, n_bt, vb, SEQ), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
    )

    u1 = df.upsample_shift_matrices(FEAT, dtype)
    u2 = df.upsample_shift_matrices(2 * FEAT, dtype)
    wargs = (folded["w1"], folded["b1"], folded["w2"], folded["b2"],
             folded["w3"], folded["b3"], folded["w4"], folded["b4"],
             folded["b5"].reshape(1, 1))

    def prep(g):
        # [B, V, 256] -> [n_vt, n_bt, vb*256, 1] gate column in (v, b, c)
        # row order (XLA-side transpose; the kernel sees a plain block)
        g5 = g.transpose(1, 0, 2).reshape(n_vt, vt, n_bt, bt, 256)
        return g5.transpose(0, 2, 1, 3, 4).reshape(n_vt, n_bt, vb * 256, 1)

    def lat_prep(lat):
        return lat.reshape(n_bt, bt * 256, FEAT)

    def unscramble(out):
        # [n_vt, n_bt, vt*bt, SEQ] -> [B, V, SEQ]
        o5 = out.reshape(n_vt, n_bt, vt, bt, SEQ)
        return o5.transpose(1, 3, 0, 2, 4).reshape(B, V, SEQ)

    @jax.jit
    def chain(lat, gg):
        lp = lat_prep(lat)

        def body(c, g_step):
            # include the output unscramble: production callers would pay it
            out = unscramble(call(lp, prep(g_step), selw, u1, u2, *wargs))
            return c + out.sum(), None

        acc, _ = jax.lax.scan(body, 0.0, gg)
        return acc

    try:
        out_b = call(lat_prep(latent), prep(gates_k[0]), selw, u1, u2, *wargs)
        out_b = np.asarray(jax.jit(unscramble)(out_b))  # [B, V, SEQ]
    except Exception as e:  # noqa: BLE001
        print(f"beattile FAILED: {str(e)[:400]}", flush=True)
        return
    out_a = df.fused_decode_views(folded, latent.astype(dtype),
                                  gates_k[0].astype(dtype), v_tile=16)
    a = np.asarray(out_a, np.float64).ravel()
    bvals = np.asarray(out_b, np.float64).ravel()
    corr = np.corrcoef(a, bvals)[0, 1]
    print(f"beattile vs production: corr {corr:.7f} mae {np.abs(a - bvals).mean():.2e}",
          flush=True)

    float(chain(latent, gates_k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(latent, gates_k))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) / K
    print(f"beattile vt{vt} bt{bt}: {med * 1e3:7.3f} ms/launch "
          f"({B * V / med:,.0f} views/s decode-chain)", flush=True)


if __name__ == "__main__":
    main()
