"""Round-3 kernel variant matrix, measured on the real TPU.

The round-3 stage profile (bench_kernel_stages bf16 16) put the launch at
16.8 ms: gate 4.8, upconv1 4.3, conv2 1.2, upconv2 4.6, conv4 1.2, conv5 0.9.
The FLOP-ideal split is ~0.5 / 2.7 / 1.4 / 3.4 / 0.7 / 0.05 — the GATE stage
is the dominant overhead (not conv2/4/5 as round-2 guessed), so the variants
here attack it first:

  gate_bf16   : selector dots emit bf16 (preferred_element_type) + bf16
                multiply. Callers already quantize latent/gates to bf16, so
                the product rounds identically to the f32-compute path.
  gate_tiled  : the T-matmul (latent tiled across views) is a PURE BROADCAST
                of the per-beat latent — precompute it in XLA and DMA it as a
                block (same block for all view tiles of a beat -> Mosaic skips
                redundant copies), keeping only the E-dot in-kernel.
  conv5_stack : stack the three [1, 64] tap rows into ONE [3, 64] matmul (one
                read of the f32 activation instead of three) and combine rows
                with lane-shifted adds on [1, n] slices.
  conv4_mstack/conv2_mstack : M-side tap stacking [3*Cout, Cin] @ h — one
                read of h, no input-side shift copies/masks; per-tap f32
                outputs sliced on sublanes and shift-added in f32 (same
                accumulation precision as the per-tap form). This is NOT the
                round-2 "merged-tap" K-side stacking (which built a 3x
                activation operand and lost).

Usage: python tools/bench_kernel_variants2.py [combos...]
Each combo is a comma-joined set, e.g. base gate_bf16 gate_tiled,conv5_stack
Default: a ladder from base to all-winners.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(*combos):
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from electrocardio_panorama_tpu.ops.pallas import decoder_fused as df

    dtype = jnp.bfloat16
    vt = int(os.environ.get("VT", "16"))
    B, V, K = 32, 336, 8
    n_vt = (V + vt - 1) // vt
    Vp = n_vt * vt

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(B, 256, df.FEAT)).astype(np.float32))
    gates_k = jnp.asarray(rng.normal(size=(K, B, Vp, 256)).astype(np.float32))

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    folded = df.fold_decoder_bn(params, bn_state, dtype=dtype)

    def conv_mstack(h, w_taps, b, vtv, t, relu, *, carry_f32=False):
        """M-side stacked taps: one [3*Cout, Cin] matmul (ONE read of h), f32
        per-tap outputs combined by lane-shifted adds."""
        c, n = h.shape
        od = w_taps.dtype
        cout = w_taps.shape[1]
        wstack = w_taps.reshape(3 * cout, c)
        g = df._dot_f32(wstack, h.astype(od))  # [3*Cout, n] f32
        g0, g1, g2 = g[:cout], g[cout:2 * cout], g[2 * cout:]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % t
        zero_col = jnp.zeros((cout, 1), g.dtype)
        left = jnp.concatenate([zero_col, g0[:, : n - 1]], axis=1) * (pos != 0)
        right = jnp.concatenate([g2[:, 1:], zero_col], axis=1) * (pos != t - 1)
        acc = left + g1 + right + b[:, None]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        return acc if carry_f32 else acc.astype(h.dtype)

    def conv5_stack(h, w_taps, b, vtv, t):
        """Cout==1: all three tap rows in one matmul (padded to M=8 — Mosaic's
        compile helper crashed on M=3); combine rows with shifts on [1, n]."""
        c, n = h.shape
        od = w_taps.dtype
        w3 = w_taps.reshape(3, c)  # Cout==1
        w8 = jnp.concatenate([w3, jnp.zeros((5, c), w3.dtype)], axis=0)
        g = df._dot_f32(w8, h.astype(od))  # [8, n] f32
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % t
        z = jnp.zeros((1, 1), g.dtype)
        left = jnp.concatenate([z, g[0:1, : n - 1]], axis=1) * (pos != 0)
        right = jnp.concatenate([g[2:3, 1:], z], axis=1) * (pos != t - 1)
        return left + g[1:2] + right + b[:, None]

    def make_kernel(flags):
        gate_bf16 = "gate_bf16" in flags
        gate_tiled = "gate_tiled" in flags

        def kernel(*refs, flags=flags):
            if gate_tiled:
                (latent_ref, lat_tiled_ref, gates_ref, u1_ref, u2_ref, e_ref, t_ref,
                 w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref) = refs
            else:
                (latent_ref, gates_ref, u1_ref, u2_ref, e_ref, t_ref,
                 w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref) = refs
            gates_ = gates_ref[0]
            if gate_bf16:
                # E-dot keeps f32 accumulate (Mosaic rejects bf16-out matmul),
                # rounds to bf16, multiplies in bf16 with a pltpu.repeat-tiled
                # latent (tile across views == concat-repeat; no T-matmul)
                g_exp = df._dot_fast(gates_.T, e_ref[:]).astype(dtype)
                lat_t = pltpu.repeat(latent_ref[0].astype(dtype), vt, axis=1)
                h = g_exp * lat_t
            elif gate_tiled:
                # same but the tiled latent arrives via DMA (precomputed)
                g_exp = df._dot_fast(gates_.T, e_ref[:]).astype(dtype)
                h = g_exp * lat_tiled_ref[0]
            else:
                h = (df._dot_fast(gates_.T, e_ref[:])
                     * df._dot_fast(latent_ref[0], t_ref[:])).astype(dtype)

            h = df._upconv3(h, w1[:], b1[:], u1_ref[:], vt, df.FEAT, True)
            if "conv2_mstack" in flags:
                h = conv_mstack(h, w2[:], b2[:], vt, 2 * df.FEAT, True)
            else:
                h = df._conv3(h, w2[:], b2[:], 2 * df.FEAT, True)
            h = df._upconv3(h, w3[:], b3[:], u2_ref[:], vt, 2 * df.FEAT, True)
            if "conv4_mstack" in flags:
                h = conv_mstack(h, w4[:], b4[:], vt, df.SEQ, True, carry_f32=True)
            else:
                h = df._conv3(h, w4[:], b4[:], df.SEQ, True, carry_f32=True)
            if "conv5_stack" in flags:
                h = conv5_stack(h, w5[:], b5[:], vt, df.SEQ)
            else:
                h = df._conv3(h, w5[:], b5[:], df.SEQ, False, carry_f32=True)
            out_ref[0] = jax.nn.sigmoid(h / 3.0).reshape(vt, df.SEQ).astype(out_ref.dtype)

        return kernel

    e_sel, t_sel = df.gate_selectors(vt)
    u1 = df.upsample_shift_matrices(df.FEAT, dtype)
    u2 = df.upsample_shift_matrices(2 * df.FEAT, dtype)

    def build(flags):
        gate_tiled = "gate_tiled" in flags
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14
        in_specs = [
            pl.BlockSpec((1, 256, df.FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        if gate_tiled:
            in_specs.append(pl.BlockSpec(
                (1, 256, vt * df.FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, vt, 256), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM))
        call = pl.pallas_call(
            make_kernel(flags),
            grid=(B, n_vt),
            in_specs=in_specs + weight_specs,
            out_specs=pl.BlockSpec((1, vt, df.SEQ), lambda b, v: (b, v, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Vp, df.SEQ), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
        )

        @jax.jit
        def chain(lat, gg):
            extra = ()
            if gate_tiled:
                lat16 = lat.astype(dtype)
                extra = (jnp.tile(lat16, (1, 1, vt)),)

            def body(c, g_step):
                out = call(
                    lat, *extra, g_step, u1, u2, e_sel, t_sel,
                    folded["w1"], folded["b1"], folded["w2"], folded["b2"],
                    folded["w3"], folded["b3"], folded["w4"], folded["b4"],
                    folded["w5"], folded["b5"],
                )
                return c + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, gg)
            return acc

        return chain

    if not combos:
        combos = [
            "base",
            "gate_bf16",
            "gate_tiled",
            "conv5_stack",
            "gate_bf16,conv5_stack",
        ]

    # reference output for numerics check
    ref_chain = build(frozenset())
    float(ref_chain(latent, gates_k))
    for combo in combos:
        flags = frozenset() if combo == "base" else frozenset(combo.split(","))
        try:
            chain = build(flags)
            float(chain(latent, gates_k))  # compile
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(chain(latent, gates_k))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts)) / K
            print(f"  {combo:55s}: {med*1e3:7.3f} ms/launch "
                  f"({B*Vp/med:,.0f} views/s decode-chain)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"  {combo:55s}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
