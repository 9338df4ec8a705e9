"""Per-stage cost breakdown of the fused decoder kernel on the real TPU.

Builds truncated variants of the kernel (stop after stage k, reduce the live
activation into the output so nothing is DCE'd) and reports successive
timing differences. This is the ground truth for optimization decisions —
FLOP models mispredicted this kernel once already (the M=1 conv5 matmul was
NOT the bottleneck).

Usage: python tools/bench_kernel_stages.py [f32|bf16] [v_tile]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(mode="bf16", v_tile=16):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from electrocardio_panorama_tpu.ops.pallas import decoder_fused as df

    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    vt = int(v_tile)
    B, V, K = 32, 336, 8

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(B, 256, df.FEAT)).astype(np.float32))
    # K DISTINCT gate stacks: a loop-invariant gates operand lets XLA hoist
    # the whole pallas_call out of the scan and the "K launches" collapse to
    # one (this burned us once -- treat any suspiciously fast number as a
    # hoisted single launch)
    gates_k = jnp.asarray(rng.normal(size=(K, B, V, 256)).astype(np.float32))

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    folded = df.fold_decoder_bn(params, bn_state, dtype=dtype)

    STAGES = ["gate", "upconv1", "conv2", "upconv2", "conv4", "conv5"]

    def kernel(latent_ref, gates_ref, u1_ref, u2_ref, e_ref, t_ref,
               w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
               out_ref, *, stop: str):
        latent_ = latent_ref[0]
        gates_ = gates_ref[0]
        # mirror the production kernel's storage-aware gate precision
        gate_dot = df._dot_f32 if dtype == jnp.float32 else df._dot_fast
        h = (gate_dot(gates_.T, e_ref[:]) * gate_dot(latent_, t_ref[:])).astype(dtype)
        done = stop == "gate"
        if not done:
            h = df._upconv3(h, w1[:], b1[:], u1_ref[:], vt, df.FEAT, True)
            done = stop == "upconv1"
        if not done:
            h = df._conv3(h, w2[:], b2[:], 2 * df.FEAT, True)
            done = stop == "conv2"
        if not done:
            h = df._upconv3(h, w3[:], b3[:], u2_ref[:], vt, 2 * df.FEAT, True)
            done = stop == "upconv2"
        if not done:
            h = df._conv3(h, w4[:], b4[:], df.SEQ, True, carry_f32=True)
            done = stop == "conv4"
        if not done:
            h = df._conv3(h, w5[:], b5[:], df.SEQ, False, carry_f32=True)
            out_ref[0] = jax.nn.sigmoid(h / 3.0).reshape(vt, df.SEQ)
            return
        # keep the truncated pipeline live: reduce into the output block
        red = jnp.sum(h.astype(jnp.float32), axis=0, keepdims=True)  # [1, vt*T]
        out_ref[0] = jnp.zeros((vt, df.SEQ), jnp.float32) + red.sum()

    def build(stop):
        n_vt = V // vt if V % vt == 0 else V // vt + 1
        Vp = n_vt * vt
        g = gates_k
        if Vp != V:
            g = jnp.concatenate([g, jnp.zeros((K, B, Vp - V, 256), g.dtype)], axis=2)
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14
        call = pl.pallas_call(
            functools.partial(kernel, stop=stop),
            grid=(B, n_vt),
            in_specs=[
                pl.BlockSpec((1, 256, df.FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, vt, 256), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec((1, vt, df.SEQ), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Vp, df.SEQ), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df.VMEM_LIMIT_BYTES),
        )

        @jax.jit
        def chain(lat, gg):
            def body(c, g_step):
                e_sel, t_sel = df.gate_selectors(vt)
                out = call(
                    lat, g_step,
                    df.upsample_shift_matrices(df.FEAT, dtype),
                    df.upsample_shift_matrices(2 * df.FEAT, dtype),
                    e_sel, t_sel,
                    folded["w1"], folded["b1"], folded["w2"], folded["b2"],
                    folded["w3"], folded["b3"], folded["w4"], folded["b4"],
                    folded["w5"], folded["b5"],
                )
                return c + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, gg)
            return acc

        return chain

    prev = 0.0
    print(f"mode={mode} v_tile={vt}  (times per launch of {B}x{V} views)")
    for stop in STAGES:
        chain = build(stop)
        float(chain(latent, gates_k))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(latent, gates_k))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) / K
        print(f"  through {stop:6s}: {med*1e3:7.3f} ms  (+{(med-prev)*1e3:6.3f} ms)")
        prev = med


if __name__ == "__main__":
    main(*sys.argv[1:])
