"""v_tile sweep for the dot-fused bf16 decoder kernel (production body).

The last v_tile sweep (16/32/48) predates the packed-gate + dot-fusion
rewrites, and the fresh stage profile puts ~3.2 ms/launch of per-program
fixed cost across 672 programs at v_tile=16 — so re-measure: v_tile=32
halves the program count (with 16 padded views at V=336), v_tile=48 gives
exactly 7 tiles with zero padding. Methodology identical to bench.py's
fused path (encode once + K scan-chained sweeps inside one jit, RTT
subtracted); outputs are parity-checked against the v_tile=16 production
configuration before timing.

Usage: python tools/bench_vtile_sweep.py [K] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(k=32, reps=5):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates
    from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
        fold_decoder_bn,
        fused_decode_views,
        validate_v_tile,
        vmem_bytes_estimate,
    )

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    B, V, K = 32, 336, int(k)
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    fargs = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["rois"]),
    )
    vstack = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32))
    folded = fold_decoder_bn(params, bn_state, dtype=jnp.bfloat16)

    # measure tunnel RTT the way bench.py does (trivial jitted op)
    triv = jax.jit(lambda x: x + 1.0)
    float(triv(jnp.float32(0.0)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt {rtt*1e3:.1f} ms  B={B} V={V} K={K}")

    # parity: one sweep per v_tile vs the production v_tile=16 output
    latent = model.encode(params, *fargs).latent_all.astype(jnp.bfloat16)
    gates = query_gates(params, vstack[0]).astype(jnp.bfloat16)
    ref = np.asarray(fused_decode_views(folded, latent, gates, v_tile=16))

    for vt in (16, 32, 48):
        try:
            validate_v_tile(vt, jnp.bfloat16)
        except ValueError as e:
            print(f"v_tile={vt}: skipped ({e})")
            continue
        out = np.asarray(fused_decode_views(folded, latent, gates, v_tile=vt))
        mx = np.abs(out - ref).max()
        est = vmem_bytes_estimate(vt, jnp.bfloat16) / 2**20

        @jax.jit
        def chain(p, f, data, input_theta, rois, vs, _vt=vt):
            lat = model.encode(p, data, input_theta, rois).latent_all
            lat = lat.astype(jnp.bfloat16)

            def body(carry, v):
                g = query_gates(p, v).astype(jnp.bfloat16)
                o = fused_decode_views(f, lat, g, v_tile=_vt)
                return carry + o.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

        args = (params, folded, *fargs, vstack)
        float(chain(*args))  # compile
        ts = []
        for _ in range(int(reps)):
            t0 = time.perf_counter()
            float(chain(*args))
            ts.append(time.perf_counter() - t0)
        med = max(float(np.median(ts)) - rtt, 1e-9)
        vps = K * B * V / med
        print(f"v_tile={vt:2d}: {vps:11.1f} views/s  ({med/K*1e3:6.3f} ms/launch)"
              f"  vmem_est {est:5.1f} MiB  max|d| vs vt16 {mx:.2e}")


if __name__ == "__main__":
    main(*sys.argv[1:])
