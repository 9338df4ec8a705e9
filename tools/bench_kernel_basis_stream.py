"""On-chip A/B of the streamed-U basis decoder kernel (VERDICT r4 item 1).

Round 4 shipped the basis decode with y1 MATERIALIZED in XLA: the mix
output [B, V, 128, 256] (~700 MB at B=32, V=336 bf16) makes an HBM round
trip that eats the 5.2 ms/launch of removed stage time (docs/KERNELS.md).
This tool measures the fix — stream the per-beat U basis planes
([J, 128, 256], fetched once per beat on the (B, vt) grid) and run the
[vt, J] mix INSIDE the kernel — in both mix forms:

  * head='stream':        f-batched MXU dot + (1,0,2) transpose into
                          (view, channel) rows (6.8 MMACs/program);
  * head='stream_scalar': per-(view, j) scalar-coefficient VPU
                          accumulation (no transpose; ep via SMEM).

Methodology identical to bench.py's full-workload chain (encode once +
per-sweep angular encodings + fused decode, K sweeps scan-chained in ONE
jit, RTT-subtracted) so the winner's number is directly comparable to the
headline. Parity is checked on chip against the materialized-y1 kernel
(same algebra, so bf16 heads compare at rounding noise) and the f32 XLA
decoder.

Usage: python tools/bench_kernel_basis_stream.py [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(K=32):
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates
    from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
        fold_decoder_bn, fused_decode_views)
    from electrocardio_panorama_tpu.ops.theta import angular_encode
    from __graft_entry__ import _synth_batch

    K = int(K)
    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))

    B, V = 32, 336
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    fargs = (jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
             jnp.asarray(batch["rois"]))
    vstack = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32))

    # tunnel RTT (bench.py methodology)
    @jax.jit
    def triv(x):
        return x + 1.0

    float(triv(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(triv(jnp.float32(0.0)))
    rtt = (time.perf_counter() - t0) / 20

    # ---- parity on chip -----------------------------------------------------
    latent = jax.jit(
        lambda p, d, it, r: model.encode(p, d, it, r).latent_all
    )(params, *fargs)
    enc1 = angular_encode(vstack[0], 1)
    ref = None
    for dt, vt, tag in [(jnp.float32, 8, "f32"), (jnp.bfloat16, 16, "bf16")]:
        folded = fold_decoder_bn(params, bn_state, dtype=dt)
        lat = latent.astype(dt)
        outs = {}
        for h in ("y1", "stream", "stream_scalar"):
            try:
                outs[h] = np.asarray(fused_decode_views(
                    folded, lat, enc=enc1, v_tile=vt, head=h), np.float64)
            except Exception as e:  # noqa: BLE001
                print(f"parity {tag} {h}: FAILED {str(e)[:300]}", flush=True)
        if "y1" not in outs:
            continue
        if dt == jnp.float32:
            ref = outs["y1"]
        for h, o in outs.items():
            base = outs["y1"]
            d = np.abs(o - base)
            line = f"parity {tag} {h:14s} vs y1: mae {d.mean():.2e} max {d.max():.2e}"
            if ref is not None:
                c = np.corrcoef(o.ravel(), ref.ravel())[0, 1]
                line += f" | corr vs f32-y1 {c:.7f}"
            print(line, flush=True)

    # ---- throughput (bench.py full-workload chain) --------------------------
    def bench(name, storage_dtype, v_tile, head=None):
        folded = fold_decoder_bn(params, bn_state, dtype=storage_dtype)

        @jax.jit
        def chain(p, f, data, input_theta, rois, vs):
            lat = model.encode(p, data, input_theta, rois).latent_all
            lat = lat.astype(storage_dtype)

            def body(carry, v):
                if head is None:
                    gates = query_gates(p, v).astype(storage_dtype)
                    out = fused_decode_views(f, lat, gates, v_tile=v_tile)
                else:
                    out = fused_decode_views(
                        f, lat, enc=angular_encode(v, 1), v_tile=v_tile,
                        head=head)
                return carry + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

        try:
            args = (params, folded, *fargs, vstack)
            float(chain(*args))
            ts = []
            for _ in range(5):
                t = time.perf_counter()
                float(chain(*args))
                ts.append(time.perf_counter() - t)
            med = max(float(np.median(ts)) - rtt, 1e-9)
            print(f"{name:28s} {med / K * 1e3:7.3f} ms/launch  "
                  f"{K * B * V / med:>12,.0f} views/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {str(e)[:300]}", flush=True)

    for dt, vt, tag in [(jnp.bfloat16, 16, "bf16"), (jnp.float32, 8, "f32")]:
        if dt == jnp.bfloat16:
            bench(f"gatekernel_{tag}", dt, vt, head=None)
        bench(f"basis_y1_{tag}", dt, vt, head="y1")
        bench(f"basis_stream_{tag}", dt, vt, head="stream")
        bench(f"basis_stream_scalar_{tag}", dt, vt, head="stream_scalar")
    # f32 v_tile sensitivity for the winner (f32 ran vt=8 historically)
    bench("basis_stream_f32_vt16", jnp.float32, 16, head="stream")


if __name__ == "__main__":
    main(*sys.argv[1:])
