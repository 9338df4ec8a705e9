"""Flagship benchmark: panorama view synthesis throughput on one chip.

Workload (north-star, BASELINE.md): few-view encode ONCE per heartbeat batch,
then decode dense viewpoint sweeps — views/sec/chip end-to-end on device.

Measurement notes:
  * The axon tunnel's block_until_ready does not wait for remote execution, so
    timing forces a true data dependency (a scalar pulled to host); the ~30 ms
    tunnel round-trip is measured with a trivial op and amortized/subtracted.
  * Two decode paths are measured and the best is reported:
      - fused Pallas decoder (f32 — FULL fidelity, BN folded, whole chain in
        VMEM; ops/pallas/decoder_fused.py);
      - pure-XLA decoder in bfloat16 (scan-chained).
    f32 parity vs the PyTorch reference is covered by the golden tests
    (waveform correlation > 0.999999).

Prints ONE JSON line:
  {"metric": "panorama_views_per_sec_per_chip", "value": N, "unit": "views/s",
   "vs_baseline": value / 50000, ...extras}

`vs_baseline` is relative to the 50k views/sec/chip north-star target
(BASELINE.json — the reference publishes no quantitative numbers; its demo
decodes 84 views sequentially per batch, demo.ipynb cells 2-4).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _rtt(jax, jnp):
    @jax.jit
    def triv(x):
        return (x * 2).sum()

    x0 = jnp.ones((8, 128))
    float(triv(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x0))
    return (time.perf_counter() - t0) / 10


def main():
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates
    from __graft_entry__ import _synth_batch

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)

    params, bn_state = model.init(jax.random.PRNGKey(0))
    B, V, K = 32, 336, 8
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    rtt = _rtt(jax, jnp)
    results = {}

    # ---- path 1: fused Pallas decoder, f32 (full fidelity)
    try:
        from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
            fold_decoder_bn,
            fused_decode_views,
        )

        folded = fold_decoder_bn(params, bn_state)
        views = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, V, 2)).astype(np.float32))
        fargs = (
            jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
            jnp.asarray(batch["rois"]),
        )

        @jax.jit
        def fused_sum(p, f, data, input_theta, rois, v):
            # full workload: encode once + gates + fused decode of the sweep
            latent = model.encode(p, data, input_theta, rois).latent_all
            gates = query_gates(p, v)
            return fused_decode_views(f, latent, gates, v_tile=24).sum()

        float(fused_sum(params, folded, *fargs, views))  # warm/compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fused_sum(params, folded, *fargs, views))
            ts.append(time.perf_counter() - t0)
        dev = max(float(np.median(ts)) - rtt, 1e-6)
        results["pallas_fused_f32"] = B * V / dev
    except Exception as e:  # noqa: BLE001 — report the fallback instead
        results["pallas_fused_f32_error"] = str(e)[:120]

    # ---- path 2: XLA decoder, bf16, scan-chained
    dtype = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    params_c, bn_c = cast(params), cast(bn_state)
    vstack = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, B, V, 2)), dtype)

    @jax.jit
    def chain(p, s, data, input_theta, rois, vs):
        latent = model.encode(p, data, input_theta, rois).latent_all

        def body(carry, v):
            out = model.decode_views(p, s, latent, v)
            return carry + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, 0.0, vs)
        return acc

    args = (
        params_c, bn_c,
        jnp.asarray(batch["data"], dtype), jnp.asarray(batch["input_theta"], dtype),
        jnp.asarray(batch["rois"]), vstack,
    )
    float(chain(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chain(*args))
    dt = (time.perf_counter() - t0) / 3
    results["xla_bf16"] = K * B * V / dt

    # p50 latency: single-beat 24-view panorama, RTT amortized over K chains
    b1 = _synth_batch(rng, B=1)
    v24 = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, 1, 24, 2)), dtype)
    args1 = (
        params_c, bn_c, jnp.asarray(b1["data"], dtype),
        jnp.asarray(b1["input_theta"], dtype), jnp.asarray(b1["rois"]), v24,
    )
    float(chain(*args1))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(chain(*args1))
        lats.append((time.perf_counter() - t0) / K)
    p50_ms = float(np.percentile(lats, 50) * 1e3)

    candidates = {k: v for k, v in results.items() if not k.endswith("_error")}
    best_path = max(candidates, key=candidates.get)
    views_per_sec = candidates[best_path]
    print(json.dumps({
        "metric": "panorama_views_per_sec_per_chip",
        "value": round(views_per_sec, 1),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / 50000.0, 3),
        "best_path": best_path,
        "paths": {k: (round(v, 1) if isinstance(v, float) else v) for k, v in results.items()},
        "batch_beats": B,
        "views_per_beat": V,
        "p50_latency_ms_24view_panorama_amortized": round(p50_ms, 3),
        "tunnel_rtt_ms": round(rtt * 1e3, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
