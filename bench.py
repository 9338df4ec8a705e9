"""Flagship benchmark: panorama view synthesis throughput on one chip.

Workload (north-star, BASELINE.md): few-view encode ONCE per heartbeat batch,
then decode dense viewpoint sweeps — views/sec/chip end-to-end on device.

Measurement notes:
  * The axon tunnel's block_until_ready does not wait for remote execution, so
    timing forces a true data dependency: each program chains K full sweeps
    with lax.scan and returns one scalar that is pulled to host. The ~30 ms
    tunnel round-trip amortizes over K sweeps; reported throughput is the
    sustained device rate.
  * bfloat16 compute; the f32 fidelity mode is covered by the parity tests
    (waveform correlation vs the PyTorch reference > 0.999999).

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


def main():
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from __graft_entry__ import _synth_batch

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)

    dtype = jnp.bfloat16
    params, bn_state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    params_c, bn_c = cast(params), cast(bn_state)

    B, V, K = 32, 336, 8  # beats x views, K sweeps chained per program
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
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
    float(chain(*args))  # warm (compile)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(chain(*args))  # scalar pull = true execution dependency
    dt = (time.perf_counter() - t0) / n_iters
    views_per_sec = K * B * V / dt

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

    print(json.dumps({
        "metric": "panorama_views_per_sec_per_chip",
        "value": round(views_per_sec, 1),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / 50000.0, 3),
        "batch_beats": B,
        "views_per_beat": V,
        "chained_sweeps": K,
        "dtype": "bfloat16",
        "p50_latency_ms_24view_panorama_amortized": round(p50_ms, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
