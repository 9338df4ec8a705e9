"""Timing experiment: fused decoder variants on the real TPU.

Chains K kernel calls per timing sample (lax.scan over view stacks) so the
~36 ms tunnel RTT is amortized to <5% of each sample. Writes JSON to stdout.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _synth_batch  # noqa: E402
from electrocardio_panorama_tpu.config import get_cfg  # noqa: E402
from electrocardio_panorama_tpu.models import build_model  # noqa: E402
from electrocardio_panorama_tpu.models.nefnet import query_gates  # noqa: E402
from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (  # noqa: E402
    fold_decoder_bn,
    fused_decode_views,
)


def main():
    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    B, V, K = 32, 336, 8
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    fargs = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["rois"]),
    )
    vstack = rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32)
    results = {}

    def run(name, storage_dtype, v_tile):
        folded = fold_decoder_bn(params, bn_state, dtype=storage_dtype)

        @jax.jit
        def chain(p, f, data, input_theta, rois, vs):
            latent = model.encode(p, data, input_theta, rois).latent_all
            latent = latent.astype(storage_dtype)

            def body(carry, v):
                gates = query_gates(p, v).astype(storage_dtype)
                out = fused_decode_views(f, latent, gates, v_tile=v_tile)
                return carry + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

        args = (params, folded, *fargs, jnp.asarray(vstack))
        t0 = time.perf_counter()
        float(chain(*args))  # compile + first run
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(chain(*args))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results[name] = {
            "views_per_s": K * B * V / med,
            "sample_s": med,
            "std_pct": 100 * float(np.std(ts) / med),
            "compile_s": round(compile_s, 1),
        }
        print(f"[{name}] {results[name]}", flush=True)

    for name, dt, vt in [
        ("f32_vt24", jnp.float32, 24),
        ("bf16_vt16", jnp.bfloat16, 16),
        ("bf16_vt32", jnp.bfloat16, 32),
        ("f32_vt16", jnp.float32, 16),
        ("f32_vt32", jnp.float32, 32),
    ]:
        try:
            run(name, dt, vt)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"error": str(e)[:300]}
            print(f"[{name}] ERROR {str(e)[:300]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
