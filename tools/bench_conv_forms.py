"""Measure lax.conv vs matmul-form (conv1d_mm) for the encoder's grouped
convs, fwd+bwd, on the real TPU — the train step's dominant cost
(tools/bench_train_parts.py: tower 3.7 of 6.2 ms).

Usage: python tools/bench_conv_forms.py [f32|bf16]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _time(fn, args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(mode="bf16"):
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.ops.convs import conv1d, conv1d_mm

    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    B, K_CHAIN = 32, 64
    rng = np.random.default_rng(0)

    # the tower's six k7 grouped convs (3 blocks x 2), plus z-conv k3 shapes
    CASES = [
        ("k7 g3  [32,384,128] x6", (B, 384, 128), (384, 128, 7), 3, 6),
        ("k3 g3  [32,384,128] x3", (B, 384, 128), (384, 128, 3), 3, 3),
        ("k3 g21 [32,2688,16]  x2", (B, 2688, 16), (2688, 128, 3), 21, 2),
    ]
    for name, xshape, wshape, g, reps_in_model in CASES:
        x = jnp.asarray(rng.normal(size=xshape).astype(np.float32)).astype(dtype)
        w = jnp.asarray(rng.normal(size=wshape).astype(np.float32) * 0.05).astype(dtype)
        pad = wshape[2] // 2
        xs = jnp.stack([x + 1e-3 * k for k in range(K_CHAIN)])

        def chain(form):
            @jax.jit
            def f(w, xs):
                def body(c, xi):
                    def loss(w):
                        y = form(xi, w, padding=pad, groups=g)
                        return jnp.sum(y.astype(jnp.float32) ** 2)

                    l, gw = jax.value_and_grad(loss)(w)
                    return c + l + gw.astype(jnp.float32).sum(), None

                acc, _ = jax.lax.scan(body, 0.0, xs)
                return acc

            return f

        t_conv = _time(chain(lambda x, w, padding, groups: conv1d(
            x, w, padding=padding, groups=groups)), (w, xs)) / K_CHAIN
        t_mm = _time(chain(conv1d_mm), (w, xs)) / K_CHAIN
        # numerics check
        y1 = np.asarray(conv1d(x, w, padding=pad, groups=g), np.float64)
        y2 = np.asarray(conv1d_mm(x, w, padding=pad, groups=g), np.float64)
        denom = np.abs(y1).mean() or 1.0
        print(f"  {name}: conv {t_conv*1e3:7.3f} ms  mm {t_mm*1e3:7.3f} ms  "
              f"(x{t_conv/t_mm:4.1f}; x{reps_in_model} in model; "
              f"rel-err {np.abs(y1-y2).max()/denom:.2e})", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
