"""Measure data-layout variants of the encode-side grouped convs, fwd+bwd,
on the real TPU.

tools/bench_encode_parts.py puts the encode side at 1.68 ms/step (bf16,
batch 32) vs a ~0.5 ms stage-sum FLOP ideal; conv1d_mm already showed the
matmul FORM is not the lever (ties lax.conv). The remaining hypotheses are
data LAYOUT:

  * nch      — baseline: lax.conv in NCH (torch layout; T rides the lanes)
  * nhc      — channels-last: lax.conv in NHC (C rides the lanes — the
               layout TPU XLA natively tiles; x pre-transposed, as a whole
               NHC-resident model would keep it)
  * bg_nch   — groups folded into batch: [B, G*c, T] -> vmap over a
               [G, B, c, T] view, dense conv per group
  * bg_nhc   — both.

Methodology: each jitted step applies the conv DEPTH times back-to-back
(relu between applications so XLA cannot collapse the stack), K-chained
under scan. Per-application cost is the DIFFERENCE QUOTIENT between two
depths — (t(d2) - t(d1)) / (d2 - d1) — which cancels the per-step floor
(loss + grad reductions, scan bookkeeping, tunnel RTT) exactly; a first
run of this tool without the quotient was floor-dominated (~0.24 ms/step
swamped every conv under test).

Numerics are cross-checked against the baseline in f64 on the same inputs.

MEASUREMENT OUTCOME (v5e, bf16, K=64, depths 2->8, ms/application fwd+bwd):

  k7 g3  [32,384,128] (tower x6):  nch 0.040  nhc 0.050  bg 0.048
  k3 g3  [32,384,128] (wconv x2):  nch 0.039  nhc 0.025  bg 0.020
  k3 g3  [32,192,128] (zconv x4):  nch 0.017  nhc 0.016  bg 0.019
  k3 g21 [32,1344,32] (z2conv2 x2): nch 0.029  nhc 0.025  bg 0.028

The tower's k7 convs sit AT their fwd+bwd FLOP roofline (0.043 ms ideal at
197 TF bf16) in the baseline NCH form — layout is NOT the lever, and the
only variant win (wconv in bg form, 2x) is worth ~0.04 ms of the step.
The decisive number is the SUM: all encode-side convs together cost
~0.44 ms while the encode side measures 1.68 ms (bench_encode_parts) —
the remaining ~1.2 ms is inter-op glue (dropout masks, residual/relu
elementwise, backward's saved-activation HBM traffic, fusion-boundary
scheduling), which no layout change touches. Closing it needs a fused
encode-side Pallas kernel (one HBM read, one write, recompute-backward),
not better conv placement. Model keeps conv1d/NCH.

Usage: python tools/bench_conv_layouts.py [f32|bf16] [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

D1, D2 = 2, 8


def _time(fn, args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(mode="bf16", k_chain=64):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from electrocardio_panorama_tpu.ops.convs import _precision, conv1d

    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    B, K_CHAIN = 32, int(k_chain)
    rng = np.random.default_rng(0)

    def conv_nhc(x_nhc, w, padding, groups):
        # x [B, T, C]; w torch [O, I/g, K] -> HIO [K, I/g, O]
        dn = lax.conv_dimension_numbers(
            x_nhc.shape, (w.shape[2], w.shape[1], w.shape[0]), ("NHC", "HIO", "NHC"))
        return lax.conv_general_dilated(
            x_nhc, jnp.transpose(w, (2, 1, 0)), (1,), [(padding, padding)],
            dimension_numbers=dn, feature_group_count=groups,
            precision=_precision(x_nhc))

    CASES = [
        # (name, x shape NCH, w shape [O, I/g, K] with O == C, groups, note)
        ("k7 g3  [32,384,128]", (B, 384, 128), (384, 128, 7), 3, "tower x6"),
        ("k3 g3  [32,384,128]", (B, 384, 128), (384, 128, 3), 3, "wconv x2"),
        ("k3 g3  [32,192,128]", (B, 192, 128), (192, 64, 3), 3, "zconv x4"),
        ("k3 g21 [32,1344,32]", (B, 1344, 32), (1344, 64, 3), 21, "z2conv2 x2"),
    ]
    print(f"conv layout bench mode={mode} B={B} K={K_CHAIN} depths {D1}->{D2} "
          f"(ms/application, fwd+bwd, floor-cancelled)", flush=True)
    for name, xshape, wshape, g, note in CASES:
        x = jnp.asarray(rng.normal(size=xshape).astype(np.float32)).astype(dtype)
        w = jnp.asarray(rng.normal(size=wshape).astype(np.float32) * 0.05).astype(dtype)
        pad = wshape[2] // 2
        Bx, C, T = xshape
        cpg = C // g
        x_bg = x.reshape(Bx, g, cpg, T).transpose(1, 0, 2, 3)  # [g, B, c/g, T]

        def conv_bg_nch(xi, w):
            wg = w.reshape(g, C // g, cpg, wshape[2])
            return jax.vmap(lambda xg, wgg: conv1d(xg, wgg, padding=pad, groups=1)
                            )(xi, wg)

        def conv_bg_nhc(xi, w):
            wg = w.reshape(g, C // g, cpg, wshape[2])
            return jax.vmap(lambda xg, wgg: conv_nhc(xg, wgg, pad, 1))(xi, wg)

        def per_app(form, xrep):
            xs = jnp.stack([xrep + 1e-3 * k for k in range(K_CHAIN)])

            def chain(depth):
                @jax.jit
                def f(w, xs):
                    def body(c, xi):
                        def loss(w):
                            y = xi
                            for _ in range(depth):
                                y = jax.nn.relu(form(y, w))
                            return jnp.sum(y.astype(jnp.float32) ** 2)

                        l, gw = jax.value_and_grad(loss)(w)
                        return c + l + gw.astype(jnp.float32).sum(), None

                    acc, _ = jax.lax.scan(body, 0.0, xs)
                    return acc

                return f

            t1 = _time(chain(D1), (w, xs)) / K_CHAIN
            t2 = _time(chain(D2), (w, xs)) / K_CHAIN
            return (t2 - t1) / (D2 - D1)

        results = {
            "nch": per_app(lambda xi, w: conv1d(xi, w, padding=pad, groups=g), x),
            "nhc": per_app(lambda xi, w: conv_nhc(xi, w, pad, g),
                           jnp.transpose(x, (0, 2, 1))),
            "bg_nch": per_app(conv_bg_nch, x_bg),
            "bg_nhc": per_app(conv_bg_nhc, x_bg.transpose(0, 1, 3, 2)),
        }

        # numerics: every variant must equal the baseline
        y0 = np.asarray(conv1d(x, w, padding=pad, groups=g), np.float64)
        y1 = np.asarray(conv_nhc(jnp.transpose(x, (0, 2, 1)), w, pad, g),
                        np.float64).transpose(0, 2, 1)
        y2 = np.asarray(conv_bg_nch(x_bg, w), np.float64)
        y2 = y2.transpose(1, 0, 2, 3).reshape(y0.shape)
        y3 = np.asarray(conv_bg_nhc(x_bg.transpose(0, 1, 3, 2), w), np.float64)
        y3 = y3.transpose(1, 0, 3, 2).reshape(y0.shape)
        denom = np.abs(y0).mean() or 1.0
        err = max(np.abs(y0 - y).max() / denom for y in (y1, y2, y3))
        base = results["nch"]
        line = "  ".join(f"{k} {v*1e3:7.3f}ms ({base/max(v,1e-9):4.2f}x)"
                         for k, v in results.items())
        print(f"  {name} ({note}): {line}  rel-err {err:.2e}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
