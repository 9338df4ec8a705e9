"""Isolate which bf16 op crashes the Mosaic compiler (remote compile helper).

Runs a series of minimal Pallas kernels, each exercising ONE primitive the
fused decoder needs in bf16, smallest shapes first. Prints OK/CRASH per probe.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

bf = jnp.bfloat16


def run(name, kernel, out_shape, *args):
    t0 = time.perf_counter()
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        np.asarray(out)
        print(f"[{name}] OK ({time.perf_counter()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"[{name}] CRASH ({time.perf_counter()-t0:.1f}s): {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    C, VT, T = 32, 16, 128
    x3 = jnp.asarray(rng.standard_normal((C, VT, T)), bf)
    x2 = jnp.asarray(rng.standard_normal((C, VT * T)), bf)
    a = jnp.asarray(rng.standard_normal((64, 128)), bf)
    b = jnp.asarray(rng.standard_normal((128, 256)), bf)
    g = jnp.asarray(rng.standard_normal((VT, 256)), bf)

    # 1. bf16 matmul, f32 accum
    run("dot_bf16", lambda ar, br, o: o.__setitem__(
        slice(None), jax.lax.dot_general(
            ar[:], br[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(bf)),
        jax.ShapeDtypeStruct((64, 256), bf), a, b)

    # 2. reshape merge sublane->lane (the layout the whole kernel relies on)
    run("reshape_merge", lambda xr, o: o.__setitem__(
        slice(None), xr[:].reshape(C, VT * T)),
        jax.ShapeDtypeStruct((C, VT * T), bf), x3)

    # 3. reshape split lane->sublane
    run("reshape_split", lambda xr, o: o.__setitem__(
        slice(None), xr[:].reshape(C, VT, T)),
        jax.ShapeDtypeStruct((C, VT, T), bf), x2)

    # 4. lane-dim shift (slice + concat on the last axis)
    def shift_k(xr, o):
        xv = xr[:]
        z = jnp.zeros((C, VT, 1), bf)
        o[:] = jnp.concatenate([z, xv[:, :, :-1]], axis=2)
    run("lane_shift", shift_k, jax.ShapeDtypeStruct((C, VT, T), bf), x3)

    # 5. sublane concat (tap stacking)
    def cat_k(xr, o):
        xv = xr[:]
        o[:] = jnp.concatenate([xv, xv, xv], axis=0)
    run("sublane_concat", cat_k, jax.ShapeDtypeStruct((3 * C, VT * T), bf), x2)

    # 6. transpose (VT,256)->(256,VT)
    run("transpose", lambda gr, o: o.__setitem__(slice(None), gr[:].T),
        jax.ShapeDtypeStruct((256, VT), bf), g)

    # 7. 3-D broadcast multiply (the gating)
    lat = jnp.asarray(rng.standard_normal((256, 128)), bf)
    def gate_k(gr, lr, o):
        h = gr[:].T[:, :, None] * lr[:][:, None, :]
        o[:] = h.reshape(256, VT * 128)
    run("gate_bcast", gate_k, jax.ShapeDtypeStruct((256, VT * 128), bf), g, lat)

    # 8. reshape merging major dims for the upsample ((C*VT, N) view)
    def up_k(xr, ur, o):
        hv = xr[:].reshape(C * VT, T)
        out = jax.lax.dot_general(
            hv, ur[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(bf)
        o[:] = out.reshape(C, VT * 2 * T)
    u = jnp.asarray(rng.standard_normal((T, 2 * T)), bf)
    run("upsample_mm", up_k, jax.ShapeDtypeStruct((C, VT * 2 * T), bf), x2, u)


if __name__ == "__main__":
    sys.exit(main())
