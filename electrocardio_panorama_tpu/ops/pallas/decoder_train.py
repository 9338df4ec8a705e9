"""Fused Pallas decoder for TRAINING — forward under train-BN semantics plus
a custom-VJP backward, so the train step's decoder no longer runs through XLA
(round-2 verdict item 1).

Semantics match the batched three-decode restructuring (models/nefnet.py train
branch, reference model_nefnet.py:167-176): the three decodes (pred,
shuffle_patient, shuffle_lead) are GROUPS. Each grid program handles one
group's full batch so BatchNorm batch statistics are local to the program:

    x_g [256, B*128] -> upconv1(w1,b1) -> BN1 -> relu -> conv2 -> BN2 -> relu
        -> upconv2(w3,b3) -> BN3 -> relu -> conv4 -> BN4 -> relu -> conv5
        -> sigmoid(./3)

(upsample+conv pairs fused by operator associativity exactly like the eval
kernel, ops/pallas/decoder_fused.py). The kernel returns the per-group BIASED
batch moments for every BN layer; the running-stat EMA chain (group order is
part of the reference semantics) applies outside in XLA via
`chain_running_stats` — identical closed form to ops.group_batch_norm1d.

The backward kernel RECOMPUTES the forward in VMEM (no activation writes to
HBM in either direction — the residuals are just the inputs) and emits dx plus
per-group weight/bias/BN-affine grads, summed over groups outside.

Batch-stat outputs are stop_gradient'd: like the XLA path, running stats are
auxiliary state, not a loss path (Solver passes new_bn through has_aux).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
    FEAT,
    SEQ,
    VMEM_LIMIT_BYTES,
    _dot_f32,
    upsample_shift_matrices,
)

EPS = 1e-5
# (channels, time-per-sample) after each BN layer
BN_SHAPES = ((128, 2 * FEAT), (128, 2 * FEAT), (64, SEQ), (64, SEQ))


# --------------------------------------------------------------- weight packing
def pack_train_weights(params: dict, dtype=jnp.float32) -> dict:
    """Tap-major conv weights + f32 biases/BN affines from the flat torch-keyed
    param dict (decoder.* keys; see models/nefnet.py init)."""
    out = {}
    convs = [
        ("decoder.1.double_conv.0", "w1", "b1"),
        ("decoder.1.double_conv.3", "w2", "b2"),
        ("decoder.3.double_conv.0", "w3", "b3"),
        ("decoder.3.double_conv.3", "w4", "b4"),
        ("decoder.4", "w5", "b5"),
    ]
    for key, wk, bk in convs:
        w = params[f"{key}.weight"].astype(jnp.float32)  # [Cout, Cin, 3]
        out[wk] = jnp.transpose(w, (2, 0, 1)).astype(dtype)  # [3, Cout, Cin]
        out[bk] = params[f"{key}.bias"].astype(jnp.float32)
    bns = [
        ("decoder.1.double_conv.1", "g1", "o1"),
        ("decoder.1.double_conv.4", "g2", "o2"),
        ("decoder.3.double_conv.1", "g3", "o3"),
        ("decoder.3.double_conv.4", "g4", "o4"),
    ]
    for key, gk, ok in bns:
        out[gk] = params[f"{key}.weight"].astype(jnp.float32)
        out[ok] = params[f"{key}.bias"].astype(jnp.float32)
    return out


BN_KEYS = (
    "decoder.1.double_conv.1",
    "decoder.1.double_conv.4",
    "decoder.3.double_conv.1",
    "decoder.3.double_conv.4",
)


def chain_running_stats(state: dict, mean, var, nb: int, momentum: float = 0.1) -> dict:
    """EMA-chain the kernel's per-group batch stats into the running stats in
    group order (closed form; identical to ops.group_batch_norm1d).

    mean/var: [G, 4, 128] f32 (channel-padded) from train_decode_groups;
    nb = per-group batch (the unbiased-variance n is nb * time per layer).
    Returns the torch-keyed running_mean/var/num_batches update dict."""
    G = mean.shape[0]
    keep = (1 - momentum) ** G
    w = momentum * (1 - momentum) ** jnp.arange(G - 1, -1, -1, dtype=jnp.float32)
    updates = {}
    for i, (key, (c, t)) in enumerate(zip(BN_KEYS, BN_SHAPES)):
        n = nb * t
        m_g = mean[:, i, :c]
        unbiased = var[:, i, :c] * n / max(n - 1, 1)
        updates[f"{key}.running_mean"] = (
            keep * state[f"{key}.running_mean"] + jnp.tensordot(w, m_g, axes=1)
        )
        updates[f"{key}.running_var"] = (
            keep * state[f"{key}.running_var"] + jnp.tensordot(w, unbiased, axes=1)
        )
        updates[f"{key}.num_batches_tracked"] = (
            state[f"{key}.num_batches_tracked"] + G
        )
    return updates


# ------------------------------------------------------------------ primitives
def _upconv_fwd(h, w_taps, b, u3, nb: int, n_in: int):
    """conv(up(h)) = sum_k W_k @ (h @ U_k) + b — pre-BN (no activation).
    h [Cin, nb*n_in] -> [Cout, nb*2*n_in] f32."""
    od = w_taps.dtype
    cout = w_taps.shape[1]
    acc = None
    for k in range(3):
        g = _dot_f32(w_taps[k], h.astype(od))
        g2 = g.astype(od).reshape(cout * nb, n_in)
        y = _dot_f32(g2, u3[k])
        acc = y if acc is None else acc + y
    return acc.reshape(cout, nb * 2 * n_in) + b[:, None]


def _upconv_bwd_dh(dy, w_taps, u3, nb: int, n_in: int):
    """dh = sum_k W_k^T @ (dy @ U_k^T). dy [Cout, nb*2n] f32 -> [Cin, nb*n] f32."""
    od = w_taps.dtype
    cout = w_taps.shape[1]
    acc = None
    for k in range(3):
        d2 = dy.astype(od).reshape(cout * nb, 2 * n_in)
        du = _dot_f32(d2, u3[k].T)                      # [Cout*nb, n_in]
        du = du.astype(od).reshape(cout, nb * n_in)
        y = _dot_f32(w_taps[k].T, du)                   # [Cin, nb*n_in]
        acc = y if acc is None else acc + y
    return acc


def _upconv_bwd_dw(dy, h, w_taps, u3, nb: int, n_in: int):
    """dW_k = dy @ (h @ U_k)^T ; db = rowsum(dy). Returns ([3, Cout, Cin], [Cout])."""
    od = w_taps.dtype
    cin = h.shape[0]
    dws = []
    for k in range(3):
        hu = _dot_f32(h.astype(od).reshape(cin * nb, n_in), u3[k])  # [Cin*nb, 2n]
        hu = hu.astype(od).reshape(cin, nb * 2 * n_in)
        dws.append(_dot_f32(dy.astype(od), hu.T.astype(od)))        # [Cout, Cin]
    return jnp.stack(dws), jnp.sum(dy, axis=1)


def _shift(h, k: int, t: int):
    """Per-sample time-shift by (k-1) with zero boundaries on [C, nb*t]."""
    if k == 1:
        return h
    c, n = h.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % t
    zero = jnp.zeros((c, 1), h.dtype)
    if k == 0:  # value from t-1 (shift right)
        s = jnp.concatenate([zero, h[:, : n - 1]], axis=1)
        return s * (pos != 0).astype(h.dtype)
    s = jnp.concatenate([h[:, 1:], zero], axis=1)  # value from t+1
    return s * (pos != t - 1).astype(h.dtype)


def _conv_fwd(h, w_taps, b, t: int):
    """k3 p1 conv, pre-BN: sum_k W_k @ shift_{k-1}(h) + b. f32 out."""
    od = w_taps.dtype
    acc = None
    for k in range(3):
        y = _dot_f32(w_taps[k], _shift(h, k, t).astype(od))
        acc = y if acc is None else acc + y
    return acc + b[:, None]


def _conv_bwd_dh(dy, w_taps, t: int):
    """dh = sum_k shift_{1-k}(W_k^T @ dy) (reverse shifts). f32."""
    acc = None
    od = w_taps.dtype
    for k in range(3):
        g = _dot_f32(w_taps[k].T, dy.astype(od))
        y = _shift(g, 2 - k, t)
        acc = y if acc is None else acc + y
    return acc


def _conv_bwd_dw(dy, h, w_taps, t: int):
    """dW_k = dy @ shift_{k-1}(h)^T ; db = rowsum(dy)."""
    od = w_taps.dtype
    dws = []
    for k in range(3):
        s = _shift(h, k, t).astype(od)
        dws.append(_dot_f32(dy.astype(od), s.T))
    return jnp.stack(dws), jnp.sum(dy, axis=1)


def _bn_fwd(a, gamma, offset, n: int):
    """Train BN over lanes. a [C, n] f32 -> (relu_out f32, xhat f32, inv [C,1],
    mean [C], var [C])."""
    mean = jnp.sum(a, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(a), axis=1, keepdims=True) / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (a - mean) * inv
    out = jnp.maximum(xhat * gamma[:, None] + offset[:, None], 0.0)
    return out, xhat, inv, mean[:, 0], var[:, 0]


def _bn_relu_bwd(dy, out, xhat, inv, gamma, n: int):
    """Backward through relu + train-BN. dy [C, n] f32; `out` is the post-relu
    activation (relu mask = out > 0). Returns (da, dgamma, dbeta)."""
    dy = dy * (out > 0).astype(dy.dtype)
    dgamma = jnp.sum(dy * xhat, axis=1)
    dbeta = jnp.sum(dy, axis=1)
    dxhat = dy * gamma[:, None]
    m1 = jnp.sum(dxhat, axis=1, keepdims=True) / n
    m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / n
    da = (dxhat - m1 - xhat * m2) * inv
    return da, dgamma, dbeta


# ---------------------------------------------------------------- forward pass
def _fwd_stages(x, w, u1, u2, nb: int):
    """The shared forward chain (used by both kernels). Returns every
    intermediate the backward needs."""
    n1 = nb * 2 * FEAT
    n2 = nb * SEQ
    a1 = _upconv_fwd(x, w["w1"], w["b1"], u1, nb, FEAT)            # [128, n1] f32
    h1, xh1, inv1, m1, v1 = _bn_fwd(a1, w["g1"], w["o1"], n1)
    h1s = h1.astype(x.dtype)
    a2 = _conv_fwd(h1s, w["w2"], w["b2"], 2 * FEAT)                # [128, n1]
    h2, xh2, inv2, m2, v2 = _bn_fwd(a2, w["g2"], w["o2"], n1)
    h2s = h2.astype(x.dtype)
    a3 = _upconv_fwd(h2s, w["w3"], w["b3"], u2, nb, 2 * FEAT)      # [64, n2]
    h3, xh3, inv3, m3, v3 = _bn_fwd(a3, w["g3"], w["o3"], n2)
    h3s = h3.astype(x.dtype)
    a4 = _conv_fwd(h3s, w["w4"], w["b4"], SEQ)                     # [64, n2]
    h4, xh4, inv4, m4, v4 = _bn_fwd(a4, w["g4"], w["o4"], n2)
    z = _conv_fwd(h4, w["w5"], w["b5"], SEQ)                       # [1, n2] f32
    out = jax.nn.sigmoid(z / 3.0)
    return dict(
        h1s=h1s, h2s=h2s, h3s=h3s, h1=h1, h2=h2, h3=h3, h4=h4,
        xh1=xh1, xh2=xh2, xh3=xh3, xh4=xh4,
        inv1=inv1, inv2=inv2, inv3=inv3, inv4=inv4,
        means=(m1, m2, m3, m4), vars_=(v1, v2, v3, v4), out=out,
    )


def _train_fwd_kernel(x_ref, u1_ref, u2_ref, *rest, nb: int):
    wrefs = rest[:18]
    out_ref, mean_ref, var_ref = rest[18:]
    names = ["w1", "b1", "g1", "o1", "w2", "b2", "g2", "o2",
             "w3", "b3", "g3", "o3", "w4", "b4", "g4", "o4", "w5", "b5"]
    w = {nm: r[:] for nm, r in zip(names, wrefs)}
    st = _fwd_stages(x_ref[0], w, u1_ref[:], u2_ref[:], nb)
    out_ref[0] = st["out"].reshape(nb, SEQ)
    for i, (m, v) in enumerate(zip(st["means"], st["vars_"])):
        c = m.shape[0]
        mean_ref[0, i, :c] = m
        var_ref[0, i, :c] = v
        if c < mean_ref.shape[2]:
            mean_ref[0, i, c:] = jnp.zeros((mean_ref.shape[2] - c,), jnp.float32)
            var_ref[0, i, c:] = jnp.zeros((var_ref.shape[2] - c,), jnp.float32)


def _train_bwd_kernel(x_ref, dout_ref, u1_ref, u2_ref, *rest, nb: int):
    wrefs = rest[:18]
    (dx_ref, dw1_ref, db1_ref, dg1_ref, do1_ref, dw2_ref, db2_ref, dg2_ref,
     do2_ref, dw3_ref, db3_ref, dg3_ref, do3_ref, dw4_ref, db4_ref, dg4_ref,
     do4_ref, dw5_ref, db5_ref) = rest[18:]

    # weight/bias/BN-affine grads ACCUMULATE across the sequential group grid
    # into whole-array output blocks (per-group [1, C]-style blocks violate
    # the TPU (8, 128) block tiling; accumulation also folds the group sum
    # that the VJP wrapper previously did)
    def _acc(ref, val):
        val = val.astype(ref.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            ref[...] = val

        @pl.when(pl.program_id(0) != 0)
        def _():
            ref[...] = ref[...] + val

    names = ["w1", "b1", "g1", "o1", "w2", "b2", "g2", "o2",
             "w3", "b3", "g3", "o3", "w4", "b4", "g4", "o4", "w5", "b5"]
    w = {nm: r[:] for nm, r in zip(names, wrefs)}
    x = x_ref[0]
    u1, u2 = u1_ref[:], u2_ref[:]
    n1 = nb * 2 * FEAT
    n2 = nb * SEQ

    st = _fwd_stages(x, w, u1, u2, nb)
    out = st["out"]

    dz = dout_ref[0].reshape(1, n2).astype(jnp.float32) * out * (1.0 - out) / 3.0
    # conv5
    dh4 = _conv_bwd_dh(dz, w["w5"], SEQ)
    dw5, db5 = _conv_bwd_dw(dz, st["h4"], w["w5"], SEQ)
    _acc(dw5_ref, dw5), _acc(db5_ref, db5[None])
    # BN4 + relu
    da4, dg4, do4 = _bn_relu_bwd(dh4, st["h4"], st["xh4"], st["inv4"], w["g4"], n2)
    _acc(dg4_ref, dg4[None]), _acc(do4_ref, do4[None])
    # conv4
    dh3 = _conv_bwd_dh(da4, w["w4"], SEQ)
    dw4, db4 = _conv_bwd_dw(da4, st["h3s"], w["w4"], SEQ)
    _acc(dw4_ref, dw4), _acc(db4_ref, db4[None])
    # BN3 + relu
    da3, dg3, do3 = _bn_relu_bwd(dh3, st["h3"], st["xh3"], st["inv3"], w["g3"], n2)
    _acc(dg3_ref, dg3[None]), _acc(do3_ref, do3[None])
    # upconv2
    dh2 = _upconv_bwd_dh(da3, w["w3"], u2, nb, 2 * FEAT)
    dw3, db3 = _upconv_bwd_dw(da3, st["h2s"], w["w3"], u2, nb, 2 * FEAT)
    _acc(dw3_ref, dw3), _acc(db3_ref, db3[None])
    # BN2 + relu
    da2, dg2, do2 = _bn_relu_bwd(dh2, st["h2"], st["xh2"], st["inv2"], w["g2"], n1)
    _acc(dg2_ref, dg2[None]), _acc(do2_ref, do2[None])
    # conv2
    dh1 = _conv_bwd_dh(da2, w["w2"], 2 * FEAT)
    dw2, db2 = _conv_bwd_dw(da2, st["h1s"], w["w2"], 2 * FEAT)
    _acc(dw2_ref, dw2), _acc(db2_ref, db2[None])
    # BN1 + relu
    da1, dg1, do1 = _bn_relu_bwd(dh1, st["h1"], st["xh1"], st["inv1"], w["g1"], n1)
    _acc(dg1_ref, dg1[None]), _acc(do1_ref, do1[None])
    # upconv1
    dx = _upconv_bwd_dh(da1, w["w1"], u1, nb, FEAT)
    dw1, db1 = _upconv_bwd_dw(da1, x, w["w1"], u1, nb, FEAT)
    _acc(dw1_ref, dw1), _acc(db1_ref, db1[None])
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------------ public API
_WNAMES = ["w1", "b1", "g1", "o1", "w2", "b2", "g2", "o2",
           "w3", "b3", "g3", "o3", "w4", "b4", "g4", "o4", "w5", "b5"]


def train_vmem_bytes_estimate(nb: int) -> int:
    """Conservative per-program VMEM footprint of the RECOMPUTING backward
    kernel (the wider of the pair) at per-group batch ``nb``.

    Structural count: the recompute keeps 11 forward planes live for the
    gradient chain (h1s/h1/xh1, h2s/h2/xh2, h3s/h3/xh3, h4/xh4 — each a
    [C, nb*t] slab of 32k elements per sample), plus the double-buffered x
    input block, the dx output block, and ~3 transient gradient planes —
    ~18 planes x 32768 elts x 4 B per sample (f32-dominant; the bf16 storage
    planes only shrink this). Fixed residents: the u1/u2 upsample stacks,
    weights, and the accumulated weight-grad blocks. The known-good
    production point nb=32 (batch 32, measured on chip) estimates ~79 MiB,
    under the 100 MiB budget; nb=48 estimates over it (~117 MiB).
    """
    per_sample = 18 * 32768 * 4
    fixed = (
        (3 * 128 * 256 + 3 * 256 * 512) * 4                       # u1 + u2
        + 2 * 3 * (128 * 256 + 128 * 128 + 64 * 128 + 64 * 64 + 64) * 4  # w + dw
        + 16 * 512 * 4                                            # biases/affine + grads
    )
    return fixed + per_sample * nb


def _validate_train_nb(nb: int) -> None:
    """Reject per-group batches whose recomputing-backward working set would
    exceed the VMEM budget — over budget surfaces as an opaque Mosaic
    compile/allocation failure (or a worker crash) instead of this error.
    The eval kernel's analogue is decoder_fused.validate_v_tile."""
    est = train_vmem_bytes_estimate(nb)
    if est > VMEM_LIMIT_BYTES:
        raise ValueError(
            f"fused training decoder: per-group batch {nb} needs ~"
            f"{est / 2**20:.0f} MiB of VMEM per program (> "
            f"{VMEM_LIMIT_BYTES / 2**20:.0f} MiB budget); reduce "
            f"DATA.batch_size or use TPU.train_decoder='xla' "
            f"(estimate: train_vmem_bytes_estimate)"
        )


def _fwd_call(w: dict, x, *, interpret: bool):
    G, C, n = x.shape
    nb = n // FEAT
    _validate_train_nb(nb)
    dtype = x.dtype
    u1 = upsample_shift_matrices(FEAT, w["w1"].dtype)
    u2 = upsample_shift_matrices(2 * FEAT, w["w1"].dtype)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 18
    out, mean, var = pl.pallas_call(
        functools.partial(_train_fwd_kernel, nb=nb),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=[
            pl.BlockSpec((1, nb, SEQ), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, nb, SEQ), jnp.float32),
            jax.ShapeDtypeStruct((G, 4, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 4, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(x, u1, u2, *[w[nm] for nm in _WNAMES])
    return out, mean, var


def _bwd_call(w: dict, x, dout, *, interpret: bool):
    G, C, n = x.shape
    nb = n // FEAT
    _validate_train_nb(nb)
    u1 = upsample_shift_matrices(FEAT, w["w1"].dtype)
    u2 = upsample_shift_matrices(2 * FEAT, w["w1"].dtype)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 18
    gshapes = []
    gspecs = []
    # dx
    gshapes.append(jax.ShapeDtypeStruct((G, C, n), jnp.float32))
    gspecs.append(pl.BlockSpec((1, C, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM))

    def wgrad(shape):
        # whole-array block revisited by every group program (the kernel
        # accumulates); per-group [1, ...] blocks violate the (8, 128) tiling
        gshapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        ndim = len(shape)
        gspecs.append(pl.BlockSpec(
            shape, lambda g, _nd=ndim: (0,) * _nd, memory_space=pltpu.VMEM))

    for cout, cin in ((128, 256), (128, 128), (64, 128), (64, 64), (1, 64)):
        wgrad((3, cout, cin))   # dw
        wgrad((1, cout))        # db (2-D: 1-lane-dim arrays lower cleanly)
        if cout != 1:
            wgrad((1, cout))    # dgamma
            wgrad((1, cout))    # dbeta
    outs = pl.pallas_call(
        functools.partial(_train_bwd_kernel, nb=nb),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, SEQ), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=gspecs,
        out_shape=gshapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(x, dout, u1, u2, *[w[nm] for nm in _WNAMES])
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def train_decode_groups(w: dict, x, interpret: bool = False):
    """Forward: w = pack_train_weights(params); x [G, 256, nb*128] channel-major
    gated latents (nb = batch per group). Returns (out [G, nb, 512] post-
    sigmoid f32, mean [G, 4, 128] f32, var [G, 4, 128] f32) — stats are biased
    batch moments per BN layer (padded to 128 channels), non-differentiable.
    """
    out, mean, var = _fwd_call(w, x, interpret=interpret)
    return out, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)


def _vjp_fwd(w, x, interpret):
    out, mean, var = _fwd_call(w, x, interpret=interpret)
    return (out, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)), (w, x)


def _vjp_bwd(interpret, res, cts):
    w, x = res
    dout, _, _ = cts  # stats carry no gradient (aux state)
    outs = _bwd_call(w, x, dout.astype(jnp.float32), interpret=interpret)
    dx = outs[0].astype(x.dtype)
    names = ["w1", "b1", "g1", "o1", "w2", "b2", "g2", "o2",
             "w3", "b3", "g3", "o3", "w4", "b4", "g4", "o4", "w5", "b5"]
    dw = {}
    i = 1
    for cout, keys in ((128, ("w1", "b1", "g1", "o1")),
                       (128, ("w2", "b2", "g2", "o2")),
                       (64, ("w3", "b3", "g3", "o3")),
                       (64, ("w4", "b4", "g4", "o4")),
                       (1, ("w5", "b5"))):
        for key in keys:
            # group sums already accumulated in-kernel; biases arrive [1, C]
            dw[key] = outs[i] if key.startswith("w") else outs[i][0]
            i += 1
    dw = {k: dw[k].astype(w[k].dtype) for k in names}
    return dw, dx


train_decode_groups.defvjp(_vjp_fwd, _vjp_bwd)


def make_train_decode_fn(compute_dtype=jnp.float32, interpret: bool = False):
    """Build the `train_decode_fn` hook for models.nefnet.nefnet_apply: takes
    (params, state, stacked [3B, 256, 128]) and returns the three post-sigmoid
    decodes plus the EMA-chained running-stat updates, all through the fused
    training kernel pair (forward + custom-VJP backward)."""

    def fn(p, s, stacked):
        gb = stacked.shape[0]
        nb = gb // 3
        w = pack_train_weights(p, dtype=compute_dtype)
        x = (
            stacked.reshape(3, nb, 256, FEAT)
            .transpose(0, 2, 1, 3)
            .reshape(3, 256, nb * FEAT)
            .astype(compute_dtype)
        )
        out, mean, var = train_decode_groups(w, x, interpret)
        updates = chain_running_stats(s, mean, var, nb)
        return out.reshape(3, nb, 1, SEQ), updates

    return fn
