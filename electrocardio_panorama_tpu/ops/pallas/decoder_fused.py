"""Fused Pallas decoder kernel — the panorama synthesis hot path.

The eval-mode Nef-Net decoder is a fixed chain (models/nefnet.py decoder_apply):

    gate x latent -> up x2 -> [conv k3 -> BN -> relu] x2 -> up x2
                  -> [conv k3 -> BN -> relu] x2 -> conv k3 -> sigmoid(x/3)

Pure-XLA execution writes every intermediate activation (~1 MB/view) to HBM.
This kernel keeps the whole chain in VMEM per (beat, view-tile) program:

  * BN is affine at inference -> folded into conv weights/bias ahead of time
    (fold_decoder_bn);
  * each k3 conv becomes 3 MXU matmuls W_k [Cout, Cin] @ H [Cin, VT*T] over
    time-shifted copies of the activation (shift is uniform across the view
    tile, so views batch along the flattened (view, time) axis);
  * the x2 linear upsample (even = 0.25 left + 0.75 x; odd = 0.75 x + 0.25
    right, torch align_corners=False parity) is VPU work on registers;
  * one HBM read (latent 256x128 per beat + gates per view) and one write
    (the [VT, 512] waveforms).

f32 accumulation on the MXU regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT = 128
SEQ = 512


def fold_decoder_bn(params: dict, state: dict, dtype=jnp.float32) -> dict:
    """Fold eval-mode BatchNorm into the adjacent conv weights/biases.

    Returns {w1,b1,...,w5,b5}: w [Cout, Cin, 3], b [Cout] with BN absorbed
    (conv5 = decoder.4 has no BN).
    """
    out = {}
    specs = [
        ("decoder.1.double_conv.0", "decoder.1.double_conv.1"),
        ("decoder.1.double_conv.3", "decoder.1.double_conv.4"),
        ("decoder.3.double_conv.0", "decoder.3.double_conv.1"),
        ("decoder.3.double_conv.3", "decoder.3.double_conv.4"),
        ("decoder.4", None),
    ]
    for i, (conv, bn) in enumerate(specs, start=1):
        w = params[f"{conv}.weight"].astype(jnp.float32)
        b = params[f"{conv}.bias"].astype(jnp.float32)
        if bn is not None:
            scale = params[f"{bn}.weight"].astype(jnp.float32)
            offset = params[f"{bn}.bias"].astype(jnp.float32)
            mean = state[f"{bn}.running_mean"].astype(jnp.float32)
            var = state[f"{bn}.running_var"].astype(jnp.float32)
            inv = scale * jax.lax.rsqrt(var + 1e-5)
            w = w * inv[:, None, None]
            b = (b - mean) * inv + offset
        out[f"w{i}"] = w.astype(dtype)
        out[f"b{i}"] = b.astype(dtype)
    return out


def upsample_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n, 2n] matrix U with u = x @ U == torch Upsample(x2, linear,
    align_corners=False), edge clamp included. Interleaving via reshape is not
    Mosaic-lowerable on the lane dim; a matmul rides the MXU instead."""
    import numpy as np

    U = np.zeros((n, 2 * n), np.float64)
    for k in range(n):
        U[max(k - 1, 0), 2 * k] += 0.25
        U[k, 2 * k] += 0.75
        U[k, 2 * k + 1] += 0.75
        U[min(k + 1, n - 1), 2 * k + 1] += 0.25
    return jnp.asarray(U, dtype)


def _upsample_mm(h, u, vt: int, n: int, mxu_dtype=None):
    """[C, VT*N] per-view x2 upsample via matmul: -> [C, VT*2N]."""
    c = h.shape[0]
    hv = h.reshape(c * vt, n)  # major-dims merge only; lane dim unchanged
    if mxu_dtype is not None:
        hv, u = hv.astype(mxu_dtype), u.astype(mxu_dtype)
    out = jax.lax.dot_general(
        hv, u, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    return out.reshape(c, vt * 2 * n)


def _conv3(h, w, b, vt: int, t: int, relu: bool, mxu_dtype=None):
    """k3 p1 conv over the time axis of [Cin, VT*T] per-view segments.

    h: [Cin, VT*T]; w: [Cout, Cin, 3]; returns [Cout, VT*T]. The shift is
    applied per view segment (edges zero-padded), uniform across the tile.
    """
    cin = h.shape[0]
    hv = h.reshape(cin, vt, t)
    zeros = jnp.zeros((cin, vt, 1), h.dtype)
    shifts = (
        jnp.concatenate([zeros, hv[:, :, :-1]], axis=2),  # x[t-1]
        hv,
        jnp.concatenate([hv[:, :, 1:], zeros], axis=2),   # x[t+1]
    )
    acc = b[:, None].astype(jnp.float32) * jnp.ones((1, vt * t), jnp.float32)
    for k in range(3):
        lhs, rhs = w[:, :, k], shifts[k].reshape(cin, vt * t)
        if mxu_dtype is not None:
            lhs, rhs = lhs.astype(mxu_dtype), rhs.astype(mxu_dtype)
        acc = acc + jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(h.dtype)


def _decoder_kernel(latent_ref, gates_ref, u1_ref, u2_ref,
                    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                    out_ref, *, vt: int, mxu_dtype):
    latent = latent_ref[0]          # [256, 128]
    gates = gates_ref[0]            # [VT, 256]

    # gate x latent -> [256, VT*128] (channel-major, views side by side)
    h = gates.T[:, :, None] * latent[:, None, :]      # [256, VT, 128]
    h = h.reshape(256, vt * FEAT)

    h = _upsample_mm(h, u1_ref[:], vt, FEAT, mxu_dtype)            # [256, VT*256]
    h = _conv3(h, w1[:], b1[:], vt, 2 * FEAT, True, mxu_dtype)     # [128, VT*256]
    h = _conv3(h, w2[:], b2[:], vt, 2 * FEAT, True, mxu_dtype)     # [128, VT*256]

    h = _upsample_mm(h, u2_ref[:], vt, 2 * FEAT, mxu_dtype)        # [128, VT*512]

    h = _conv3(h, w3[:], b3[:], vt, SEQ, True, mxu_dtype)          # [64, VT*512]
    h = _conv3(h, w4[:], b4[:], vt, SEQ, True, mxu_dtype)          # [64, VT*512]
    h = _conv3(h, w5[:], b5[:], vt, SEQ, False, mxu_dtype)         # [1, VT*512]

    out = jax.nn.sigmoid(h.astype(jnp.float32) / 3.0)
    out_ref[0] = out.reshape(vt, SEQ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("v_tile", "interpret", "mxu_bf16"))
def fused_decode_views(folded: dict, latent_all, gates, *, v_tile: int = 24,
                       interpret: bool = False, mxu_bf16: bool = False):
    """latent_all: [B, 256, 128]; gates: [B, V, 256] (query_gates output).
    Returns [B, V, 512]. V is padded up to a multiple of v_tile with zero
    gates internally and the output trimmed back."""
    B, V = gates.shape[0], gates.shape[1]
    pad = (-V) % v_tile
    if pad:
        gates = jnp.concatenate(
            [gates, jnp.zeros((B, pad, gates.shape[2]), gates.dtype)], axis=1
        )
    Vp = V + pad
    dtype = latent_all.dtype
    n_vt = Vp // v_tile

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    kernel = functools.partial(
        _decoder_kernel, vt=v_tile,
        mxu_dtype=jnp.bfloat16 if mxu_bf16 else None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_vt),
        in_specs=[
            pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_tile, 256), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, v_tile, SEQ), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Vp, SEQ), dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        latent_all, gates,
        upsample_matrix(FEAT, dtype), upsample_matrix(2 * FEAT, dtype),
        folded["w1"], folded["b1"], folded["w2"], folded["b2"],
        folded["w3"], folded["b3"], folded["w4"], folded["b4"],
        folded["w5"], folded["b5"],
    )
    return out[:, :V] if pad else out
