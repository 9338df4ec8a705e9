"""Fused Pallas decoder kernel — the panorama synthesis hot path.

The eval-mode Nef-Net decoder is a fixed chain (models/nefnet.py decoder_apply,
reference codes/network/model_nefnet.py:101-107,163-168):

    gate x latent -> up x2 -> [conv k3 -> BN -> relu] x2 -> up x2
                  -> [conv k3 -> BN -> relu] x2 -> conv k3 -> sigmoid(x/3)

Pure-XLA execution writes every intermediate activation (~1 MB/view) to HBM.
This kernel keeps the whole chain in VMEM per (beat, view-tile) program:

  * BN is affine at inference -> folded into conv weights/bias ahead of time
    (fold_decoder_bn);
  * each k3 conv is ONE MXU matmul W_cat [Cout, 3*Cin] @ H_cat [3*Cin, VT*T]
    over the stacked time-shifted copies of the activation (shift is uniform
    across the view tile, so views batch along the flattened (view, time)
    axis and the contraction dim is 3x deeper than a per-tap formulation);
  * the x2 linear upsample (even = 0.25 left + 0.75 x; odd = 0.75 x + 0.25
    right, torch align_corners=False parity) is a [N, 2N] matmul on the MXU
    (interleaving via reshape is not Mosaic-lowerable on the lane dim);
  * one HBM read (latent 256x128 per beat + gates per view) and one write
    (the [VT, 512] waveforms).

dtype policy: activations/weights may be stored bf16 (pass bf16 latent/gates
and fold with dtype=bf16) — matmuls then run at native bf16 MXU rate and VPU
elementwise work moves half the bytes; accumulation is ALWAYS f32
(preferred_element_type), biases are f32, and the output waveform is f32.
The final 1-channel conv runs f32 end-to-end (an M=1 bf16 matmul buys
nothing and is the one shape Mosaic handles least robustly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT = 128
SEQ = 512

# matches CompilerParams(vmem_limit_bytes) below; v5e VMEM is 128 MiB
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def fold_decoder_bn(params: dict, state: dict, dtype=jnp.float32) -> dict:
    """Fold eval-mode BatchNorm into the adjacent conv weights/biases.

    Returns {w1,b1,...,w5,b5}: w [Cout, 3*Cin] with the three taps
    concatenated along the contraction dim ([:, 0:Cin] = tap t-1, etc.) so
    the kernel's conv is a single matmul; b [Cout] f32 (accumulation dtype)
    with BN absorbed (conv5 = decoder.4 has no BN).
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
        w = params[f"{conv}.weight"].astype(jnp.float32)  # [Cout, Cin, 3]
        b = params[f"{conv}.bias"].astype(jnp.float32)
        if bn is not None:
            scale = params[f"{bn}.weight"].astype(jnp.float32)
            offset = params[f"{bn}.bias"].astype(jnp.float32)
            mean = state[f"{bn}.running_mean"].astype(jnp.float32)
            var = state[f"{bn}.running_var"].astype(jnp.float32)
            inv = scale * jax.lax.rsqrt(var + 1e-5)
            w = w * inv[:, None, None]
            b = (b - mean) * inv + offset
        w_cat = jnp.concatenate([w[:, :, 0], w[:, :, 1], w[:, :, 2]], axis=1)
        # convs 4-5 (the f32 tail) stay f32 regardless of the storage dtype:
        # bf16 rounding this late in the chain costs ~0.004 correlation on
        # realistic latents for ~8% of the FLOPs (docs/KERNELS.md)
        out[f"w{i}"] = w_cat.astype(dtype if i <= 3 else jnp.float32)
        out[f"b{i}"] = b  # f32
    return out


def upsample_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n, 2n] matrix U with u = x @ U == torch Upsample(x2, linear,
    align_corners=False), edge clamp included."""
    import numpy as np

    U = np.zeros((n, 2 * n), np.float64)
    for k in range(n):
        U[max(k - 1, 0), 2 * k] += 0.25
        U[k, 2 * k] += 0.75
        U[k, 2 * k + 1] += 0.75
        U[min(k + 1, n - 1), 2 * k + 1] += 0.25
    return jnp.asarray(U, dtype)


def vmem_bytes_estimate(v_tile: int, storage_dtype) -> int:
    """Conservative per-program VMEM footprint for a given view tile.

    Models the two widest pipeline stages (conv1 over [256, VT*256] and
    conv3 over [128, VT*512]): input activation + the 3-tap stacked copy +
    the f32 accumulator, doubled for Mosaic scheduling/double-buffer
    headroom, plus the resident weights/upsample matrices and I/O blocks.
    """
    s = jnp.dtype(storage_dtype).itemsize
    consts = (256 * FEAT + v_tile * 256 + v_tile * SEQ) * s
    weights = (
        (128 * 768 + 128 * 384 + 64 * 384 + 64 * 192) * s
        + 1 * 192 * 4  # conv5 kept f32
        + (FEAT * 2 * FEAT + 2 * FEAT * SEQ) * s  # upsample matrices
        + (128 + 128 + 64 + 64 + 1) * 4  # biases
    )
    stage1 = (256 + 768) * (v_tile * 2 * FEAT) * s + 128 * (v_tile * 2 * FEAT) * 4
    stage2 = (128 + 384) * (v_tile * SEQ) * s + 64 * (v_tile * SEQ) * 4
    return consts + weights + 2 * max(stage1, stage2)


def validate_v_tile(v_tile: int, storage_dtype) -> None:
    """Reject view tiles that cannot lower (sublane misalignment) or would
    blow the VMEM budget (which crashes the TPU worker instead of erroring)."""
    sublane = 16 if jnp.dtype(storage_dtype).itemsize == 2 else 8
    if v_tile <= 0 or v_tile % sublane != 0:
        raise ValueError(
            f"v_tile={v_tile} must be a positive multiple of {sublane} for "
            f"{jnp.dtype(storage_dtype).name} activations (TPU sublane tiling)"
        )
    est = vmem_bytes_estimate(v_tile, storage_dtype)
    if est > VMEM_LIMIT_BYTES:
        raise ValueError(
            f"v_tile={v_tile} needs ~{est / 2**20:.0f} MiB of VMEM per program "
            f"(> {VMEM_LIMIT_BYTES / 2**20:.0f} MiB budget); use a smaller "
            f"view tile (estimate: vmem_bytes_estimate)"
        )


def _shift3(h, vt: int, t: int):
    """[C, VT*T] -> [3C, VT*T]: per-view-segment time shifts (t-1, t, t+1),
    zero-padded at segment edges, stacked along the contraction axis."""
    c = h.shape[0]
    hv = h.reshape(c, vt, t)
    zeros = jnp.zeros((c, vt, 1), h.dtype)
    left = jnp.concatenate([zeros, hv[:, :, :-1]], axis=2).reshape(c, vt * t)
    right = jnp.concatenate([hv[:, :, 1:], zeros], axis=2).reshape(c, vt * t)
    return jnp.concatenate([left, h, right], axis=0)


def _conv3(h, w_cat, b, vt: int, t: int, relu: bool, *, force_f32: bool = False):
    """k3 p1 conv over the time axis of [Cin, VT*T] per-view segments as one
    matmul: w_cat [Cout, 3*Cin] @ stacked-shifts [3*Cin, VT*T] (f32 accum)."""
    stacked = _shift3(h, vt, t)
    if force_f32:
        stacked = stacked.astype(jnp.float32)
    acc = jax.lax.dot_general(
        w_cat, stacked,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + b[:, None]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    # force_f32 (the pre-sigmoid conv): keep the f32 result — rounding the
    # small pre-sigmoid values to bf16 is the dominant precision loss
    return acc if force_f32 else acc.astype(h.dtype)


def _upsample_mm(h, u, vt: int, n: int):
    """[C, VT*N] per-view x2 upsample via matmul: -> [C, VT*2N] (f32 accum)."""
    c = h.shape[0]
    hv = h.reshape(c * vt, n)  # major-dims merge only; lane dim unchanged
    out = jax.lax.dot_general(
        hv, u, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    return out.reshape(c, vt * 2 * n)


def _decoder_kernel(latent_ref, gates_ref, u1_ref, u2_ref,
                    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                    out_ref, *, vt: int, storage_dtype):
    latent = latent_ref[0]          # [256, 128] f32
    gates = gates_ref[0]            # [VT, 256]  f32

    # gate x latent -> [256, VT*128] (channel-major, views side by side).
    # ALWAYS f32: the transpose + 3-D broadcast multiply is the one pattern
    # the Mosaic bf16 lowering rejects (tools/mosaic_bf16_probe.py isolated
    # it to this op; every other primitive in the chain compiles bf16).
    h = gates.T[:, :, None] * latent[:, None, :]      # [256, VT, 128]
    h = h.reshape(256, vt * FEAT).astype(storage_dtype)

    h = _upsample_mm(h, u1_ref[:], vt, FEAT)                 # [256, VT*256]
    h = _conv3(h, w1[:], b1[:], vt, 2 * FEAT, True)          # [128, VT*256]
    h = _conv3(h, w2[:], b2[:], vt, 2 * FEAT, True)          # [128, VT*256]

    h = _upsample_mm(h, u2_ref[:], vt, 2 * FEAT)             # [128, VT*512]

    h = _conv3(h, w3[:], b3[:], vt, SEQ, True)               # [64, VT*512]
    # f32 tail: the last two convs accumulate AND carry f32
    h = _conv3(h, w4[:], b4[:], vt, SEQ, True, force_f32=True)   # [64, VT*512] f32
    h = _conv3(h, w5[:], b5[:], vt, SEQ, False, force_f32=True)  # [1, VT*512] f32

    out = jax.nn.sigmoid(h.astype(jnp.float32) / 3.0)
    out_ref[0] = out.reshape(vt, SEQ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("v_tile", "interpret"))
def fused_decode_views(folded: dict, latent_all, gates, *, v_tile: int = 16,
                       interpret: bool = False):
    """latent_all: [B, 256, 128]; gates: [B, V, 256] (query_gates output).
    Returns [B, V, 512] f32. V is padded up to a multiple of v_tile with zero
    gates internally and the output trimmed back.

    The activation storage dtype follows the folded weights: pass a
    fold_decoder_bn(dtype=bf16) dict for the bf16 pipeline (f32 gate stage,
    bf16 activations/matmul operands, f32 accumulation + pre-sigmoid tail);
    v_tile must then be a multiple of 16 (bf16 sublane) instead of 8.
    latent/gates are upcast to f32 for the gate stage either way.
    """
    B, V = gates.shape[0], gates.shape[1]
    dtype = folded["w1"].dtype
    latent_all = latent_all.astype(jnp.float32)
    gates = gates.astype(jnp.float32)
    validate_v_tile(v_tile, dtype)
    pad = (-V) % v_tile
    if pad:
        gates = jnp.concatenate(
            [gates, jnp.zeros((B, pad, gates.shape[2]), gates.dtype)], axis=1
        )
    Vp = V + pad
    n_vt = Vp // v_tile

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    kernel = functools.partial(_decoder_kernel, vt=v_tile, storage_dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_vt),
        in_specs=[
            pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_tile, 256), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, v_tile, SEQ), lambda b, v: (b, v, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Vp, SEQ), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(
        latent_all, gates,
        upsample_matrix(FEAT, dtype), upsample_matrix(2 * FEAT, dtype),
        folded["w1"], folded["b1"], folded["w2"], folded["b2"],
        folded["w3"], folded["b3"], folded["w4"], folded["b4"],
        folded["w5"], folded["b5"],
    )
    return out[:, :V] if pad else out
