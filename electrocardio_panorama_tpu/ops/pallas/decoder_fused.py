"""Fused Pallas decoder kernel — the panorama synthesis hot path.

The eval-mode Nef-Net decoder is a fixed chain (models/nefnet.py decoder_apply,
reference codes/network/model_nefnet.py:101-107,163-168):

    gate x latent -> up x2 -> [conv k3 -> BN -> relu] x2 -> up x2
                  -> [conv k3 -> BN -> relu] x2 -> conv k3 -> sigmoid(x/3)

Pure-XLA execution writes every intermediate activation (~1 MB/view) to HBM.
This kernel keeps the whole chain in VMEM per (beat, view-tile) program:

  * BN is affine at inference -> folded into conv weights/bias ahead of time
    (fold_decoder_bn);
  * each (x2 upsample -> k3 conv) pair is fused by operator associativity
    (_upconv3): conv(up(h)) = sum_k W_k @ (h @ U_k) with tap-shifted
    upsample matrices whose zero boundary columns realize the conv's
    per-view zero padding (the upsample encodes torch's align_corners=False
    half-pixel + edge-clamp semantics exactly);
  * the remaining k3 convs are THREE accumulating MXU matmuls W_tap
    [Cout, Cin] @ H_shift [Cin, VT*T], one per tap, over lane-shifted +
    boundary-masked copies of the activation (shift is uniform across the
    view tile, so views batch along the flattened (view, time) axis);
  * one HBM read (latent 256x128 per beat + gates per view) and one write
    (the [VT, 512] waveforms).

dtype policy: activations/weights may be stored bf16 (pass bf16 latent/gates
and fold with dtype=bf16) — matmuls then run at native bf16 MXU rate and VPU
elementwise work moves half the bytes; accumulation is ALWAYS f32
(preferred_element_type), biases are f32, and the output waveform is f32.
convs 4-5 carry their f32 accumulators forward (never rounding the small
pre-sigmoid values to bf16), which holds end-to-end correlation vs the f32
pipeline above 0.999 (tests/test_pallas_decoder.py).
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

# escape hatch: route f32 back to the layout-A kernel (the original
# exact-precision path) for A/B parity and perf comparisons
import os as _os  # noqa: E402

_F32_LAYOUT_A = _os.environ.get("ECGPAN_F32_LAYOUT_A") == "1"


def fold_decoder_bn(params: dict, state: dict, dtype=jnp.float32) -> dict:
    """Fold eval-mode BatchNorm into the adjacent conv weights/biases.

    Returns {w1,b1,...,w5,b5}: w [3, Cout, Cin] tap-major ([0] = tap t-1,
    [1] = center, [2] = tap t+1) for the kernel's three accumulating per-tap
    matmuls; b [Cout] f32 (accumulation dtype) with BN absorbed
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
        # tap-major [3, Cout, Cin]: the kernel accumulates three K=Cin
        # matmuls over lane-shifted activations instead of materializing a
        # [3*Cin, VT*T] stacked operand (measured ~35% of conv stage time).
        # All weights follow the storage dtype; accumulation is ALWAYS f32
        # and convs 4-5 CARRY f32 (the pre-sigmoid values must not round).
        out[f"w{i}"] = jnp.transpose(w, (2, 0, 1)).astype(dtype)
        out[f"b{i}"] = b  # f32
    # affine gate basis for the rank-J basis decode (see basis_y1):
    # gate[v] = A @ [enc(theta_v); 1] exactly (ops.linear computes
    # enc @ W.T + b, reference model_nefnet.py:163-165). Kept f32 — it only
    # enters the per-beat U precompute, never the per-view hot path.
    if "mlp2.weight" in params:
        out["A"] = jnp.concatenate(
            [params["mlp2.weight"].astype(jnp.float32),
             params["mlp2.bias"].astype(jnp.float32)[:, None]], axis=1)
    return out


def _upsample_np(n: int):
    """numpy [n, 2n] matrix U with x @ U == torch Upsample(x2, linear,
    align_corners=False), edge clamp included."""
    import numpy as np

    U = np.zeros((n, 2 * n), np.float64)
    for k in range(n):
        U[max(k - 1, 0), 2 * k] += 0.25
        U[k, 2 * k] += 0.75
        U[k, 2 * k + 1] += 0.75
        U[min(k + 1, n - 1), 2 * k + 1] += 0.25
    return U


def upsample_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n, 2n] upsample matrix (see _upsample_np) as a jax array."""
    return jnp.asarray(_upsample_np(n), dtype)


def upsample_shift_matrices(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[3, n, 2n] upsample matrices with columns shifted by tap-1 for the
    fused upsample+conv stage: U_k[:, j] = U[:, j + k - 1], zero at the
    boundaries (which realizes the conv's per-view zero padding)."""
    import numpy as np

    u = _upsample_np(n)
    u0 = np.zeros_like(u)
    u0[:, 1:] = u[:, :-1]
    u2 = np.zeros_like(u)
    u2[:, :-1] = u[:, 1:]
    return jnp.asarray(np.stack([u0, u, u2]), dtype)


def gate_selectors(v_tile: int):
    """0/1 selector matrices for the kernel's gate stage (f32, exact).

    E [VT, VT*128]: E[v, v*128+f] = 1 — replicates each view's gate value
    across that view's 128 feature lanes.
    T [128, VT*128]: T[f, v*128+f] = 1 — tiles the latent across views.
    """
    import numpy as np

    col = np.arange(v_tile * FEAT)
    e = (col // FEAT == np.arange(v_tile)[:, None]).astype(np.float32)
    t = (col % FEAT == np.arange(FEAT)[:, None]).astype(np.float32)
    return jnp.asarray(e), jnp.asarray(t)


def vmem_bytes_estimate(v_tile: int, storage_dtype) -> int:
    """Conservative per-program VMEM footprint for a given view tile.

    Models the widest pipeline stages: input activation + the two
    lane-shifted tap operands + the int32 boundary-position iota + the f32
    accumulator, doubled for Mosaic scheduling/double-buffer headroom, plus
    the resident weights/upsample matrices and I/O blocks. The stage terms
    below model the PRE-upconv-fusion formulation, which strictly upper-
    bounds the fused chain's working set (the upconv stages hold one
    [Cout, VT*n] f32 intermediate instead of three shifted operands), so
    the estimate stays conservative. It also upper-bounds the layout-B
    (view,channel)-row bf16 kernel: its batched [VT, C, t] stages carry the
    same element counts with smaller peak operands.
    """
    s = jnp.dtype(storage_dtype).itemsize
    consts = (256 * FEAT + v_tile * 256 + v_tile * SEQ) * s
    # resident selector set, whichever pipeline's is larger at this dtype:
    # layout A's E [VT, VT*FEAT] + T [FEAT, VT*FEAT] (f32), or the
    # packed-gate kernel's M1 [VT*256, VT*2] + M2 [VT*256, 128] + ones
    # [128, 128] + conv5 row-selectors selw [3, VT, VT*64] (storage dtype)
    # — both sets grow with v_tile^2
    gate_sel = max(
        (v_tile * v_tile * FEAT + FEAT * v_tile * FEAT) * 4,
        (v_tile * 256 * (v_tile * 2 + 128) + 128 * 128
         + 3 * v_tile * v_tile * 64) * s,
    )
    weights = (
        # conv4 term sized for the dot-fused K=128 blocks (4 x [64, 128],
        # upper-bounds layout A's 3 x [64, 64])
        3 * (128 * 256 + 128 * 128 + 64 * 128 + 1 * 64) * s
        + 4 * 64 * 128 * s
        + 3 * (FEAT * 2 * FEAT + 2 * FEAT * SEQ) * s  # [3, n, 2n] shift stacks
        + (128 + 128 + 64 + 64 + 1) * 4  # biases
        + gate_sel
    )
    # conv1: h/left/right [256, VT*256] + iota i32 + accum [128, VT*256] f32
    stage1 = 3 * 256 * (v_tile * 2 * FEAT) * s + (256 + 128) * (v_tile * 2 * FEAT) * 4
    # conv3: [128, VT*512] operands + iota + accum [64, VT*512] f32
    stage2 = 3 * 128 * (v_tile * SEQ) * s + (128 + 64) * (v_tile * SEQ) * 4
    # conv5 (f32-carried input): 3 f32 operands [64, VT*512] + iota + out
    stage3 = 3 * 64 * (v_tile * SEQ) * 4 + (64 + 1) * (v_tile * SEQ) * 4
    return consts + weights + 2 * max(stage1, stage2, stage3)


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


def _dot_f32(w, h):
    """f32-accumulating dot. f32 operands use HIGHEST precision: on TPU the
    DEFAULT f32 matmul truncates operands to one bf16 MXU pass, which would
    make the "f32" kernel numerically identical to the bf16 one (verified on
    v5e); HIGHEST forces the multi-pass f32-accurate decomposition. bf16
    operands take the native single pass either way."""
    prec = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        w, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _dot_fast(w, h):
    """Single-pass dot (operands effectively bf16 on the MXU), f32 accum —
    for the bf16 pipeline's gate stage, whose product is cast to bf16
    immediately after; a HIGHEST multi-pass there costs ~2 ms/launch for
    precision the next cast throws away."""
    return jax.lax.dot_general(
        w, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conv3(h, w_taps, b, t: int, relu: bool, *, carry_f32: bool = False):
    """k3 p1 conv over the time axis of [Cin, VT*T] per-view segments as
    three accumulating matmuls over lane-shifted activations.

    w_taps: [3, Cout, Cin] (tap-major). The shifted operands are built with a
    flat lane-axis concat + a boundary mask (iota % T), NOT by reshaping to
    [C, vt, t] and stacking to [3*Cin, VT*T]: the reshape is a sublane
    relayout and the stack writes 3x the activation bytes — together they
    dominated the measured conv stage cost (docs/KERNELS.md). The three
    K=Cin matmuls do identical MXU FLOPs to the one K=3*Cin matmul and all
    accumulate in f32."""
    c, n = h.shape
    od = w_taps.dtype
    # [1, n] boundary masks (sublane-broadcast multiply) — a full [c, n]
    # int32 iota costs as much VMEM traffic as the activation itself
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % t
    # lane-axis concat shifts (pltpu.roll would avoid the copy but Mosaic
    # only implements vector rotates for 32-bit element types)
    zero_col = jnp.zeros((c, 1), h.dtype)
    shifted_l = jnp.concatenate([zero_col, h[:, : n - 1]], axis=1)
    shifted_r = jnp.concatenate([h[:, 1:], zero_col], axis=1)
    # left operand: h[.., t-1] (0 at segment start t==0)
    left = shifted_l * (pos != 0).astype(h.dtype)
    # right operand: h[.., t+1] (0 at segment end t==T-1)
    right = shifted_r * (pos != t - 1).astype(h.dtype)
    acc = (
        _dot_f32(w_taps[0], left.astype(od))
        + _dot_f32(w_taps[1], h.astype(od))
        + _dot_f32(w_taps[2], right.astype(od))
    )
    acc = acc + b[:, None]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    # carry_f32 (convs 4-5, the pre-sigmoid tail): hand the f32 accumulator
    # onward — rounding this late in the chain to bf16 is the dominant
    # precision loss (docs/KERNELS.md)
    return acc if carry_f32 else acc.astype(h.dtype)


def _upconv3(h, w_taps, b, u3, vt: int, n_in: int, relu: bool):
    """Fused (x2 upsample -> k3 conv) by operator associativity.

    Both are linear time-operators, so conv(up(h)) = sum_k W_k @ (h @ U_k)
    where U_k is the upsample matrix with columns shifted by k-1 (zero
    boundary columns implement the conv's per-view zero padding for free).
    vs the materialized up-then-conv: no lane-shift copies, no boundary
    masks, and the channel contraction W_k @ h runs at the NARROW
    pre-upsample width — conv1's stage cost was 4x conv2's at 2x the FLOPs
    because of exactly that overhead (docs/KERNELS.md stage profile).

    h: [Cin, VT*n_in]; w_taps: [3, Cout, Cin]; u3: [3, n_in, 2*n_in].
    Returns [Cout, VT*2*n_in] in h.dtype. Each matmul accumulates in f32,
    but in the bf16 pipeline the intermediate g is rounded to the storage
    dtype between the channel and upsample dots (an intentional, tested
    trade: tests/test_pallas_decoder.py pins the end-to-end correlation).
    """
    od = w_taps.dtype
    cout = w_taps.shape[1]
    # three separate W_k @ h matmuls measured ~2% faster than one batched
    # [3*Cout, Cin] matmul + sublane slices — keep the per-tap form
    acc = None
    for k in range(3):
        g = _dot_f32(w_taps[k], h.astype(od))             # [Cout, VT*n_in] f32
        g2 = g.astype(od).reshape(cout * vt, n_in)
        y = _dot_f32(g2, u3[k])                           # [Cout*VT, 2*n_in]
        acc = y if acc is None else acc + y
    acc = acc.reshape(cout, vt * 2 * n_in) + b[:, None]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(h.dtype)


def _decoder_kernel(latent_ref, gates_ref, u1_ref, u2_ref, e_ref, t_ref,
                    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                    out_ref, *, vt: int, storage_dtype):
    latent = latent_ref[0]          # [256, 128] f32
    gates = gates_ref[0]            # [VT, 256]  f32

    # gate x latent -> [256, VT*128] (channel-major, views side by side),
    # built WITHOUT the 3-D broadcast multiply + reshape: the [256, VT, 128]
    # -> [256, VT*128] merge relayouts sublanes into lanes (measured
    # ~2 ms/launch). E [VT, VT*128] replicates each view's gate across its
    # 128 lanes and T tiles the latent across views — both exact f32
    # selector matmuls. This kernel IS the f32 pipeline: fused_decode_views
    # routes every non-f32 dtype to _decoder_kernel_pp, so storage_dtype is
    # always float32 here (kept as a parameter for the cast sites' clarity).
    g_exp = _dot_f32(gates.T, e_ref[:])           # [256, VT*128]
    lat_t = _dot_f32(latent, t_ref[:])            # [256, VT*128]
    h = (g_exp * lat_t).astype(storage_dtype)

    h = _upconv3(h, w1[:], b1[:], u1_ref[:], vt, FEAT, True)      # [128, VT*256]
    h = _conv3(h, w2[:], b2[:], 2 * FEAT, True)                   # [128, VT*256]
    h = _upconv3(h, w3[:], b3[:], u2_ref[:], vt, 2 * FEAT, True)  # [64, VT*512]
    # f32-carried tail: convs 4-5 accumulate f32 and hand the f32 result on
    # (operands follow the storage dtype; the carried values never round)
    h = _conv3(h, w4[:], b4[:], SEQ, True, carry_f32=True)   # [64, VT*512] f32
    h = _conv3(h, w5[:], b5[:], SEQ, False, carry_f32=True)  # [1, VT*512] f32

    out = jax.nn.sigmoid(h / 3.0)
    out_ref[0] = out.reshape(vt, SEQ).astype(out_ref.dtype)


# -------------------------------------- polyphase layout-B kernel (bf16 path)
# Activations live row-major (view, channel) as 2-D [VT*C, t] (layout B), and
# every (x2 upsample -> k3 conv) pair runs in POLYPHASE form: conv(up(x))
# splits into per-output-parity k3 convs at the NARROW width,
#
#   y[2i]   = A_0 x[i-1] + A_1 x[i] + A_2 x[i+1]
#   y[2i+1] = B_0 x[i-1] + B_1 x[i] + B_2 x[i+1]
#   A_0 = .75W_0+.25W_1   A_1 = .25W_0+.75W_1+.75W_2   A_2 = .25W_2
#   B_0 = .25W_0          B_1 = .75W_0+.75W_1+.25W_2   B_2 = .25W_1+.75W_2
#
# exact for torch Upsample(x2, linear, align_corners=False) + zero-pad conv
# EXCEPT at the clamped edges — four single-column corrections (derived and
# verified against the dense form, tools/bench_kernel_polyphase.py):
#   y_e[:,0] += .25(W_1-W_0)x[:,0]   y_e[:,n-1] += .25 W_2      x[:,n-1]
#   y_o[:,0] += .25 W_0     x[:,0]   y_o[:,n-1] += .25(W_1-W_2) x[:,n-1]
#
# Why: the dense [n, 2n] upsample matrices have two nonzeros per column, so
# upconv2's h @ U_k dots burned 80% of its FLOPs on zeros (31.5 -> 12.6
# MMACs/view). upconv1 keeps the U-matmul form with U's columns pre-split by
# parity (same FLOPs either way at Cin=2n, and no corrections needed — the
# U columns encode clamp+pad exactly); it BIRTHS the signal in (even, odd)
# planes. conv2 runs 2-phase, upconv2 maps 2 -> 4 phases, conv4/conv5 run
# 4-phase, and the kernel emits phase-BLOCKED rows [VT, 4*128] that XLA
# interleaves to time order outside. Gates arrive PACKED [VT*2, 128] (the
# [VT*256, 1] column block is ONE LANE wide — its VMEM image is 128x
# inflated and its DMA costs ~3.9 ms/launch) and are expanded in-kernel by
# exact selector matmuls. Measured 13.97 vs 15.04 ms/launch against the
# pre-polyphase layout-B chain (770k vs 715k views/s decode-chain), mae
# 4.4e-6 (docs/KERNELS.md).
#
# Mosaic discipline: this toolchain's compile helper crashes on 3-D
# broadcasts, multi-axis reductions, M=1 batched dots, and in-kernel 1-D
# vector reshapes — all elementwise work here stays 2-D, bias columns come
# from sublane-repeat, corrections use N=8 dots + lane concats, and conv5's
# weights arrive pre-shaped as weighted row-selectors. The f32 pipeline
# keeps the layout-A kernel (exact-precision path, independently audited
# against the crash list).
#
# DOT FUSION (third kernel generation, tools/bench_kernel_dotfuse.py):
# the polyphase chain above issued 54 dots per program, most N=128 and
# conv4's K=64 — half the MXU's 128-lane contraction. The production kernel
# now restructures every stage around 30 fewer-but-wider dots, all
# value-equal to the polyphase form (summation order changes only —
# measured corr 1.0 / max 5.7e-6 vs the 54-dot chain on chip):
#   * upconv1: the per-parity upsample matrices concat along N on the host
#     (u1eo [3, 128, 256]) and the stage emits Y = [e|o] as ONE plane
#     (3 upsample dots instead of 6);
#   * conv2 N-fused: [ce|co] = W0@[om|e] + W1@[e|o] + W2@[o|ep], where
#     [e|o] is upconv1's output VERBATIM (3 dots at N=256 instead of 6);
#   * upconv2 M-stacked: the A/B weight pairs stack along M ([A_k;B_k],
#     dense) so [p0;p1] and [p2;p3] each take 3 [128,128] dots (6 instead
#     of 12 at M=64); edge corrections stack the same way (2 dots, not 4);
#   * conv4 at K=128: with the phase pairs channel-stacked, each output
#     phase is TWO dots with concatenated weight blocks, e.g.
#     q0 = [W1 W2]@[p0;p1] + [0 W0]@shiftR([p2;p3]) — 8 dots at full
#     contraction width instead of 12 at K=64;
#   * conv5 N-fused: r = S0@[q3m|q0|q1|q2] + S1@[q0|q1|q2|q3]
#     + S2@[q1|q2|q3|q0p] — 3 selector dots at N=512 instead of 12;
#   * gate in COLUMN form: the [VT*256, 128] ones-broadcast matmul
#     (67M MACs/program — the stage profile's 1.87 ms hot spot) reduces to
#     a narrow N=8 dot producing a one-lane column + a lane-broadcast
#     MULTIPLY (one-lane intermediates are fine in VMEM; the poison was
#     only ever the one-lane DMA block image).
# Measured 13.97 -> 12.95 ms/launch (decode-chain 770k -> ~830k views/s).

QW = SEQ // 4  # 128: quarter-width phase planes


def _bdot_vc(a3, b3):
    """Batched [VT, M, K] @ [VT, K, N] -> [VT, M, N], f32 accumulation.
    f32 operands force HIGHEST (the multi-pass true-f32 decomposition — a
    default-precision f32 dot truncates to one bf16 pass on TPU, see
    _dot_f32); bf16 operands stay single-pass."""
    prec = jax.lax.Precision.HIGHEST if a3.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _dot2_vc(a2, b2):
    """2-D [M, K] @ [K, N] -> [M, N], f32 accumulation (HIGHEST for f32
    operands, as _bdot_vc)."""
    prec = jax.lax.Precision.HIGHEST if a2.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        a2, b2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _shiftR_vc(h2):
    """x[i-1] along lanes, zero at col 0 (per-row = per-(view, channel))."""
    z = jnp.zeros((h2.shape[0], 1), h2.dtype)
    return jnp.concatenate([z, h2[:, :-1]], axis=1)


def _shiftL_vc(h2):
    """x[i+1] along lanes, zero at the last col."""
    z = jnp.zeros((h2.shape[0], 1), h2.dtype)
    return jnp.concatenate([h2[:, 1:], z], axis=1)


def conv5_selectors(v_tile: int, w5, dtype):
    """[3, VT, VT*64] weighted row-selectors: selw_k[v, v*64+c] = w5[k, 0, c]."""
    import numpy as np

    sel = (np.arange(v_tile * 64) // 64 == np.arange(v_tile)[:, None])
    sel = jnp.asarray(sel.astype(np.float32))
    w5t = jnp.tile(w5[:, 0, :].astype(jnp.float32), (1, v_tile))  # [3, VT*64]
    return (sel[None] * w5t[:, None, :]).astype(dtype)


def polyphase_matrices(folded: dict):
    """Per-parity matrices for the polyphase upconv2 + upconv1's split-U.

    Returns (u1e, u1o [3, 128, 128], ab3 [6, 64, 128] = A0..A2,B0..B2,
    c3 [4, 64, 128] edge-correction matrices), all in the folded dtype.
    The A/B/C combinations are formed in f32 and rounded once.
    """
    dtype = folded["w1"].dtype
    u1 = upsample_shift_matrices(FEAT, jnp.float32)
    u1e, u1o = u1[:, :, 0::2].astype(dtype), u1[:, :, 1::2].astype(dtype)
    w3 = folded["w3"].astype(jnp.float32)
    ab3 = jnp.stack([
        0.75 * w3[0] + 0.25 * w3[1],
        0.25 * w3[0] + 0.75 * w3[1] + 0.75 * w3[2],
        0.25 * w3[2],
        0.25 * w3[0],
        0.75 * w3[0] + 0.75 * w3[1] + 0.25 * w3[2],
        0.25 * w3[1] + 0.75 * w3[2],
    ]).astype(dtype)
    c3 = jnp.stack([
        0.25 * (w3[1] - w3[0]),  # p0 col 0   (x col = e[:, 0])
        0.25 * w3[0],            # p1 col 0   (e[:, 0])
        0.25 * w3[2],            # p2 col 127 (o[:, 127])
        0.25 * (w3[1] - w3[2]),  # p3 col 127 (o[:, 127])
    ]).astype(dtype)
    return u1e, u1o, ab3, c3


def gate_expand_selectors(v_tile: int, dtype):
    """Selectors expanding the packed [VT*2, 128] gate block to the (v, c)
    row order: P1 = M1 @ packed copies row vc//128, M2 isolates lane vc%128,
    and a narrow slice of the ones matrix reduces the single nonzero to a
    one-lane column (the kernel then lane-broadcasts it by multiply) — all
    value-exact (each output sums exactly one product by 1.0)."""
    import numpy as np

    vcol = np.arange(v_tile * 256)
    m1 = (vcol[:, None] // 128 == np.arange(v_tile * 2)[None, :])
    m2 = (vcol[:, None] % 128 == np.arange(128)[None, :])
    return (jnp.asarray(m1.astype(np.float32)).astype(dtype),
            jnp.asarray(m2.astype(np.float32)).astype(dtype),
            jnp.ones((128, 128), dtype))


def dotfuse_operands(folded: dict):
    """Host-side operator prep for the dot-fused kernel (see DOT FUSION
    above): concatenated/stacked forms of the polyphase matrices so every
    in-kernel dot is as wide as the algebra allows. All concats are
    value-exact rearrangements of the folded weights (no arithmetic beyond
    polyphase_matrices' f32 combinations).

    Returns (u1eo [3, 128, 256], ab_m [3, 128, 128] = [A_k;B_k],
    c01/c23 [128, 128] stacked edge corrections, b3_2 [128] f32 doubled
    conv3 bias (matching the [A_k;B_k] M-stacked rows),
    w4_12/w4_z0/w4_01/w4_2z [64, 128] concatenated conv4 blocks).
    """
    dtype = folded["w1"].dtype
    u1e, u1o, ab3, c3 = polyphase_matrices(folded)
    u1eo = jnp.concatenate([u1e, u1o], axis=2)            # [3, 128, 256]
    ab_m = jnp.concatenate([ab3[:3], ab3[3:]], axis=1)    # [3, 128, 128]
    c01 = jnp.concatenate([c3[0], c3[1]], axis=0)         # [128, 128]
    c23 = jnp.concatenate([c3[2], c3[3]], axis=0)
    b3_2 = jnp.concatenate([folded["b3"], folded["b3"]])  # [256] f32
    w4 = folded["w4"]                                     # [3, 64, 64]
    z64 = jnp.zeros((64, 64), dtype)
    w4_12 = jnp.concatenate([w4[1], w4[2]], axis=1)       # q0 <- [p0;p1]
    w4_z0 = jnp.concatenate([z64, w4[0]], axis=1)         # q0 <- shiftR([p2;p3])
    w4_01 = jnp.concatenate([w4[0], w4[1]], axis=1)       # q1 <- [p0;p1]
    w4_2z = jnp.concatenate([w4[2], z64], axis=1)         # q1 <- [p2;p3]
    return u1eo, ab_m, c01, c23, b3_2, w4_12, w4_z0, w4_01, w4_2z


def basis_planes(folded: dict, latent_all, *, f32: bool):
    """Per-beat rank-J basis planes of the decode chain's pre-ReLU head.

    Every op before the first ReLU is LINEAR in (gate ! latent), and the
    gate itself is affine in the J-1 angular-encoding features
    (gate[v] = A @ [enc_v; 1], A = [mlp2.weight | mlp2.bias]). So across V
    views the whole head — gate multiply -> Upsample(x2) -> conv1(k3) ->
    folded BN — has rank <= J per beat:

        y1[v] = relu( sum_j e'[v, j] * U[j]  +  b1 ),
        U[j]  = sum_k (w1[k] * A[:, j][None, :]) @ latent @ u1eo[k]

    U is J basis planes [128, 256] per BEAT (13 conv1 evaluations instead
    of V=336). u1eo is the parity-split upsample operator, so U and the
    mixed y1 land directly in the kernel's [e|o] lane layout.

    Returns U [B, J, 128, 256] f32 (caller casts to the storage dtype).
    """
    lat = latent_all.astype(jnp.float32)            # [B, 256, 128]
    A = folded["A"]                                 # [256, J] f32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    u1 = upsample_shift_matrices(FEAT, jnp.float32)
    u1eo = jnp.concatenate([u1[:, :, 0::2], u1[:, :, 1::2]], axis=2)
    # [3, 128, 256] f32: parity-split upsample operator (polyphase_matrices)
    w1 = folded["w1"].astype(jnp.float32)           # [3, 128, 256]
    # per-beat basis planes: T[b,k] = lat[b] @ u1eo[k]; U[b,j] = sum_k
    # (w1[k] * A[:,j]) @ T[b,k]  — contraction widths 128/768, K-efficient
    T = jnp.einsum("bct,ktu->bkcu", lat, u1eo,
                   precision=prec, preferred_element_type=jnp.float32)
    w1a = jnp.einsum("kfc,cj->kjfc", w1, A,
                     precision=prec, preferred_element_type=jnp.float32)
    return jnp.einsum("kjfc,bkcu->bjfu", w1a, T,
                      precision=prec, preferred_element_type=jnp.float32)


def basis_coeffs(enc) -> jnp.ndarray:
    """[B, V, J] f32 mix coefficients: the angular encodings with the
    affine-gate ones column appended (gate[v] = A @ [enc_v; 1])."""
    ones = jnp.ones(enc.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([enc.astype(jnp.float32), ones], axis=-1)


def basis_y1(folded: dict, latent_all, enc, *, f32: bool):
    """Materialized rank-J head: mixes the per-beat basis planes
    (basis_planes) against the view coefficients in XLA and returns the
    post-ReLU y1 [B, V, 128, 256] in the folded storage dtype. The
    production path streams the U planes into the kernel instead
    (_decoder_kernel_ppu) — materializing y1 costs a [B,V,128,256] HBM
    round-trip (~700 MB at B=32, V=336 bf16); this form is kept for A/B
    audits and as the interpret-mode reference."""
    dtype = folded["w1"].dtype
    prec = jax.lax.Precision.HIGHEST if f32 else None
    U = basis_planes(folded, latent_all, f32=f32)
    ep = basis_coeffs(enc)                          # [B,V,J]
    if not f32:
        ep, U = ep.astype(jnp.bfloat16), U.astype(jnp.bfloat16)
    y = jnp.einsum("bvj,bjfu->bvfu", ep, U,
                   precision=prec, preferred_element_type=jnp.float32)
    return jnp.maximum(y + folded["b1"][None, None, :, None], 0.0).astype(dtype)


def _pp_tail(Y, selw_ref, abm_ref, c01_ref, c23_ref,
             w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
             out_ref, *, vt: int, od):
    """Shared conv2-onward body of the layout-B kernels: consumes the
    post-ReLU [e|o] plane Y [VT*128, 256] ((view, channel) rows) and writes
    the phase-blocked sigmoid output. Stage comments in _decoder_kernel_pp."""

    def brep(vec):
        return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)  # [VT*C, 1] f32

    def r3(h2, c):
        return h2.astype(od).reshape(vt, c, h2.shape[1])

    def wb(w2d):
        return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

    zc = jnp.zeros((vt * 128, 1), od)

    # conv2 N-fused: [ce|co] = W0@[om|e] + W1@[e|o] + W2@[o|ep]
    e, o = Y[:, :FEAT], Y[:, FEAT:]
    X0 = jnp.concatenate([zc, o[:, :FEAT - 1], e], axis=1)
    X2 = jnp.concatenate([o, e[:, 1:], zc], axis=1)
    ce_co = (_bdot_vc(wb(w2[0]), r3(X0, 128))
             + _bdot_vc(wb(w2[1]), r3(Y, 128))
             + _bdot_vc(wb(w2[2]), r3(X2, 128)))
    Y = jnp.maximum(ce_co.reshape(vt * 128, 256) + brep(b2[:]), 0.0).astype(od)

    # upconv2 M-stacked
    e, o = Y[:, :FEAT], Y[:, FEAT:]
    om = jnp.concatenate([zc, o[:, :FEAT - 1]], axis=1)
    ep = jnp.concatenate([e[:, 1:], zc], axis=1)
    e3, o3, om3, ep3 = r3(e, 128), r3(o, 128), r3(om, 128), r3(ep, 128)
    AB = [wb(abm_ref[k]) for k in range(3)]
    PL = _bdot_vc(AB[0], om3) + _bdot_vc(AB[1], e3) + _bdot_vc(AB[2], o3)
    PR = _bdot_vc(AB[0], e3) + _bdot_vc(AB[1], o3) + _bdot_vc(AB[2], ep3)
    xb0 = jnp.concatenate(
        [e[:, 0:1], jnp.zeros((vt * 128, 7), od)], axis=1).reshape(vt, 128, 8)
    xb1 = jnp.concatenate(
        [o[:, QW - 1:QW], jnp.zeros((vt * 128, 7), od)], axis=1
    ).reshape(vt, 128, 8)
    corrL = _bdot_vc(wb(c01_ref[:]), xb0).reshape(vt * 128, 8)
    corrR = _bdot_vc(wb(c23_ref[:]), xb1).reshape(vt * 128, 8)
    z127 = jnp.zeros((vt * 128, QW - 1), jnp.float32)
    PL = PL.reshape(vt * 128, QW) + jnp.concatenate(
        [corrL[:, 0:1], z127], axis=1)
    PR = PR.reshape(vt * 128, QW) + jnp.concatenate(
        [z127, corrR[:, 0:1]], axis=1)
    bb = brep(b3_2d[:])
    PL = jnp.maximum(PL + bb, 0.0).astype(od)
    PR = jnp.maximum(PR + bb, 0.0).astype(od)

    # conv4 at K=128
    PRs, PLs = _shiftR_vc(PR), _shiftL_vc(PL)
    PL3, PR3 = r3(PL, 128), r3(PR, 128)
    PRs3, PLs3 = r3(PRs, 128), r3(PLs, 128)
    q0 = _bdot_vc(wb(w4a[:]), PL3) + _bdot_vc(wb(w4b[:]), PRs3)
    q1 = _bdot_vc(wb(w4c[:]), PL3) + _bdot_vc(wb(w4d[:]), PR3)
    q2 = _bdot_vc(wb(w4b[:]), PL3) + _bdot_vc(wb(w4a[:]), PR3)
    q3 = _bdot_vc(wb(w4c[:]), PR3) + _bdot_vc(wb(w4d[:]), PLs3)
    bb = pltpu.repeat(b4[:].reshape(-1, 1), vt, axis=0)
    q0 = jnp.maximum(q0.reshape(vt * 64, QW) + bb, 0.0)
    q1 = jnp.maximum(q1.reshape(vt * 64, QW) + bb, 0.0)
    q2 = jnp.maximum(q2.reshape(vt * 64, QW) + bb, 0.0)
    q3 = jnp.maximum(q3.reshape(vt * 64, QW) + bb, 0.0)

    # conv5 N-fused
    Q1 = jnp.concatenate([q0, q1, q2, q3], axis=1).astype(od)
    q3m = _shiftR_vc(q3.astype(od))
    q0p = _shiftL_vc(q0.astype(od))
    Q0 = jnp.concatenate([q3m, Q1[:, : 3 * QW]], axis=1)
    Q2 = jnp.concatenate([Q1[:, QW:], q0p], axis=1)
    out = (_dot2_vc(selw_ref[0], Q0) + _dot2_vc(selw_ref[1], Q1)
           + _dot2_vc(selw_ref[2], Q2)) + b5_2d[:]           # [VT, 4*128]
    out_ref[0] = jax.nn.sigmoid(out / 3.0).astype(out_ref.dtype)


def _decoder_kernel_ppb(y1_ref, selw_ref, abm_ref, c01_ref, c23_ref,
                        w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
                        out_ref, *, vt: int, storage_dtype):
    """Basis-decode kernel (materialized-y1 form): _pp_tail fed by y1 planes
    mixed OUTSIDE the kernel (basis_y1). Superseded in production by
    _decoder_kernel_ppu, which streams the U planes and mixes in-kernel —
    the [B,V,128,256] y1 HBM round-trip costs ~1.7 ms/launch at B=32,V=336
    bf16. Kept for A/B audits."""
    Y = y1_ref[0].reshape(vt * 128, 256)
    _pp_tail(Y, selw_ref, abm_ref, c01_ref, c23_ref,
             w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
             out_ref, vt=vt, od=storage_dtype)


def _decoder_kernel_ppu(ut_ref, ep_ref, b1,
                        selw_ref, abm_ref, c01_ref, c23_ref,
                        w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
                        out_ref, *, vt: int, storage_dtype, mix: str):
    """Streamed-U basis kernel: the per-beat rank-J basis planes U stream in
    ONCE PER BEAT (the block index ignores the view-tile grid axis, so the
    pipeline skips the re-fetch on revisits — 27 MB total at B=32 vs the
    700 MB y1 round-trip) and the [vt, J] view mix runs IN-KERNEL:

        y1[v] = relu( sum_j ep[v, j] * U[j] + b1 )

    mix='fdot': one f-batched MXU dot (ep broadcast against the
    f-major-transposed planes ut [128, J, 256]) followed by a (1,0,2)
    transpose into (view, channel) rows — 6.8 MMACs/program on the MXU.
    mix='scalar': per-(view, j) scalar-coefficient VPU accumulation over
    U[j] planes (ep read from SMEM) — no transpose, pure elementwise."""
    od = storage_dtype

    if mix == "fdot":
        ep = ep_ref[0, 0].astype(od)                       # [vt, J]
        a3 = jnp.broadcast_to(ep[None], (FEAT, *ep.shape))  # [128, vt, J]
        z = _bdot_vc(a3, ut_ref[0].astype(od))             # [128, vt, 256] f32
        y2 = jnp.transpose(z, (1, 0, 2)).reshape(vt * FEAT, 2 * FEAT)
    else:
        jn = ep_ref.shape[-1]
        pieces = []
        for v in range(vt):
            acc = None
            for j in range(jn):
                s = ep_ref[0, 0, v, j]                     # SMEM f32 scalar
                term = ut_ref[0][j] * s                    # [128, 256] f32
                acc = term if acc is None else acc + term
            pieces.append(acc)
        y2 = jnp.concatenate(pieces, axis=0)               # [vt*128, 256] f32
    b1col = pltpu.repeat(b1[:].reshape(-1, 1), vt, axis=0)
    Y = jnp.maximum(y2 + b1col, 0.0).astype(od)
    _pp_tail(Y, selw_ref, abm_ref, c01_ref, c23_ref,
             w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
             out_ref, vt=vt, od=od)


def _decoder_kernel_pp(latent_ref, gpack_ref, m1_ref, m2_ref, ones_ref,
                       selw_ref, u1eo_ref, abm_ref, c01_ref, c23_ref,
                       w1, b1, w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
                       out_ref, *, vt: int, storage_dtype):
    od = storage_dtype

    def brep(vec):
        return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)  # [VT*C, 1] f32

    def wb(w2d):
        return jnp.broadcast_to(w2d[None], (vt, *w2d.shape))

    # gate stage in COLUMN form: expand the packed block to a [VT*256, 1]
    # column via a narrow N=8 dot, then one lane-broadcast multiply against
    # the sublane-repeated latent
    lat_rep = pltpu.repeat(latent_ref[0].astype(od), vt, axis=0)
    p1g = _dot2_vc(m1_ref[:], gpack_ref[0, 0].astype(od)).astype(od)
    gcol = _dot2_vc(p1g * m2_ref[:], ones_ref[:, :8]).astype(od)
    h = lat_rep * gcol[:, 0:1]                                  # [VT*256, 128]

    # upconv1: 3 channel dots + 3 N-fused upsample dots -> Y = [e|o]
    h3 = h.reshape(vt, 256, FEAT)
    acc = None
    for k in range(3):
        g = _bdot_vc(wb(w1[k]), h3).astype(od)                  # [VT,128,128]
        y = _bdot_vc(g, wb(u1eo_ref[k]))                        # [VT,128,256]
        acc = y if acc is None else acc + y
    # bias column broadcasts across both parity halves along lanes
    Y = jnp.maximum(acc.reshape(vt * 128, 256) + brep(b1[:]), 0.0).astype(od)

    # conv2 onward: shared with the basis kernels (_pp_tail)
    _pp_tail(Y, selw_ref, abm_ref, c01_ref, c23_ref,
             w2, b2, b3_2d, w4a, w4b, w4c, w4d, b4, b5_2d,
             out_ref, vt=vt, od=od)


def _basis_head_auto(dtype) -> str:
    """Production mix form for the basis head, measured on v5e
    (tools/bench_kernel_basis_stream.py, B=32, V=336, K=32 chained):

      bf16: stream (MXU fdot mix)  5.78 ms/launch, 1.86M views/s — vs
            y1-materialized 10.37 / 1.04M and the in-kernel gate kernel
            9.77 / 1.10M;
      f32:  stream_scalar (VPU mix) 32.8 ms / 328k — the HIGHEST-precision
            multi-pass fdot measured 34.6 / 310k and y1 38.2 / 282k.
    """
    return "stream_scalar" if dtype == jnp.float32 else "stream"


@functools.partial(jax.jit, static_argnames=("v_tile", "interpret", "head"))
def fused_decode_views(folded: dict, latent_all, gates=None, *,
                       enc=None, v_tile: int = 16, interpret: bool = False,
                       head: str = "auto"):
    """latent_all: [B, 256, 128]. Returns [B, V, 512] f32. V is padded up to
    a multiple of v_tile internally and the output trimmed back.

    Two view-conditioning forms:
      * enc [B, V, J-1] (angular encodings, NOT gates) — the production
        BASIS path: the whole pre-ReLU head (gate x latent, upsample, conv1,
        folded BN) collapses to J basis planes per beat (basis_planes) which
        STREAM into the kernel once per beat; the [vt, J] view mix runs
        in-kernel (_decoder_kernel_ppu) and the kernel continues from conv2.
        Requires the "A" key fold_decoder_bn records from mlp2. head=
        "stream" (MXU fdot mix) | "stream_scalar" (VPU mix) |
        "y1" (materialize y1 in XLA — pays a [B,V,128,256] HBM round-trip;
        audit path) | "auto" (the per-dtype measured winner,
        _basis_head_auto: stream for bf16, stream_scalar for f32).
      * gates [B, V, 256] (query_gates output) — the legacy in-kernel gate
        path, kept for A/B audits and f32 layout A.

    The activation storage dtype follows the folded weights: pass a
    fold_decoder_bn(dtype=bf16) dict for the bf16 pipeline (bf16
    activations/matmul operands, f32 accumulation + pre-sigmoid tail);
    v_tile must then be a multiple of 16 (bf16 sublane) instead of 8.
    """
    if (gates is None) == (enc is None):
        raise ValueError("pass exactly one of gates= or enc=")
    views = enc if gates is None else gates
    B, V = views.shape[0], views.shape[1]
    dtype = folded["w1"].dtype
    latent_all = latent_all.astype(jnp.float32)
    validate_v_tile(v_tile, dtype)
    pad = (-V) % v_tile
    Vp = V + pad
    n_vt = Vp // v_tile

    if enc is not None:
        if "A" not in folded:
            raise ValueError(
                "basis decode needs folded['A'] — re-fold with a params dict "
                "containing mlp2.weight/mlp2.bias (fold_decoder_bn)")
        h = _basis_head_auto(dtype) if head == "auto" else head
        if h not in ("stream", "stream_scalar", "y1"):
            raise ValueError(f"unknown basis head {h!r}")
        if pad:
            enc = jnp.concatenate(
                [enc, jnp.zeros((B, pad, enc.shape[2]), enc.dtype)], axis=1)
        selw = conv5_selectors(v_tile, folded["w5"], dtype)
        _, ab_m, c01, c23, b3_2, w4a, w4b, w4c, w4d = dotfuse_operands(folded)
        tail_args = (selw, ab_m, c01, c23,
                     folded["w2"], folded["b2"], b3_2,
                     w4a, w4b, w4c, w4d, folded["b4"],
                     folded["b5"].reshape(1, 1))
        compiler_params = None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES)
        out_spec = pl.BlockSpec((1, v_tile, SEQ), lambda b, v: (b, v, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Vp, SEQ), jnp.float32)
        if h == "y1":
            y1 = basis_y1(folded, latent_all, enc, f32=dtype == jnp.float32)
            kernel = functools.partial(_decoder_kernel_ppb, vt=v_tile,
                                       storage_dtype=dtype)
            out = pl.pallas_call(
                kernel,
                grid=(B, n_vt),
                in_specs=[
                    pl.BlockSpec((1, v_tile, FEAT, 2 * FEAT),
                                 lambda b, v: (b, v, 0, 0),
                                 memory_space=pltpu.VMEM),
                    *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
                ],
                out_specs=out_spec, out_shape=out_shape, interpret=interpret,
                compiler_params=compiler_params,
            )(y1, *tail_args)
        else:
            U = basis_planes(folded, latent_all, f32=dtype == jnp.float32)
            ep4 = basis_coeffs(enc)                       # [B, Vp, J] f32
            jn = ep4.shape[-1]
            ep4 = ep4.reshape(B, n_vt, v_tile, jn)
            if h == "stream":
                # f-major planes for the f-batched MXU mix; the per-beat
                # block index ignores the view axis, so the pipeline fetches
                # U once per beat and revisits it across view tiles
                ut = jnp.transpose(U, (0, 2, 1, 3)).astype(dtype)
                ut_spec = pl.BlockSpec((1, FEAT, jn, 2 * FEAT),
                                       lambda b, v: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
                ep_spec = pl.BlockSpec((1, 1, v_tile, jn),
                                       lambda b, v: (b, v, 0, 0),
                                       memory_space=pltpu.VMEM)
                mix = "fdot"
            else:
                # j-major f32 planes; coefficients read as SMEM scalars
                ut = U
                ut_spec = pl.BlockSpec((1, jn, FEAT, 2 * FEAT),
                                       lambda b, v: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
                ep_spec = pl.BlockSpec((1, 1, v_tile, jn),
                                       lambda b, v: (b, v, 0, 0),
                                       memory_space=pltpu.SMEM)
                mix = "scalar"
            kernel = functools.partial(_decoder_kernel_ppu, vt=v_tile,
                                       storage_dtype=dtype, mix=mix)
            out = pl.pallas_call(
                kernel,
                grid=(B, n_vt),
                in_specs=[ut_spec, ep_spec,
                          *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14],
                out_specs=out_spec, out_shape=out_shape, interpret=interpret,
                compiler_params=compiler_params,
            )(ut, ep4, folded["b1"], *tail_args)
        out = out.reshape(B, Vp, 4, QW).transpose(0, 1, 3, 2).reshape(B, Vp, SEQ)
        return out[:, :V] if pad else out

    gates = gates.astype(jnp.float32)
    if pad:
        gates = jnp.concatenate(
            [gates, jnp.zeros((B, pad, gates.shape[2]), gates.dtype)], axis=1
        )

    if dtype != jnp.float32 or not _F32_LAYOUT_A:
        # polyphase layout-B kernel (the production pipeline; docs/KERNELS.md):
        # gates ship PACKED [VT*2, 128] (pure reshape — the [VT*256, 1]
        # column block is one lane wide and its DMA costs ~3.9 ms/launch).
        # f32 runs the SAME body with every dot at Precision.HIGHEST
        # (_bdot_vc/_dot2_vc) — true-f32 fidelity at the polyphase/dot-fused
        # FLOP count instead of layout A's dense-upsample work.
        gpack = gates.reshape(B, n_vt, v_tile * 2, 128)
        selw = conv5_selectors(v_tile, folded["w5"], dtype)
        u1eo, ab_m, c01, c23, b3_2, w4a, w4b, w4c, w4d = dotfuse_operands(folded)
        m1, m2, ones128 = gate_expand_selectors(v_tile, dtype)
        kernel = functools.partial(_decoder_kernel_pp, vt=v_tile, storage_dtype=dtype)
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
        out = pl.pallas_call(
            kernel,
            grid=(B, n_vt),
            in_specs=[
                pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, v_tile * 2, 128), lambda b, v: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec((1, v_tile, SEQ), lambda b, v: (b, v, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Vp, SEQ), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
            ),
        )(
            latent_all, gpack, m1, m2, ones128, selw, u1eo, ab_m, c01, c23,
            folded["w1"], folded["b1"], folded["w2"], folded["b2"], b3_2,
            w4a, w4b, w4c, w4d, folded["b4"],
            folded["b5"].reshape(1, 1),
        )
        # kernel rows are phase-blocked [e, o-of-even, ...] = out[..., 4i+r]
        # at plane r: interleave back to time order in XLA
        out = out.reshape(B, Vp, 4, QW).transpose(0, 1, 3, 2).reshape(B, Vp, SEQ)
        return out[:, :V] if pad else out

    # layout-A f32 kernel: the independently-audited exact-precision
    # fallback, selectable for A/B parity checks (ECGPAN_F32_LAYOUT_A=1)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14
    kernel = functools.partial(_decoder_kernel, vt=v_tile, storage_dtype=dtype)
    e_sel, t_sel = gate_selectors(v_tile)
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
        upsample_shift_matrices(FEAT, dtype), upsample_shift_matrices(2 * FEAT, dtype),
        e_sel, t_sel,
        folded["w1"], folded["b1"], folded["w2"], folded["b2"],
        folded["w3"], folded["b3"], folded["w4"], folded["b4"],
        folded["w5"], folded["b5"],
    )
    return out[:, :V] if pad else out
