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
    same element counts with smaller peak operands, and the resident
    conv5 selectors [3, VT, VT*64] are smaller than the E/T gate selectors
    modeled in the weights term.
    """
    s = jnp.dtype(storage_dtype).itemsize
    consts = (256 * FEAT + v_tile * 256 + v_tile * SEQ) * s
    weights = (
        3 * (128 * 256 + 128 * 128 + 64 * 128 + 64 * 64 + 1 * 64) * s
        + 3 * (FEAT * 2 * FEAT + 2 * FEAT * SEQ) * s  # [3, n, 2n] shift stacks
        + (128 + 128 + 64 + 64 + 1) * 4  # biases
        # resident gate-selector matrices E [VT, VT*FEAT] + T [FEAT, VT*FEAT],
        # f32 (the gate stage is f32 in both pipelines) — grows with v_tile
        + (v_tile * v_tile * FEAT + FEAT * v_tile * FEAT) * 4
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


def _conv3(h, w_taps, b, vt: int, t: int, relu: bool, *, carry_f32: bool = False):
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
    # ~2 ms/launch) and the 3-D broadcast is also the one pattern the Mosaic
    # bf16 lowering rejects. E [VT, VT*128] replicates each view's gate
    # across its 128 lanes (a 0/1 selector matmul). The latent tiled across
    # views is a PURE concat-repeat, so the bf16 pipeline uses pltpu.repeat
    # (no T-matmul, bf16 multiply; callers already quantize latent/gates to
    # bf16, so the product rounds identically — measured +3% end to end);
    # the f32 pipeline keeps both exact f32 selector matmuls.
    if storage_dtype == jnp.float32:
        g_exp = _dot_f32(gates.T, e_ref[:])           # [256, VT*128]
        lat_t = _dot_f32(latent, t_ref[:])            # [256, VT*128]
        h = (g_exp * lat_t).astype(storage_dtype)
    else:
        g_exp = _dot_fast(gates.T, e_ref[:]).astype(storage_dtype)
        lat_t = pltpu.repeat(latent.astype(storage_dtype), vt, axis=1)
        h = g_exp * lat_t

    h = _upconv3(h, w1[:], b1[:], u1_ref[:], vt, FEAT, True)      # [128, VT*256]
    h = _conv3(h, w2[:], b2[:], vt, 2 * FEAT, True)               # [128, VT*256]
    h = _upconv3(h, w3[:], b3[:], u2_ref[:], vt, 2 * FEAT, True)  # [64, VT*512]
    # f32-carried tail: convs 4-5 accumulate f32 and hand the f32 result on
    # (operands follow the storage dtype; the carried values never round)
    h = _conv3(h, w4[:], b4[:], vt, SEQ, True, carry_f32=True)   # [64, VT*512] f32
    h = _conv3(h, w5[:], b5[:], vt, SEQ, False, carry_f32=True)  # [1, VT*512] f32

    out = jax.nn.sigmoid(h / 3.0)
    out_ref[0] = out.reshape(vt, SEQ).astype(out_ref.dtype)


# ----------------------------------------------- layout-B kernel (bf16 path)
# Activations live row-major (view, channel) as 2-D [VT*C, t]:
#   * gate stage = sublane-repeat of the latent x a pre-reshaped [VT*256, 1]
#     gate column (prepared in XLA) — no selector matmuls;
#   * channel mixes + upsample are BATCHED dot_generals over the view dim
#     ([VT*C, t] <-> [VT, C, t] views are free) — no sublane relayouts;
#   * lane shifts need no boundary masks (each row is one view's channel);
#   * conv5 (Cout=1) = three weighted row-selector matmuls (weights baked in
#     outside) + post-shifts.
# Measured bitwise-identical to the layout-A bf16 chain and ~3% faster
# (tools/bench_kernel_layoutB.py; docs/KERNELS.md). Mosaic discipline: this
# toolchain's compile helper crashes on 3-D broadcasts, multi-axis
# reductions, M=1 batched dots, and in-kernel 1-D vector reshapes — all
# elementwise work here stays 2-D, bias columns come from sublane-repeat,
# and conv5's weights/bias arrive pre-shaped. The f32 pipeline keeps the
# layout-A kernel (exact-precision path, no need to re-audit it against the
# crash list).


def _bdot_vc(a3, b3):
    """Batched [VT, M, K] @ [VT, K, N] -> [VT, M, N], f32 accumulation."""
    return jax.lax.dot_general(
        a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _shift2_vc(h2, k: int):
    if k == 1:
        return h2
    z = jnp.zeros((h2.shape[0], 1), h2.dtype)
    if k == 0:
        return jnp.concatenate([z, h2[:, :-1]], axis=1)
    return jnp.concatenate([h2[:, 1:], z], axis=1)


def conv5_selectors(v_tile: int, w5, dtype):
    """[3, VT, VT*64] weighted row-selectors: selw_k[v, v*64+c] = w5[k, 0, c]."""
    import numpy as np

    sel = (np.arange(v_tile * 64) // 64 == np.arange(v_tile)[:, None])
    sel = jnp.asarray(sel.astype(np.float32))
    w5t = jnp.tile(w5[:, 0, :].astype(jnp.float32), (1, v_tile))  # [3, VT*64]
    return (sel[None] * w5t[:, None, :]).astype(dtype)


def _decoder_kernel_vc(latent_ref, gcol_ref, selw_ref, u1_ref, u2_ref,
                       w1, b1, w2, b2, w3, b3, w4, b4, b5_2d,
                       out_ref, *, vt: int, storage_dtype):
    def brep(vec):
        return pltpu.repeat(vec.reshape(-1, 1), vt, axis=0)  # [VT*C, 1] f32

    def upconv(h2, w_taps, b, u3, cin, n_in):
        cout = w_taps.shape[1]
        h3 = h2.reshape(vt, cin, n_in)
        acc = None
        for k in range(3):
            g = _bdot_vc(jnp.broadcast_to(w_taps[k][None], (vt, cout, cin)), h3)
            y = _bdot_vc(g.astype(h2.dtype),
                         jnp.broadcast_to(u3[k][None], (vt, n_in, 2 * n_in)))
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vt * cout, 2 * n_in) + brep(b)
        return jnp.maximum(acc2, 0.0).astype(h2.dtype)

    def conv(h2, w_taps, b, cin, t, relu, carry_f32=False):
        cout = w_taps.shape[1]
        acc = None
        for k in range(3):
            s3 = _shift2_vc(h2, k).astype(w_taps.dtype).reshape(vt, cin, t)
            y = _bdot_vc(jnp.broadcast_to(w_taps[k][None], (vt, cout, cin)), s3)
            acc = y if acc is None else acc + y
        acc2 = acc.reshape(vt * cout, t) + brep(b)
        if relu:
            acc2 = jnp.maximum(acc2, 0.0)
        return acc2 if carry_f32 else acc2.astype(h2.dtype)

    lat_rep = pltpu.repeat(latent_ref[0].astype(storage_dtype), vt, axis=0)
    h = lat_rep * gcol_ref[0, 0].astype(storage_dtype)          # [VT*256, 128]
    h = upconv(h, w1[:], b1[:], u1_ref[:], 256, FEAT)           # [VT*128, 256]
    h = conv(h, w2[:], b2[:], 128, 2 * FEAT, True)              # [VT*128, 256]
    h = upconv(h, w3[:], b3[:], u2_ref[:], 128, 2 * FEAT)       # [VT*64, 512]
    h = conv(h, w4[:], b4[:], 64, SEQ, True, carry_f32=True)    # [VT*64, 512] f32
    # conv5: weighted selectors + post-shifts (f32-carried tail)
    gs = [
        jax.lax.dot_general(
            selw_ref[k], h.astype(storage_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for k in range(3)
    ]
    z = jnp.zeros((vt, 1), jnp.float32)
    left = jnp.concatenate([z, gs[0][:, :-1]], axis=1)
    right = jnp.concatenate([gs[2][:, 1:], z], axis=1)
    out = jax.nn.sigmoid((left + gs[1] + right + b5_2d[:]) / 3.0)
    out_ref[0] = out.astype(out_ref.dtype)


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

    if dtype != jnp.float32:
        # bf16 pipeline: layout-B (view, channel)-row kernel
        gcol = gates.reshape(B, n_vt, v_tile * 256, 1)
        selw = conv5_selectors(v_tile, folded["w5"], dtype)
        kernel = functools.partial(_decoder_kernel_vc, vt=v_tile, storage_dtype=dtype)
        weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        out = pl.pallas_call(
            kernel,
            grid=(B, n_vt),
            in_specs=[
                pl.BlockSpec((1, 256, FEAT), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, v_tile * 256, 1), lambda b, v: (b, v, 0, 0),
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
            latent_all, gcol, selw,
            upsample_shift_matrices(FEAT, dtype),
            upsample_shift_matrices(2 * FEAT, dtype),
            folded["w1"], folded["b1"], folded["w2"], folded["b2"],
            folded["w3"], folded["b3"], folded["w4"], folded["b4"],
            folded["b5"].reshape(1, 1),
        )
        return out[:, :V] if pad else out

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
