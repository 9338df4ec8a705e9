"""Fused Pallas ENCODER — the whole Nef-Net encode chain in one VMEM-resident
kernel, forward + recompute-backward (custom VJP).

Motivation (measured, docs/KERNELS.md + ROUND_NOTES): the encode side of the
train step costs 1.69 ms fwd+bwd at batch 32 bf16, of which only ~0.44 ms is
conv FLOPs — the rest is inter-op glue (dropout masks, residual/relu
elementwise, backward saved-activation HBM traffic, fusion-boundary
scheduling) that no per-op improvement can reach. This kernel runs the chain

    conv1(k15,s2) -> relu -> maxpool(k3,s2) -> 3x BasicBlock(k7)      [tower]
    -> x gate1 -> w_conv(k3) -> split z1/z2 -> z1_conv / z2_conv1
    -> roi_align (closed form) -> z2_conv2.{0,1,2}                    [z-block]

entirely in VMEM per batch tile (reference codes/network/encoder/resnet_1d.py
conv1/layer1, codes/network/model_nefnet.py:109-137), emitting z1 and the
pre-reverse z2 grid. roi_reverse + the lead means stay in XLA (they are single
MXU matmuls / trivial reductions already, ops/roi.py).

Design notes (all TPU-layout driven):
  * Grid over the batch: each program owns `nb` samples; every activation is
    [groups, C, nb*t] with per-sample time segments on the LANE axis, so k3/k7
    convs are tap-shifted batched matmuls (the decoder kernels' pattern) and
    sample boundaries are iota-mod masks — no padding, no dynamic shapes.
  * conv1 (k15, stride 2) runs in POLYPHASE form: the input is pre-split into
    its 4 phases mod 4, so each of the 15 taps is a small lane shift of one
    phase and the conv is one [128,16]x[16,nb*128] matmul per output parity —
    the stride never materializes a length-512 axis in the kernel (the same
    trick as the decode-side polyphase upsample, docs/KERNELS.md).
  * maxpool(k3,s2,p1) consumes the two conv1 parities directly:
    out[t] = max(odd[t-1], even[t], odd[t]) — no deinterleave. The backward
    routes to the FIRST maximal window slot (torch tie semantics).
  * Dropout masks are PRE-SCALED (0 or 1/keep) inputs drawn by the caller in
    kernel layout — keeps the kernel pure and per-seed deterministic, and the
    gradient parity test can feed both paths identical masks.
  * roi_align's closed form (midpoint x ramp, ops/roi.py) is two tiny matmuls
    plus an outer product; the ROI ramp arrives precomputed from the rois.
  * The z2_conv2 group structure (groups = 7L over the torch row-major
    (channel, segment) flattening — 7 does not divide 128, so groups mix
    channels ACROSS segments; models/nefnet.py parity note) is reproduced by
    materializing the align output in exactly that flat order before the
    batched per-group dots.
  * The backward kernel RECOMPUTES the forward in VMEM (inputs are the only
    residuals — no activation HBM traffic in either direction) and emits
    dgate plus every weight/bias grad, accumulated across the batch grid.
    x, masks, and the ramp get symbolic-zero cotangents (x is data; masks and
    rois are not loss paths).

dtype policy matches the decoder kernels: storage dtype follows the input
(bf16 under the mixed-precision step), every matmul accumulates f32
(HIGHEST precision for f32 operands), biases are f32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from electrocardio_panorama_tpu.models.blocks import DROPOUT_RATE
from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
    VMEM_LIMIT_BYTES,
    _dot_f32,
)

FEAT = 128
SEQ = 512
ALIGN = 16
SEGS = 7
KEEP = 1.0 - DROPOUT_RATE
NEG = -1e30


# --------------------------------------------------------------- weight packing
def pack_encoder_weights(params: dict, lead_num: int, dtype=jnp.float32) -> dict:
    """Tap-major batched conv weights + f32 biases from the flat torch-keyed
    param dict (W_encoder.*, w_conv.*, z1_conv.*, z2_conv1.*, z2_conv2.* —
    models/nefnet.py init). Differentiable (plain transposes/reshapes), so AD
    routes the kernel's packed grads back to the torch-keyed tree."""
    L = lead_num
    G7 = SEGS * L
    f32 = jnp.float32

    def gpack(key, groups):
        # [Cout, Cin/g, K] -> [K, g, Cout/g, Cin/g]
        wt = params[key]
        co, ci, K = wt.shape
        return wt.reshape(groups, co // groups, ci, K).transpose(3, 0, 1, 2).astype(dtype)

    w = {}
    c1 = params["W_encoder.conv1.weight"].reshape(L, FEAT, 15)
    w["c1w"] = jnp.pad(c1, ((0, 0), (0, 0), (0, 1))).astype(dtype)  # [L,128,16]
    for b in range(3):
        w[f"l{b}c1"] = gpack(f"W_encoder.layer1.{b}.conv1.weight", L)  # [7,L,128,128]
        w[f"l{b}c2"] = gpack(f"W_encoder.layer1.{b}.conv2.weight", L)
    w["wcw1"] = gpack("w_conv.0.conv1.weight", L)  # [3,L,128,128]
    w["wcw2"] = gpack("w_conv.0.conv2.weight", L)
    for nm, pfx in (("z1", "z1_conv.0"), ("z2", "z2_conv1.0")):
        w[f"{nm}w1"] = gpack(f"{pfx}.conv1.weight", L)  # [3,L,128,64]
        w[f"{nm}w2"] = gpack(f"{pfx}.conv2.weight", L)  # [3,L,128,128]
        w[f"{nm}wr"] = gpack(f"{pfx}.residual_conv.weight", L)[0]  # [L,128,64]
        w[f"{nm}br"] = params[f"{pfx}.residual_conv.bias"].reshape(L, FEAT).astype(f32)
    w["c20w1"] = gpack("z2_conv2.0.conv1.weight", G7)  # [3,G7,128,128]
    w["c20w2"] = gpack("z2_conv2.0.conv2.weight", G7)
    # ConvTranspose1d(k2,s2) torch layout [Cin, Cout/g, 2] -> [2, G7, 64, 128]
    wt = params["z2_conv2.1.weight"].reshape(G7, FEAT, 64, 2)
    w["wt"] = wt.transpose(3, 0, 2, 1).astype(dtype)
    w["bt"] = params["z2_conv2.1.bias"].reshape(G7, 64).astype(f32)
    w["c22w1"] = gpack("z2_conv2.2.conv1.weight", G7)  # [3,G7,128,64]
    w["c22w2"] = gpack("z2_conv2.2.conv2.weight", G7)  # [3,G7,128,128]
    w["c22wr"] = gpack("z2_conv2.2.residual_conv.weight", G7)[0]  # [G7,128,64]
    w["c22br"] = params["z2_conv2.2.residual_conv.bias"].reshape(G7, FEAT).astype(f32)
    return w


_WNAMES = (
    "c1w", "l0c1", "l0c2", "l1c1", "l1c2", "l2c1", "l2c2",
    "wcw1", "wcw2",
    "z1w1", "z1w2", "z1wr", "z1br",
    "z2w1", "z2w2", "z2wr", "z2br",
    "c20w1", "c20w2", "wt", "bt",
    "c22w1", "c22w2", "c22wr", "c22br",
)

# The 10 post-tower planes the "full" checkpoint mode stores (the z1f/z2g
# primal outputs complete the set without extra forward writes). First five
# are lead-plane class [L,C,B*128]; last five are z-grid class
# [7L,C,B*16 or B*32].
_CKPT2_NAMES = ("wr1", "hw", "zr11", "zr12", "z2f", "A", "c1", "Hc", "Ht", "c2")


def _ckpt_mode(v):
    """Normalize the encoder-checkpoint knob: False/'off' -> False,
    True/'tower' -> 'tower', 'full' -> 'full'."""
    if v in (False, None, "off", "false", ""):
        return False
    if v in (True, "tower", "true"):
        return "tower"
    if v == "full":
        return "full"
    raise ValueError(f"encoder_ckpt: expected off|tower|full, got {v!r}")


# -------------------------------------------------------------- host-side prep
def prep_encoder_inputs(x, gate1, ramp_bs):
    """Kernel-layout inputs from model-layout tensors (cheap XLA reshapes).

    x [B,L,512]; gate1 [B,L,128]; ramp_bs [B,7,16] (roi_align_ramp output).
    Returns xph [L,4,B*128] (4 phases mod 4 of the time axis), gate_exp
    [L,128,B*128] (per-channel gate broadcast over time), ramp [7,B*16]."""
    B, L, _ = x.shape
    xph = (
        x.transpose(1, 0, 2).reshape(L, B, FEAT, 4).transpose(0, 3, 1, 2)
        .reshape(L, 4, B * FEAT)
    )
    gexp = jnp.broadcast_to(
        gate1.transpose(1, 2, 0)[..., None], (L, FEAT, B, FEAT)
    ).reshape(L, FEAT, B * FEAT).astype(x.dtype)
    ramp = ramp_bs.transpose(1, 0, 2).reshape(SEGS, B * ALIGN).astype(x.dtype)
    return xph, gexp, ramp


def _mid_matrix(nb: int) -> np.ndarray:
    """[nb*128, nb]: roi_align midpoint 0.5*(x[63]+x[64]) per sample."""
    m = np.zeros((nb * FEAT, nb), np.float32)
    for s in range(nb):
        m[s * FEAT + FEAT // 2 - 1, s] = 0.5
        m[s * FEAT + FEAT // 2, s] = 0.5
    return m


def _bcast16(nb: int) -> np.ndarray:
    """[nb, nb*16]: lane-broadcast of one per-sample value over 16 slots."""
    b = np.zeros((nb, nb * ALIGN), np.float32)
    for s in range(nb):
        b[s, s * ALIGN:(s + 1) * ALIGN] = 1.0
    return b


def _ilv_mats(nb: int) -> np.ndarray:
    """[2, nb*16, nb*32]: per-sample ConvTranspose(k2,s2) interleave — column
    (s, 2u+k) of U_k picks row (s, u)."""
    u = np.zeros((2, nb * ALIGN, nb * 2 * ALIGN), np.float32)
    for k in range(2):
        for s in range(nb):
            for t in range(ALIGN):
                u[k, s * ALIGN + t, s * 2 * ALIGN + 2 * t + k] = 1.0
    return u


# ----------------------------------------------------------- kernel primitives
def _shiftn(h, s: int, t: int):
    """out[..., i] = h[..., i+s] within each length-t lane segment, 0 outside."""
    if s == 0:
        return h
    n = h.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1,) * (h.ndim - 1) + (n,), h.ndim - 1) % t
    if s > 0:
        sh = jnp.concatenate([h[..., s:], jnp.zeros(h.shape[:-1] + (s,), h.dtype)], axis=-1)
        m = pos < t - s
    else:
        sh = jnp.concatenate([jnp.zeros(h.shape[:-1] + (-s,), h.dtype), h[..., :n + s]], axis=-1)
        m = pos >= -s
    return sh * m.astype(h.dtype)


def _bdot(w, h):
    """[G,Co,Ci] x [G,Ci,N] -> [G,Co,N] f32-accumulating batched dot."""
    prec = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        w, h.astype(w.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _bdotT(w, d):
    """[G,Co,Ci] x [G,Co,N] -> [G,Ci,N] (transpose-contract over Co)."""
    prec = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        w, d.astype(w.dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _odw(dy, x, od):
    """[G,Co,N] x [G,Ci,N] -> [G,Co,Ci] (contract lanes): 1x1-conv / per-tap
    weight grad."""
    prec = jax.lax.Precision.HIGHEST if od == jnp.float32 else None
    return jax.lax.dot_general(
        dy.astype(od), x.astype(od), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _gconv(h, w, t: int):
    """Grouped k-tap conv over lane segments: sum_k w[k] @ shift_{k-c}(h).
    h [G,Ci,N], w [K,G,Co,Ci] -> [G,Co,N] f32 (pre-activation, no bias)."""
    K = w.shape[0]
    c = K // 2
    acc = None
    for k in range(K):
        y = _bdot(w[k], _shiftn(h, k - c, t))
        acc = y if acc is None else acc + y
    return acc


def _gconv_dh(dy, w, t: int):
    """dh = sum_k shift_{c-k}(w[k]^T @ dy). dy f32 -> f32."""
    K = w.shape[0]
    c = K // 2
    acc = None
    for k in range(K):
        y = _shiftn(_bdotT(w[k], dy), c - k, t)
        acc = y if acc is None else acc + y
    return acc


def _gconv_dw(dy, h, K: int, t: int, od):
    """dW[k] = dy (contract N) shift_{k-c}(h). Returns [K,G,Co,Ci] f32."""
    c = K // 2
    return jnp.stack([_odw(dy, _shiftn(h, k - c, t), od) for k in range(K)])


def _patches(xl, off: int, nb: int):
    """conv1 polyphase patch rows for one lead: 15 tap rows (+1 zero pad row)
    of the phase-split input. xl [4, nb*128]; off=0 -> even outputs (src
    4t+k-7), off=2 -> odd outputs (src 4t+k-5). -> [16, nb*128].

    Assembled as sum_m SEL_m @ shift_m(xl) with one-hot tap selectors: row
    slices like xl[q:q+1] carry a SUBLANE offset, and Mosaic rejects the
    lane-concats _shiftn would then do ("offset mismatch on non-concat
    dimension"); full-array shifts + tiny selector matmuls keep every
    operand at offset 0."""
    sels: dict[int, list] = {}
    for k in range(15):
        d = k - 7 + off
        q = d % 4
        m = (d - q) // 4
        sels.setdefault(m, []).append((k, q))
    r = jax.lax.broadcasted_iota(jnp.int32, (16, 4), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 4), 1)
    acc = None
    for m, pairs in sorted(sels.items()):
        hit = None
        for k, q in pairs:  # iota-built one-hots (pallas kernels cannot
            t = (r == k) & (c == q)  # capture host array constants)
            hit = t if hit is None else hit | t
        y = _dot_f32(hit.astype(xl.dtype), _shiftn(xl, m, FEAT))
        acc = y if acc is None else acc + y
    return acc.astype(xl.dtype)


# ----------------------------------------------------------------- fwd stages
def _relu(a):
    return jnp.maximum(a, 0.0)


def _stages(xph, gexp, ramp, mmid, bm16, u0, u1, masks, w, *, L, nb, train,
            ckpt=None, ckpt2=None):
    """Shared forward chain; returns every intermediate the backward needs.
    masks = (m6, mc20, mc22) pre-scaled dropout masks, or None in eval.

    ckpt: optional tuple of 7 tower planes (hs[0..3], r1s[0..2]) written by
    the forward kernel — the backward reads them instead of recomputing the
    tower (conv1 taps are still re-derived: the maxpool routing masks and
    the conv1 weight grad need ae/ao, two tiny K=16 matmuls per lead). The
    checkpointed values are bitwise the recompute's values (same kernel code
    produced them), so gradients are unchanged.

    ckpt2: optional tuple of the 12 post-tower planes
    (wr1, hw, zr11, zr12, z2f, A, c1, Hc, Ht, c2, z1f, z2g_flat) — the
    "full" checkpoint mode: with both tuples present the whole forward
    recompute collapses to reads + the cheap mask/gate multiplies and the
    backward is a pure reverse walk. z1f/z2g are the primal OUTPUTS fed
    back (no extra forward writes for those two)."""
    sd = gexp.dtype
    n = nb * FEAT
    G7 = SEGS * L
    X16, X32 = nb * ALIGN, nb * 2 * ALIGN
    m6, mc20, mc22 = masks if train else (None, None, None)

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % FEAT
    neg = jnp.asarray(NEG, sd)

    # tower head: conv1 polyphase + relu (ae/ao feed the maxpool and its
    # backward routing, so they are computed on both paths)
    ae_l, ao_l = [], []
    for l in range(L):
        pe = _patches(xph[l], 0, nb)
        po = _patches(xph[l], 2, nb)
        ae_l.append(_relu(_dot_f32(w["c1w"][l], pe)).astype(sd))
        ao_l.append(_relu(_dot_f32(w["c1w"][l], po)).astype(sd))

    if ckpt is None:
        # maxpool(odd[t-1], even[t], odd[t]) + 3x BasicBlock(k7)
        pooled_l = []
        for l in range(L):
            o_prev = jnp.where(pos == 0, neg, _shiftn(ao_l[l], -1, FEAT))
            pooled_l.append(
                jnp.maximum(jnp.maximum(o_prev, ae_l[l]), ao_l[l])[None])
        h = jnp.concatenate(pooled_l, axis=0)  # [L,128,n]

        hs, r1s, r1ms = [h], [], []
        for b in range(3):
            r1 = _relu(_gconv(h, w[f"l{b}c1"], FEAT)).astype(sd)
            r1m = r1 * m6[b] if train else r1
            h = _relu(_gconv(r1m, w[f"l{b}c2"], FEAT)
                      + h.astype(jnp.float32)).astype(sd)
            hs.append(h)
            r1s.append(r1)
            r1ms.append(r1m)
    else:
        hs = list(ckpt[:4])
        r1s = list(ckpt[4:])
        r1ms = [r1s[b] * m6[b] for b in range(3)] if train else list(r1s)
        h = hs[3]

    # gate + w_conv (identity residual)
    hg = (h * gexp).astype(sd)
    ramp_t = pltpu.repeat(ramp.astype(jnp.float32), L * FEAT, axis=0)  # [L*128*7, X16]
    if ckpt2 is None:
        wr1 = _relu(_gconv(hg, w["wcw1"], FEAT)).astype(sd)
        wr1m = wr1 * m6[3] if train else wr1
        hw = _relu(_gconv(wr1m, w["wcw2"], FEAT) + hg.astype(jnp.float32)).astype(sd)

        # split + z1_conv / z2_conv1 (1x1-conv residual, bias)
        z1h, z2h = hw[:, :64], hw[:, 64:]

        def zblock(zin, nm, mask):
            zr1 = _relu(_gconv(zin, w[f"{nm}w1"], FEAT)).astype(sd)
            zr1m = zr1 * mask if train else zr1
            out = _relu(
                _gconv(zr1m, w[f"{nm}w2"], FEAT)
                + _bdot(w[f"{nm}wr"], zin)
                + w[f"{nm}br"][:, :, None]
            ).astype(sd)
            return zr1, zr1m, out

        zr11, zr1m1, z1f = zblock(z1h, "z1", m6[4] if train else None)
        zr12, zr1m2, z2f = zblock(z2h, "z2", m6[5] if train else None)

        # roi_align closed form -> flat (lead, channel, segment) order
        mid = _dot_f32(z2f.reshape(L * FEAT, n), mmid)  # [L*128, nb]
        midx = _dot_f32(mid.astype(sd), bm16)  # [L*128, X16]
        mid_rep = jnp.broadcast_to(
            midx[:, None, :], (L * FEAT, SEGS, X16)
        ).reshape(L * FEAT * SEGS, X16)
        A = (mid_rep * ramp_t).astype(sd).reshape(G7, FEAT, X16)

        # z2_conv2.0 (identity residual)
        c1 = _relu(_gconv(A, w["c20w1"], ALIGN)).astype(sd)
        c1m = c1 * mc20 if train else c1
        Hc = _relu(_gconv(c1m, w["c20w2"], ALIGN) + A.astype(jnp.float32)).astype(sd)

        # ConvTranspose1d(k2,s2): batched channel dots + per-sample interleave
        y0 = _bdot(w["wt"][0], Hc).astype(sd).reshape(G7 * 64, X16)
        y1 = _bdot(w["wt"][1], Hc).astype(sd).reshape(G7 * 64, X16)
        ht = (_dot_f32(y0, u0) + _dot_f32(y1, u1)).reshape(G7, 64, X32) \
            + w["bt"][:, :, None]
        Ht = ht.astype(sd)

        # z2_conv2.2 (1x1-conv residual, bias)
        c2 = _relu(_gconv(Ht, w["c22w1"], 2 * ALIGN)).astype(sd)
        c2m = c2 * mc22 if train else c2
        z2g = _relu(
            _gconv(c2m, w["c22w2"], 2 * ALIGN)
            + _bdot(w["c22wr"], Ht)
            + w["c22br"][:, :, None]
        ).astype(sd)
    else:
        # full-checkpoint reconstruction: only the mask products are
        # re-derived (bitwise the originals — same operands, same op)
        wr1, hw, zr11, zr12, z2f, A, c1, Hc, Ht, c2, z1f, z2gf = ckpt2
        wr1m = wr1 * m6[3] if train else wr1
        zr1m1 = zr11 * m6[4] if train else zr11
        zr1m2 = zr12 * m6[5] if train else zr12
        c1m = c1 * mc20 if train else c1
        c2m = c2 * mc22 if train else c2
        z2g = z2gf.reshape(G7, FEAT, X32)

    return dict(
        ae=ae_l, ao=ao_l, hs=hs, r1s=r1s, r1ms=r1ms,
        hg=hg, wr1=wr1, wr1m=wr1m, hw=hw,
        zr11=zr11, zr1m1=zr1m1, z1f=z1f, zr12=zr12, zr1m2=zr1m2, z2f=z2f,
        A=A, c1=c1, c1m=c1m, Hc=Hc, Ht=Ht, c2=c2, c2m=c2m, z2g=z2g,
        ramp_t=ramp_t, pos=pos, neg=neg,
    )


# --------------------------------------------------------------- fwd/bwd kernels
def _unpack_w(wrefs):
    return {nm: r[...] for nm, r in zip(_WNAMES, wrefs)}


def _fwd_kernel(*refs, L, nb, train, ckpt=False):
    nin = 7 + (3 if train else 0)
    xph, gexp, ramp, mmid, bm16, u0, u1 = (r[...] for r in refs[:7])
    masks = tuple(r[...] for r in refs[7:nin]) if train else None
    wrefs = refs[nin:nin + len(_WNAMES)]
    outs = refs[nin + len(_WNAMES):]
    z1_ref, z2g_ref = outs[:2]
    st = _stages(xph, gexp, ramp, mmid, bm16, u0, u1, masks,
                 _unpack_w(wrefs), L=L, nb=nb, train=train)
    z1_ref[...] = st["z1f"]
    G7 = SEGS * L
    z2g_ref[...] = st["z2g"].reshape(G7 * FEAT, nb * 2 * ALIGN)
    if ckpt:
        for i, r in enumerate(outs[2:6]):
            r[...] = st["hs"][i]
        for b, r in enumerate(outs[6:9]):
            r[...] = st["r1s"][b]
    if ckpt == "full":
        for nm, r in zip(_CKPT2_NAMES, outs[9:19]):
            r[...] = st[nm]


def _acc(ref, val):
    """Accumulate a weight grad across the batch grid axis (the innermost
    axis of the backward's (lead, batch) grid, so each lead's grad block is
    revisited consecutively). Bias grads reshape to their lead-leading 3-D
    block form (_r3l) here."""
    val = val.reshape(ref.shape).astype(ref.dtype)
    bid = pl.program_id(1)

    @pl.when(bid == 0)
    def _():
        ref[...] = val

    @pl.when(bid != 0)
    def _():
        ref[...] = ref[...] + val


_GNAMES = (
    "c1w", "l0c1", "l0c2", "l1c1", "l1c2", "l2c1", "l2c2",
    "wcw1", "wcw2",
    "z1w1", "z1w2", "z1wr", "z1br",
    "z2w1", "z2w2", "z2wr", "z2br",
    "c20w1", "c20w2", "wt", "bt",
    "c22w1", "c22w2", "c22wr", "c22br",
)


def _gt0(x):
    """x > 0 computed in f32: v5e Mosaic rejects bf16 `arith.cmpf`
    ("Target does not support this comparison"); bf16→f32 is exact, so the
    mask is identical to comparing in bf16."""
    return x.astype(jnp.float32) > 0


def _eqf(a, b):
    """a == b computed in f32 (exact for bf16 operands) — same v5e Mosaic
    bf16-cmpf constraint as _gt0."""
    return a.astype(jnp.float32) == b.astype(jnp.float32)


def _bwd_kernel(*refs, L, nb, nck=0):
    """Recompute the forward (or read the checkpoints: nck=7 tower planes,
    nck=19 the full set), then walk the chain backwards emitting dgate plus
    every weight/bias grad (grid-accumulated)."""
    (xph, gexp, ramp, mmid, bm16, u0, u1, mmidT, bm16T, u0T, u1T) = (
        r[...] for r in refs[:11]
    )
    m6, mc20, mc22 = (r[...] for r in refs[11:14])
    wrefs = refs[14:14 + len(_WNAMES)]
    dz1_ref, dz2g_ref = refs[14 + len(_WNAMES):16 + len(_WNAMES)]
    ck = tuple(r[...] for r in refs[16 + len(_WNAMES):16 + len(_WNAMES) + nck])
    douts = refs[16 + len(_WNAMES) + nck:]
    dgexp_ref = douts[0]
    grefs = dict(zip(_GNAMES, douts[1:]))

    w = _unpack_w(wrefs)
    # bias-class blocks arrive in their lead-leading 3-D view (_r3l);
    # collapse the leading block-of-1 back out (layout-preserving)
    for _nm in _R3:
        w[_nm] = w[_nm].reshape(w[_nm].shape[1:])
    f32 = jnp.float32
    od = w["wcw2"].dtype
    n = nb * FEAT
    G7 = SEGS * L
    X16, X32 = nb * ALIGN, nb * 2 * ALIGN
    st = _stages(xph, gexp, ramp, mmid, bm16, u0, u1, (m6, mc20, mc22),
                 w, L=L, nb=nb, train=True, ckpt=ck[:7] if nck else None,
                 ckpt2=ck[7:] if nck > 7 else None)

    dz1 = dz1_ref[...].astype(f32)
    dz2g = dz2g_ref[...].reshape(G7, FEAT, X32).astype(f32)

    # ---- z2_conv2.2
    da = dz2g * _gt0(st["z2g"])
    _acc(grefs["c22w2"], _gconv_dw(da, st["c2m"], 3, 2 * ALIGN, od))
    _acc(grefs["c22wr"], _odw(da, st["Ht"], od))
    _acc(grefs["c22br"], jnp.sum(da, axis=2))
    da1 = _gconv_dh(da, w["c22w2"], 2 * ALIGN)
    da1 = da1 * mc22 * _gt0(st["c2"])
    _acc(grefs["c22w1"], _gconv_dw(da1, st["Ht"], 3, 2 * ALIGN, od))
    dHt = _gconv_dh(da1, w["c22w1"], 2 * ALIGN) + _bdotT(w["c22wr"], da)

    # ---- ConvTranspose
    _acc(grefs["bt"], jnp.sum(dHt, axis=2))
    dflat = dHt.reshape(G7 * 64, X32).astype(od)
    dy0 = _dot_f32(dflat, u0T).reshape(G7, 64, X16)
    dy1 = _dot_f32(dflat, u1T).reshape(G7, 64, X16)
    _acc(grefs["wt"], jnp.stack([_odw(dy0, st["Hc"], od), _odw(dy1, st["Hc"], od)]))
    dHc = _bdotT(w["wt"][0], dy0) + _bdotT(w["wt"][1], dy1)

    # ---- z2_conv2.0
    da = dHc * _gt0(st["Hc"])
    _acc(grefs["c20w2"], _gconv_dw(da, st["c1m"], 3, ALIGN, od))
    da1 = _gconv_dh(da, w["c20w2"], ALIGN)
    da1 = da1 * mc20 * _gt0(st["c1"])
    _acc(grefs["c20w1"], _gconv_dw(da1, st["A"], 3, ALIGN, od))
    dA = _gconv_dh(da1, w["c20w1"], ALIGN) + da  # identity residual

    # ---- roi_align closed form
    fA = dA.reshape(L * FEAT * SEGS, X16) * st["ramp_t"]
    dmidx = fA.reshape(L * FEAT, SEGS, X16).sum(axis=1)
    dmid = _dot_f32(dmidx.astype(od), bm16T)  # [L*128, nb]
    dz2f = _dot_f32(dmid.astype(od), mmidT).reshape(L, FEAT, n)

    # ---- z1_conv / z2_conv1 (shared structure)
    z1h, z2h = st["hw"][:, :64], st["hw"][:, 64:]

    def zblock_bwd(dout, nm, zin, zr1, zr1m, zf, mask):
        da = dout * _gt0(zf)
        _acc(grefs[f"{nm}w2"], _gconv_dw(da, zr1m, 3, FEAT, od))
        _acc(grefs[f"{nm}wr"], _odw(da, zin, od))
        _acc(grefs[f"{nm}br"], jnp.sum(da, axis=2))
        da1 = _gconv_dh(da, w[f"{nm}w2"], FEAT) * mask * _gt0(zr1)
        _acc(grefs[f"{nm}w1"], _gconv_dw(da1, zin, 3, FEAT, od))
        return _gconv_dh(da1, w[f"{nm}w1"], FEAT) + _bdotT(w[f"{nm}wr"], da)

    dz1h = zblock_bwd(dz1, "z1", z1h, st["zr11"], st["zr1m1"], st["z1f"], m6[4])
    dz2h = zblock_bwd(dz2f, "z2", z2h, st["zr12"], st["zr1m2"], st["z2f"], m6[5])
    dhw = jnp.concatenate([dz1h, dz2h], axis=1)  # [L,128,n]

    # ---- w_conv
    da = dhw * _gt0(st["hw"])
    _acc(grefs["wcw2"], _gconv_dw(da, st["wr1m"], 3, FEAT, od))
    da1 = _gconv_dh(da, w["wcw2"], FEAT) * m6[3] * _gt0(st["wr1"])
    _acc(grefs["wcw1"], _gconv_dw(da1, st["hg"], 3, FEAT, od))
    dhg = _gconv_dh(da1, w["wcw1"], FEAT) + da

    # ---- gate
    h3 = st["hs"][3].astype(f32)
    dgexp_ref[...] = (dhg * h3).astype(dgexp_ref.dtype)
    dh = dhg * gexp.astype(f32)

    # ---- layer1
    for b in reversed(range(3)):
        da2 = dh * _gt0(st["hs"][b + 1])
        _acc(grefs[f"l{b}c2"], _gconv_dw(da2, st["r1ms"][b], 7, FEAT, od))
        da1 = _gconv_dh(da2, w[f"l{b}c2"], FEAT) * m6[b] * _gt0(st["r1s"][b])
        _acc(grefs[f"l{b}c1"], _gconv_dw(da1, st["hs"][b], 7, FEAT, od))
        dh = _gconv_dh(da1, w[f"l{b}c1"], FEAT) + da2

    # ---- maxpool (first-max tie routing) + conv1 weight grad
    pos, neg = st["pos"], st["neg"]
    dc1_l = []
    for l in range(L):
        ae, ao = st["ae"][l], st["ao"][l]
        pooled = st["hs"][0][l]
        o_prev = jnp.where(pos == 0, neg, _shiftn(ao, -1, FEAT))
        m1 = _eqf(o_prev, pooled)
        m2 = _eqf(ae, pooled) & ~m1
        m3 = _eqf(ao, pooled) & ~m1 & ~m2
        dpool = dh[l]
        da_e = dpool * m2 * _gt0(ae)
        da_o = (dpool * m3 + _shiftn(dpool * m1.astype(f32), 1, FEAT)) * _gt0(ao)
        pe = _patches(xph[l], 0, nb).astype(od)
        po = _patches(xph[l], 2, nb).astype(od)
        prec = jax.lax.Precision.HIGHEST if od == jnp.float32 else None
        dce = jax.lax.dot_general(
            da_e.astype(od), pe, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        dco = jax.lax.dot_general(
            da_o.astype(od), po, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        dc1_l.append((dce + dco)[None])
    _acc(grefs["c1w"], jnp.concatenate(dc1_l, axis=0))


# ------------------------------------------------------------------ call layer
def encoder_vmem_bytes_estimate(nb: int, L: int, itemsize: int = 2,
                                bwd: bool = True, ckpt: bool = False) -> int:
    """Conservative per-program VMEM footprint at batch tile `nb`.

    Backward (the wider of the pair): ~26 live [L,128,nb*128]-class planes
    (recomputed forward intermediates + masks + f32 grad transients) plus the
    z2_conv2 stage planes, storage-dtype weights, and f32 weight-grad
    accumulators. Forward keeps only the double-buffered streaming planes
    (~14) and no grad state.

    The backward runs on a (lead, batch) grid — every encoder stage is
    lead-grouped — so its per-program footprint is evaluated at L=1
    (_bwd_call passes L=1 here). Measured reality check: the batch-only
    (L=3) backward needed 152.5M on chip at nb=8 bf16 (101.7M register
    spills the analytic count below cannot see), 24.5M past the 128M VMEM;
    the L=1 grid divides the plane/spill terms by 3."""
    n = nb * FEAT
    plane = L * FEAT * n
    zplane = SEGS * L * FEAT * nb * ALIGN
    welems = (
        L * FEAT * 16
        + 6 * 7 * L * FEAT * FEAT
        + 4 * 3 * L * FEAT * FEAT
        + 2 * (3 * L * FEAT * 64 + 3 * L * FEAT * FEAT + L * FEAT * 64)
        + 2 * 3 * SEGS * L * FEAT * FEAT
        + 2 * SEGS * L * 64 * FEAT
        + 3 * SEGS * L * FEAT * 64 + 3 * SEGS * L * FEAT * FEAT
        + SEGS * L * FEAT * 64
    )
    consts = (nb * FEAT * nb + nb * nb * ALIGN + 4 * nb * ALIGN * nb * 2 * ALIGN) * 4
    if bwd:
        # ckpt replaces recompute transients with streamed-in planes — the
        # live set is the same either way (read vs computed residency)
        acts = (26 * plane + 14 * zplane) * itemsize + 6 * plane * 4
        return acts + welems * (itemsize + 4) + 2 * consts
    # ckpt adds output blocks to the forward: 7 tower planes ('tower'),
    # plus 5 lead planes + 5 z-grid planes ('full')
    mode = _ckpt_mode(ckpt)
    nlead = {False: 0, "tower": 7, "full": 12}[mode]
    nz = 5 if mode == "full" else 0
    acts = ((14 + nlead) * plane + (10 + nz) * zplane) * itemsize
    return acts + welems * itemsize + consts


def _validate_nb(nb: int, L: int, itemsize: int, bwd: bool,
                 ckpt: bool = False) -> None:
    if nb % 8 != 0:
        raise ValueError(f"fused encoder: batch tile nb={nb} must be a multiple of 8 "
                         "(lane-dim blocks)")
    est = encoder_vmem_bytes_estimate(nb, L, itemsize, bwd=bwd, ckpt=ckpt)
    if est > VMEM_LIMIT_BYTES:
        raise ValueError(
            f"fused encoder: batch tile {nb} needs ~{est / 2**20:.0f} MiB of "
            f"VMEM per program (> {VMEM_LIMIT_BYTES / 2**20:.0f} MiB budget); "
            "use compute_dtype bfloat16 or TPU.train_encoder='xla' "
            "(estimate: encoder_vmem_bytes_estimate)"
        )


def _consts(nb: int, sd):
    mmid = jnp.asarray(_mid_matrix(nb), sd)
    bm16 = jnp.asarray(_bcast16(nb), sd)
    u = _ilv_mats(nb)
    return mmid, bm16, jnp.asarray(u[0], sd), jnp.asarray(u[1], sd)


def _block(shape, idx_axis, ndim):
    """BlockSpec blocking one axis by grid index, whole on the others."""
    def imap(g):
        return tuple(g if i == idx_axis else 0 for i in range(ndim))
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _fwd_call(w, xph, gexp, ramp, masks, *, L, nb, train, interpret,
              ckpt=False):
    sd = gexp.dtype
    B = xph.shape[-1] // FEAT
    if not interpret:
        _validate_nb(nb, L, jnp.dtype(sd).itemsize, bwd=False, ckpt=ckpt)
    if B % nb != 0:
        raise ValueError(f"fused encoder: batch {B} not divisible by tile {nb}")
    G = B // nb
    G7 = SEGS * L
    n = nb * FEAT
    mmid, bm16, u0, u1 = _consts(nb, sd)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        _block((L, 4, n), 2, 3),        # xph
        _block((L, FEAT, n), 2, 3),     # gexp
        _block((SEGS, nb * ALIGN), 1, 2),  # ramp
        whole, whole, whole, whole,     # mmid bm16 u0 u1
    ]
    args = [xph, gexp, ramp, mmid, bm16, u0, u1]
    if train:
        m6, mc20, mc22 = masks
        in_specs += [
            _block((6, L, FEAT, n), 3, 4),
            _block((G7, FEAT, nb * ALIGN), 2, 3),
            _block((G7, FEAT, nb * 2 * ALIGN), 2, 3),
        ]
        args += [m6, mc20, mc22]
    in_specs += [whole] * len(_WNAMES)
    args += [w[nm] for nm in _WNAMES]
    out_specs = [
        _block((L, FEAT, n), 2, 3),
        _block((G7 * FEAT, nb * 2 * ALIGN), 1, 2),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, FEAT, B * FEAT), sd),
        jax.ShapeDtypeStruct((G7 * FEAT, B * 2 * ALIGN), sd),
    ]
    if ckpt:
        # 7 tower block-boundary planes (hs[0..3], r1s[0..2]) for the
        # checkpoint backward: ~19 MB/step at B=32 bf16 L=3 — ~0.05 ms of
        # HBM round-trip vs the ~0.25 ms tower recompute it removes
        out_specs += [_block((L, FEAT, n), 2, 3)] * 7
        out_shape += [jax.ShapeDtypeStruct((L, FEAT, B * FEAT), sd)] * 7
    if ckpt == "full":
        # + the 10 post-tower planes (~26 MB/step more at B=32 bf16): the
        # backward becomes a pure reverse walk (z1/z2g primals fed back free)
        co = lambda nm: w[nm].shape[2]  # noqa: E731
        G7 = SEGS * L
        for C in (co("wcw1"), co("wcw2"), co("z1w1"), co("z2w1"), co("z2w2")):
            out_specs.append(_block((L, C, n), 2, 3))
            out_shape.append(jax.ShapeDtypeStruct((L, C, B * FEAT), sd))
        for C, X in ((FEAT, ALIGN), (co("c20w1"), ALIGN), (co("c20w2"), ALIGN),
                     (co("wt"), 2 * ALIGN), (co("c22w1"), 2 * ALIGN)):
            out_specs.append(_block((G7, C, nb * X), 2, 3))
            out_shape.append(jax.ShapeDtypeStruct((G7, C, B * X), sd))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, nb=nb, train=train, ckpt=ckpt),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(*args)
    if ckpt:
        return outs[0], outs[1], tuple(outs[2:])
    return outs


# Lead axis of each packed weight/grad tensor (None = lead-independent is not
# a case here: every encoder weight is lead-grouped). Value = (axis, blocks
# per lead along that axis): L-sized axes block by 1, SEGS*L-sized group axes
# by SEGS (the G7 flattening is lead-contiguous — lead l owns groups
# [l*7, (l+1)*7), see the A-matrix reshape in _stages).
_LEAD_AXIS = {
    "c1w": (0, 1),
    "l0c1": (1, 1), "l0c2": (1, 1), "l1c1": (1, 1), "l1c2": (1, 1),
    "l2c1": (1, 1), "l2c2": (1, 1),
    "wcw1": (1, 1), "wcw2": (1, 1),
    "z1w1": (1, 1), "z1w2": (1, 1), "z1wr": (0, 1), "z1br": (0, 1),
    "z2w1": (1, 1), "z2w2": (1, 1), "z2wr": (0, 1), "z2br": (0, 1),
    "c20w1": (1, SEGS), "c20w2": (1, SEGS), "wt": (1, SEGS), "bt": (0, 1),
    "c22w1": (1, SEGS), "c22w2": (1, SEGS), "c22wr": (0, SEGS),
    "c22br": (0, 1),
}
# (_R3 members are specced on their _r3l 3-D view, whose lead axis is 0 with
# one block per lead.)


# Bias-class tensors ([L,128], [7L,128], [7L,64]) cannot block per-lead in
# their 2-D form: the lead/group axis sits in the SUBLANE position and a
# block of 1 (or 7) there is neither 8-divisible nor the full dim, which the
# hardware lowering rejects. They travel through the backward call in a
# lead-LEADING 3-D view ([L,1,128] / [L,7,128] / [L,7,64]) whose last two
# dims equal the full array dims; the kernel collapses the leading block of
# 1 back out (layout-preserving).
_R3 = {"z1br", "z2br", "c22br", "bt"}


def _r3l(nm, v):
    """Lead-leading 3-D view of a bias-class tensor (identity otherwise)."""
    if nm in ("z1br", "z2br"):
        return v.reshape(v.shape[0], 1, FEAT)
    if nm in ("c22br", "bt"):
        return v.reshape(-1, SEGS, v.shape[-1])
    return v


def _lead_spec(shape, nm):
    """Per-lead block of a packed weight/grad tensor: whole on every axis but
    the lead axis. index_map sees the (lead, batch) grid."""
    axis, per = _LEAD_AXIS[nm]
    blk = tuple(per if i == axis else s for i, s in enumerate(shape))

    def imap(gl, gb, _axis=axis, _nd=len(shape)):
        return tuple(gl if i == _axis else 0 for i in range(_nd))

    return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)


def _lb(blk, lead_axis, batch_axis):
    """BlockSpec blocked by lead on one axis and batch on another."""
    nd = len(blk)

    def imap(gl, gb):
        return tuple(gl if i == lead_axis else (gb if i == batch_axis else 0)
                     for i in range(nd))

    return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)


def _bwd_call(w, xph, gexp, ramp, masks, dz1, dz2g, *, L, nb, interpret,
              ckpt=None):
    """Backward pallas call on a (lead, batch) grid.

    The recompute-backward holds ~26 activation planes live from the forward
    recompute until their reverse-walk use; on a batch-only grid that live set
    register-spills past VMEM (measured 152.5M/128M at nb=8, L=3 — 101.7M of
    it spill slots). Every encoder stage is lead-grouped, so blocking the
    lead axis divides the live set by L at zero extra HBM traffic: weights
    stream once per lead (outer, slow axis) and weight grads accumulate over
    the inner batch axis (consecutive revisits of the same block)."""
    sd = gexp.dtype
    B = xph.shape[-1] // FEAT
    if not interpret:
        _validate_nb(nb, 1, jnp.dtype(sd).itemsize, bwd=True)
    G = B // nb
    n = nb * FEAT
    mmid, bm16, u0, u1 = _consts(nb, sd)
    m6, mc20, mc22 = masks
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        _lb((1, 4, n), 0, 2),            # xph
        _lb((1, FEAT, n), 0, 2),         # gexp
        _lb((SEGS, nb * ALIGN), -1, 1),  # ramp (lead-independent)
        whole, whole, whole, whole,      # mmid bm16 u0 u1
        whole, whole, whole, whole,      # transposes
        _lb((6, 1, FEAT, n), 1, 3),      # m6
        _lb((SEGS, FEAT, nb * ALIGN), 0, 2),      # mc20
        _lb((SEGS, FEAT, nb * 2 * ALIGN), 0, 2),  # mc22
    ]
    in_specs += [_lead_spec(_r3l(nm, w[nm]).shape, nm) for nm in _WNAMES]
    in_specs += [
        _lb((1, FEAT, n), 0, 2),                      # dz1
        _lb((SEGS * FEAT, nb * 2 * ALIGN), 0, 1),     # dz2g
    ]
    args = [xph, gexp, ramp, mmid, bm16, u0, u1,
            mmid.T, bm16.T, u0.T, u1.T, m6, mc20, mc22]
    args += [_r3l(nm, w[nm]) for nm in _WNAMES]
    args += [dz1.astype(sd), dz2g.astype(sd)]
    if ckpt is not None:
        in_specs += [_lb((1, FEAT, n), 0, 2)] * 7     # tower checkpoints
        args += list(ckpt[:7])
        if len(ckpt) > 7:                             # full mode: 10 + primals
            for t in ckpt[7:12]:                      # lead planes
                in_specs.append(_lb((1, t.shape[1], n), 0, 2))
            for t in ckpt[12:17]:                     # z-grid planes
                in_specs.append(_lb((SEGS, t.shape[1], t.shape[2] // G), 0, 2))
            in_specs.append(_lb((1, FEAT, n), 0, 2))              # z1 primal
            in_specs.append(_lb((SEGS * FEAT, nb * 2 * ALIGN), 0, 1))  # z2g
            args += [t.astype(sd) for t in ckpt[7:]]

    out_specs = [_lb((1, FEAT, n), 0, 2)]  # dgexp
    out_shape = [jax.ShapeDtypeStruct((L, FEAT, B * FEAT), jnp.float32)]
    for nm in _GNAMES:
        shp = _r3l(nm, w[nm]).shape
        out_specs.append(_lead_spec(shp, nm))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=1, nb=nb,
                          nck=len(ckpt) if ckpt is not None else 0),
        grid=(L, G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(*args)
    # collapse the bias grads' 3-D block view back to the packed shapes
    return [outs[0]] + [
        g.reshape(w[nm].shape) for nm, g in zip(_GNAMES, outs[1:])
    ]


# ------------------------------------------------------------------ custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def encode_fused_train(static, w: dict, xph, gexp, ramp, m6, mc20, mc22):
    """Fused training encode. static = (L, nb, interpret[, ckpt]). Returns
    (z1 [L,128,B*128], z2_grid_flat [7L*128, B*32]) in kernel layout.

    With ckpt=True (the default via make_fused_encode_fn) the forward-for-
    backward additionally writes the 7 tower block-boundary planes to HBM
    and the backward reads them instead of recomputing the tower — identical
    gradients (the stored values are bitwise the recompute's), less backward
    compute."""
    L, nb, interpret = static[:3]
    return _fwd_call(w, xph, gexp, ramp, (m6, mc20, mc22),
                     L=L, nb=nb, train=True, interpret=interpret)


def _vjp_fwd(static, w, xph, gexp, ramp, m6, mc20, mc22):
    L, nb, interpret = static[:3]
    ckpt = _ckpt_mode(static[3] if len(static) > 3 else False)
    if ckpt:
        z1, z2g, ck = _fwd_call(w, xph, gexp, ramp, (m6, mc20, mc22),
                                L=L, nb=nb, train=True, interpret=interpret,
                                ckpt=ckpt)
        if ckpt == "full":
            ck = ck + (z1, z2g)  # primal outputs complete the full set
        return (z1, z2g), (w, xph, gexp, ramp, m6, mc20, mc22, ck)
    out = _fwd_call(w, xph, gexp, ramp, (m6, mc20, mc22),
                    L=L, nb=nb, train=True, interpret=interpret)
    return tuple(out), (w, xph, gexp, ramp, m6, mc20, mc22, None)


def _vjp_bwd(static, res, cts):
    L, nb, interpret = static[:3]
    w, xph, gexp, ramp, m6, mc20, mc22, ck = res
    dz1, dz2g = cts
    outs = _bwd_call(w, xph, gexp, ramp, (m6, mc20, mc22), dz1, dz2g,
                     L=L, nb=nb, interpret=interpret, ckpt=ck)
    dgexp = outs[0].astype(gexp.dtype)
    dw = {nm: g.astype(w[nm].dtype) for nm, g in zip(_GNAMES, outs[1:])}
    zeros = jnp.zeros_like
    return dw, zeros(xph), dgexp, zeros(ramp), zeros(m6), zeros(mc20), zeros(mc22)


encode_fused_train.defvjp(_vjp_fwd, _vjp_bwd)


def encode_fused_eval(w: dict, xph, gexp, ramp, *, L, nb=8, interpret=False):
    """Eval-mode fused encode (no dropout): same kernel, mask-free signature."""
    return _fwd_call(w, xph, gexp, ramp, None, L=L, nb=nb, train=False,
                     interpret=interpret)


# --------------------------------------------------------------- model adapter
def draw_masks(rng, B: int, L: int, dtype):
    """Pre-scaled dropout masks in kernel layout: (m6 [6,L,128,B*128],
    mc20 [7L,128,B*16], mc22 [7L,128,B*32])."""
    G7 = SEGS * L
    k1, k2, k3 = jax.random.split(rng, 3)
    scale = jnp.asarray(1.0 / KEEP, dtype)

    def draw(k, shape):
        return jax.random.bernoulli(k, KEEP, shape).astype(dtype) * scale

    return (
        draw(k1, (6, L, FEAT, B * FEAT)),
        draw(k2, (G7, FEAT, B * ALIGN)),
        draw(k3, (G7, FEAT, B * 2 * ALIGN)),
    )


def unpack_outputs(z1k, z2gk, L: int):
    """Kernel-layout outputs -> model layout: z1 [B,128L,128],
    z2_grid [B,128L,7,32]."""
    B = z1k.shape[-1] // FEAT
    z1 = z1k.reshape(L, FEAT, B, FEAT).transpose(2, 0, 1, 3).reshape(B, FEAT * L, FEAT)
    z2_grid = (
        z2gk.reshape(SEGS * L * FEAT, B, 2 * ALIGN).transpose(1, 0, 2)
        .reshape(B, FEAT * L, SEGS, 2 * ALIGN)
    )
    return z1, z2_grid


def make_fused_encode_fn(lead_num: int, theta_encoder_len: int = 1, *,
                         nb: int = 8, interpret: bool = False,
                         tower_ckpt: bool = True):
    """Build the `encode_fn` hook for models.nefnet.nefnet_apply: a drop-in
    for encode_latents that runs the encoder through the fused kernel pair.
    roi_reverse + lead means stay in XLA (single matmul / reductions).

    tower_ckpt: False/'off' = pure recompute backward (zero activation HBM
    traffic); True/'tower' (default) = store the 7 tower block-boundary
    planes; 'full' = store every reverse-walk plane (backward is a pure
    reverse walk). Gradients are bitwise identical across all three (A/B
    knob — tools/ab_train_encoder.py, tools/verify_encoder_ckpt.py)."""
    tower_ckpt = _ckpt_mode(tower_ckpt)

    def fn(p, x, input_thetas, rois, *, rng=None, train=False):
        from electrocardio_panorama_tpu.models.nefnet import (
            NefNetLatents, encode_latents)
        from electrocardio_panorama_tpu.ops import angular_encode, linear, roi_reverse_1d
        from electrocardio_panorama_tpu.ops.roi import roi_align_ramp

        L = lead_num
        B = x.shape[0]
        # hardware needs nb % 8 (lane-dim blocks); interpret mode has no
        # tiling constraint, so shrink the tile to fit tiny (e.g. per-shard
        # dryrun) batches instead of rejecting them
        nb_eff = nb if (not interpret or B % nb == 0) else B
        if not interpret and B % nb_eff != 0:
            # e.g. a final partial validation batch: fall back to the XLA
            # encode (identical math, parity-tested) instead of aborting at
            # trace time — the kernel tiles the batch in nb-sample programs
            return encode_latents(
                p, x, input_thetas, rois, lead_num=L,
                theta_encoder_len=theta_encoder_len, rng=rng, train=train,
            )
        enc = angular_encode(input_thetas, theta_encoder_len)
        gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])  # [B,L,128]
        ramp_bs = roi_align_ramp(rois)
        xph, gexp, ramp = prep_encoder_inputs(x, gate1, ramp_bs)
        w = pack_encoder_weights(p, L, x.dtype)
        if train:
            if rng is None:
                raise ValueError("fused encoder: train=True needs an rng for dropout")
            m6, mc20, mc22 = draw_masks(rng, B, L, x.dtype)
            z1k, z2gk = encode_fused_train((L, nb_eff, interpret, tower_ckpt),
                                           w, xph, gexp, ramp, m6, mc20, mc22)
        else:
            z1k, z2gk = encode_fused_eval(w, xph, gexp, ramp, L=L, nb=nb_eff,
                                          interpret=interpret)
        z1, z2_grid = unpack_outputs(z1k, z2gk, L)
        z2 = roi_reverse_1d(z2_grid, rois)
        z1_mean = z1.reshape(B, L, FEAT, FEAT).mean(axis=1)
        z2_mean = z2.reshape(B, L, FEAT, FEAT).mean(axis=1)
        return NefNetLatents(
            z1=z1, z2=z2, z1_mean=z1_mean, z2_mean=z2_mean,
            latent_all=jnp.concatenate([z1_mean, z2_mean], axis=1),
        )

    return fn
