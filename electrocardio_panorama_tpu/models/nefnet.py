"""Nef-Net — TPU-native functional implementation.

Reproduces the reference `Model_nefnet` (codes/network/model_nefnet.py:63-218)
as pure functions over a flat param dict + BN-state dict, restructured around
the two halves that matter on TPU:

  encode_latents : few-view ECG -> (z1 per lead, z2 per lead, latent_all)
                   — one pass of grouped convs + ROI ops.
  decode_views   : latent x N query viewpoints -> N waveforms in ONE launch.
                   The reference decodes views in a Python loop
                   (model_nefnet.py:185-190); here the view axis folds into the
                   batch axis of the decoder convs, which is the north-star
                   panorama throughput path.

Parity notes:
  * Channel layout is lead-major ([B, L*128, T] with lead blocks contiguous),
    matching torch grouped-conv channel ordering, so `torch.chunk(w, L, dim=1)`
    gymnastics become reshapes to [B, L, 128, T].
  * The z2 reshape to [B, 128L*7, 16] before z2_conv2 interleaves channel and
    segment axes exactly like torch `.view` (row-major, model_nefnet.py:137),
    including the group-boundary mixing that 7 not dividing 128 causes.
  * Standin-Learning shuffles draw ONE lead index per forward (shared across
    the batch — `random.randint`, model_nefnet.py:154-157). Randomness is
    threaded in from outside (`shuffle_idx`) to keep the model pure.
  * In train mode the three decodes (pred, shuffle_patient, shuffle_lead) run
    sequentially so decoder BatchNorm batch-statistics and running-stat updates
    match the reference's three separate calls (model_nefnet.py:167-176).
    In eval mode BN uses running stats, so all decodes batch into one launch.
  * The dead `w_feature_extractor` params are created for checkpoint-key
    compatibility (model_nefnet.py:79-83) and never applied.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import init as inits
from electrocardio_panorama_tpu.models.blocks import (
    double_conv,
    init_double_conv,
    init_model_block,
    model_block,
)
from electrocardio_panorama_tpu.models.encoder import encoder_apply, init_encoder
from electrocardio_panorama_tpu.ops import (
    angular_encode,
    conv1d,
    conv_transpose1d_k2s2,
    linear,
    roi_align_1d,
    roi_reverse_1d,
    theta_feature_dim,
    upsample_linear_x2,
)

ROI_SEGMENTS = 7
ALIGN_SIZE = 16
SPATIAL_SCALE = 128 / 512
SEQ_LEN = 512
FEAT_LEN = 128


class NefNetLatents(NamedTuple):
    """Per-lead latents + pooled conditioning latent."""

    z1: jnp.ndarray          # [B, 128*L, 128]   electrocardio-field (patient) half
    z2: jnp.ndarray          # [B, 128*L, 128]   morphology half (post roi-reverse)
    z1_mean: jnp.ndarray     # [B, 128, 128]
    z2_mean: jnp.ndarray     # [B, 128, 128]
    latent_all: jnp.ndarray  # [B, 256, 128]


# ----------------------------------------------------------------------- init
def init_nefnet(rng, *, lead_num: int, theta_encoder_len: int = 1, dtype=jnp.float32):
    """Returns (params, state): flat dicts keyed by torch-style names."""
    L = lead_num
    tdim = theta_feature_dim(theta_encoder_len)
    keys = jax.random.split(rng, 12)
    params: dict = {}
    state: dict = {}

    params.update(init_encoder(keys[0], "W_encoder", L, 128, dtype))

    w, b = inits.linear_default(keys[1], 128, tdim, dtype=dtype)
    params["mlp1.weight"], params["mlp1.bias"] = w, b
    w, b = inits.linear_default(keys[2], 256, tdim, dtype=dtype)
    params["mlp2.weight"], params["mlp2.bias"] = w, b

    # dead module, kept for checkpoint-key compatibility (model_nefnet.py:79-83)
    w, b = inits.conv_default(keys[3], 128, 128, 3, bias=True, dtype=dtype)
    params["w_feature_extractor.0.weight"], params["w_feature_extractor.0.bias"] = w, b

    params.update(init_model_block(keys[4], "w_conv.0", 128 * L, 128 * L, L, dtype))
    params.update(init_model_block(keys[5], "z1_conv.0", 64 * L, 128 * L, L, dtype))
    params.update(init_model_block(keys[6], "z2_conv1.0", 64 * L, 128 * L, L, dtype))

    G7 = ROI_SEGMENTS * L
    params.update(init_model_block(keys[7], "z2_conv2.0", 128 * G7, 128 * G7, G7, dtype))
    w, b = inits.conv_transpose_default(keys[8], 128 * G7, 64, 2, groups=G7, dtype=dtype)
    params["z2_conv2.1.weight"], params["z2_conv2.1.bias"] = w, b
    params.update(init_model_block(keys[9], "z2_conv2.2", 64 * G7, 128 * G7, G7, dtype))

    p, s = init_double_conv(keys[10], "decoder.1.double_conv", 256, 128, dtype)
    params.update(p), state.update(s)
    p, s = init_double_conv(keys[11], "decoder.3.double_conv", 128, 64, dtype)
    params.update(p), state.update(s)
    w, b = inits.conv_default(jax.random.fold_in(rng, 99), 1, 64, 3, bias=True, dtype=dtype)
    params["decoder.4.weight"], params["decoder.4.bias"] = w, b
    return params, state


# -------------------------------------------------------------------- decoder
def decoder_apply(p: dict, s: dict, x, *, train: bool, bn_axis: str | None = None,
                  bn_groups: int = 1):
    """Upsample->DoubleConv(256,128)->Upsample->DoubleConv(128,64)->Conv(64,1).

    x: [N, 256, 128] -> [N, 1, 512] logits (pre-sigmoid). Returns (out, updates).
    `bn_axis` enables psum-synced BN batch stats under data parallelism.
    `bn_groups=G` (train): x is group-major [G*B, ...] and BN statistics are
    per-group with EMA-chained running stats — G sequential decoder calls in
    one batched pass (see blocks.double_conv).
    """
    updates = {}
    h = upsample_linear_x2(x)
    h, u = double_conv(p, s, "decoder.1.double_conv", h, train=train, bn_axis=bn_axis,
                       bn_groups=bn_groups)
    updates.update(u)
    h = upsample_linear_x2(h)
    h, u = double_conv(p, s, "decoder.3.double_conv", h, train=train, bn_axis=bn_axis,
                       bn_groups=bn_groups)
    updates.update(u)
    h = conv1d(h, p["decoder.4.weight"], p["decoder.4.bias"], padding=1)
    return h, updates


def _decode(p, s, latent, gate, *, train, bn_axis=None):
    """sigmoid(decoder(gate [N,256] x latent [N,256,128]) / 3)  (model_nefnet.py:166-168)."""
    out, updates = decoder_apply(p, s, gate[:, :, None] * latent, train=train, bn_axis=bn_axis)
    return jax.nn.sigmoid(out / 3.0), updates


def query_gates(p: dict, thetas, *, theta_encoder_len: int = 1):
    """Angular-encode + mlp2 gate for query viewpoints. [..., 2] -> [..., 256]."""
    enc = angular_encode(thetas, theta_encoder_len)
    return linear(enc, p["mlp2.weight"], p["mlp2.bias"])


def decode_views(p: dict, s: dict, latent_all, view_thetas, *, theta_encoder_len: int = 1):
    """Batched multi-view decode (eval-mode BN): the panorama hot path.

    latent_all: [B, 256, 128]; view_thetas: [B, V, 2] -> [B, V, 512].
    All V views decode in one launch (vs the reference's per-view loop,
    model_nefnet.py:185-190): gates are one matmul, the decoder convs see a
    [B*V, 256, 128] batch.
    """
    B, V = view_thetas.shape[0], view_thetas.shape[1]
    gates = query_gates(p, view_thetas, theta_encoder_len=theta_encoder_len)  # [B, V, 256]
    x = gates[..., None] * latent_all[:, None]  # [B, V, 256, 128]
    out, _ = decoder_apply(p, s, x.reshape(B * V, 256, FEAT_LEN), train=False)
    return jax.nn.sigmoid(out / 3.0).reshape(B, V, SEQ_LEN)


# -------------------------------------------------------------------- encoder
def encode_latents(
    p: dict,
    x,
    input_thetas,
    rois,
    *,
    lead_num: int,
    theta_encoder_len: int = 1,
    rng=None,
    train: bool = False,
    stop_before_reverse: bool = False,
):
    """Few-view encode: x [B, L, 512], input_thetas [B, L, 2], rois [B, 7, 2].

    Returns NefNetLatents, or (z1, z2_pre_reverse) when `stop_before_reverse`
    (the reference's phase='gen' early return, model_nefnet.py:140-141, where
    z2 is [B, 128L, 7, 32]).
    """
    L = lead_num
    B = x.shape[0]
    rngs = jax.random.split(rng, 8) if rng is not None else [None] * 8

    w = encoder_apply(p, "W_encoder", x, lead_num=L, rng=rngs[0], train=train)  # [B, 128L, 128]

    enc = angular_encode(input_thetas, theta_encoder_len)  # [B, L, tdim]
    gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])  # [B, L, 128]
    w = (w.reshape(B, L, 128, FEAT_LEN) * gate1[..., None]).reshape(B, 128 * L, FEAT_LEN)
    w = model_block(p, "w_conv.0", w, groups=L, rng=rngs[1], train=train)

    # per-lead split into z1 (first 64 ch) / z2 (last 64 ch)  (model_nefnet.py:127-131)
    w4 = w.reshape(B, L, 128, FEAT_LEN)
    z1 = w4[:, :, :64].reshape(B, 64 * L, FEAT_LEN)
    z2 = w4[:, :, 64:].reshape(B, 64 * L, FEAT_LEN)

    z1 = model_block(p, "z1_conv.0", z1, groups=L, rng=rngs[2], train=train)   # [B, 128L, 128]
    z2 = model_block(p, "z2_conv1.0", z2, groups=L, rng=rngs[3], train=train)  # [B, 128L, 128]

    a = roi_align_1d(z2, rois, size=ALIGN_SIZE, spatial_scale=SPATIAL_SCALE)  # [B, 128L, 7, 16]
    a = a.reshape(B, 128 * L * ROI_SEGMENTS, ALIGN_SIZE)  # torch .view row-major
    G7 = ROI_SEGMENTS * L
    a = model_block(p, "z2_conv2.0", a, groups=G7, rng=rngs[4], train=train)
    a = conv_transpose1d_k2s2(a, p["z2_conv2.1.weight"], p["z2_conv2.1.bias"], groups=G7)
    a = model_block(p, "z2_conv2.2", a, groups=G7, rng=rngs[5], train=train)  # [B, 128L*7, 32]
    z2_grid = a.reshape(B, 128 * L, ROI_SEGMENTS, 2 * ALIGN_SIZE)

    if stop_before_reverse:
        return z1, z2_grid

    z2 = roi_reverse_1d(z2_grid, rois, spatial_scale=SPATIAL_SCALE, out_len=FEAT_LEN)

    z1_mean = z1.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
    z2_mean = z2.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
    latent_all = jnp.concatenate([z1_mean, z2_mean], axis=1)  # [B, 256, 128]
    return NefNetLatents(z1, z2, z1_mean, z2_mean, latent_all)


# -------------------------------------------------------------------- forward
def nefnet_apply(
    p: dict,
    s: dict,
    x,
    input_thetas,
    query_theta,
    rois,
    rest_theta=None,
    *,
    lead_num: int,
    theta_encoder_len: int = 1,
    phase: str = "train",
    rng=None,
    shuffle_idx=None,
    bn_axis: str | None = None,
    rest_decode_fn=None,
    train_decode_fn=None,
    encode_fn=None,
):
    """Full forward, reference-parity (model_nefnet.py:109-194).

    phase 'train': returns ((out, shuffle_p, shuffle_l), new_state);
                   dropout + BN batch-stats active; `rng` required;
                   `shuffle_idx` = (z1_lead, z2_lead) ints.
    phase 'val'/'test': returns ((out, shuffle_p, shuffle_l, rest_out), state).
    phase 'gen': returns ((z1, z2_pre_reverse), state).

    `rest_decode_fn(latent_all, rest_theta) -> [B, R, 512]`, when given,
    replaces the XLA `decode_views` for the rest-view sweep — the Solver
    injects the fused Pallas decoder here (training/solver.py).

    `train_decode_fn(p, s, stacked) -> (outs [3, B, 1, 512] post-sigmoid,
    state_updates)`, when given, replaces the XLA grouped three-decode in the
    train branch — the Solver injects the fused Pallas TRAINING decoder
    (forward + custom VJP, ops/pallas/decoder_train.py) here. `stacked` is
    the group-major [3B, 256, 128] gated latent.

    `encode_fn(p, x, input_thetas, rois, rng=..., train=...) -> NefNetLatents`,
    when given, replaces `encode_latents` — the Solver injects the fused
    Pallas ENCODER (forward + custom VJP, ops/pallas/encoder_fused.py) here.
    The gen phase keeps the XLA encode (it needs the pre-reverse early return).
    """
    train = phase == "train"
    if phase == "gen":
        z1, z2_grid = encode_latents(
            p, x, input_thetas, rois, lead_num=lead_num,
            theta_encoder_len=theta_encoder_len, rng=rng, train=False,
            stop_before_reverse=True,
        )
        return (z1, z2_grid), s
    if phase not in ("train", "val", "test"):
        raise KeyError("please type correct phase")

    enc_rng, shuf_rng = (jax.random.split(rng) if rng is not None else (None, None))
    if encode_fn is not None:
        lat = encode_fn(p, x, input_thetas, rois, rng=enc_rng, train=train)
    else:
        lat = encode_latents(
            p, x, input_thetas, rois, lead_num=lead_num,
            theta_encoder_len=theta_encoder_len, rng=enc_rng, train=train,
        )
    B = x.shape[0]
    L = lead_num

    if shuffle_idx is None:
        if shuf_rng is None:
            i1 = i2 = 0
        else:
            k1, k2 = jax.random.split(shuf_rng)
            i1 = jax.random.randint(k1, (), 0, L)
            i2 = jax.random.randint(k2, (), 0, L)
    else:
        i1, i2 = shuffle_idx

    z1_leads = lat.z1.reshape(B, L, 128, FEAT_LEN)
    z2_leads = lat.z2.reshape(B, L, 128, FEAT_LEN)
    shuffle_z1 = jnp.take(z1_leads, i1, axis=1)
    shuffle_z2 = jnp.take(z2_leads, i2, axis=1)
    shuffle_patient_all = jnp.concatenate([shuffle_z1, lat.z2_mean], axis=1)
    shuffle_lead_all = jnp.concatenate([lat.z1_mean, shuffle_z2], axis=1)

    gate_q = query_gates(p, query_theta, theta_encoder_len=theta_encoder_len)  # [B, 256]

    if train:
        # The reference decodes pred / shuffle_patient / shuffle_lead as three
        # separate calls whose BN batch stats and running-stat update ORDER
        # are part of the training semantics (model_nefnet.py:167-176). Here
        # the three decodes batch into ONE pass with per-group BN statistics
        # and closed-form EMA chaining (ops.group_batch_norm1d) — numerically
        # the sequential computation, one launch instead of three (pinned by
        # tests/test_model_parity.py::test_grouped_decode_matches_sequential).
        gx = gate_q[:, :, None]
        stacked = jnp.concatenate(
            [gx * lat.latent_all, gx * shuffle_patient_all, gx * shuffle_lead_all],
            axis=0,
        )  # [3B, 256, 128] group-major
        if train_decode_fn is not None:
            outs, u = train_decode_fn(p, s, stacked)
        else:
            o, u = decoder_apply(p, s, stacked, train=True, bn_axis=bn_axis, bn_groups=3)
            outs = jax.nn.sigmoid(o / 3.0).reshape(3, B, 1, SEQ_LEN)
        new_s = dict(s)
        new_s.update(u)
        return (outs[0], outs[1], outs[2]), new_s

    # eval: BN running stats -> all decodes batch into one launch.
    stacked = jnp.stack([lat.latent_all, shuffle_patient_all, shuffle_lead_all], axis=1)
    outs3, _ = decoder_apply(
        p, s, (gate_q[:, None, :, None] * stacked).reshape(B * 3, 256, FEAT_LEN), train=False
    )
    outs3 = jax.nn.sigmoid(outs3 / 3.0).reshape(B, 3, 1, SEQ_LEN)
    out, shuffle_p, shuffle_l = outs3[:, 0], outs3[:, 1], outs3[:, 2]

    if rest_decode_fn is not None:
        rest_out = rest_decode_fn(lat.latent_all, rest_theta)  # [B, R, 512]
    else:
        rest_out = decode_views(
            p, s, lat.latent_all, rest_theta, theta_encoder_len=theta_encoder_len
        )  # [B, R, 512]
    return (out, shuffle_p, shuffle_l, rest_out), s


def gen_ecg(p: dict, s: dict, z1, z2_grid, query_thetas, rois, *, lead_num: int, theta_encoder_len: int = 1):
    """Synthesis-from-scratch decode (reference gen_ecg, model_nefnet.py:196-218).

    z1: [B, 128L, 128]; z2_grid: [B, 128L, 7, 32] (pre-reverse latents from
    phase='gen'); query_thetas: [B, V, 2]. Always eval-mode. Returns [B, V, 512].
    """
    B = z1.shape[0]
    L = lead_num
    z2 = roi_reverse_1d(z2_grid, rois, spatial_scale=SPATIAL_SCALE, out_len=FEAT_LEN)
    z1_mean = z1.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
    z2_mean = z2.reshape(B, L, 128, FEAT_LEN).mean(axis=1)
    latent_all = jnp.concatenate([z1_mean, z2_mean], axis=1)
    return decode_views(p, s, latent_all, query_thetas, theta_encoder_len=theta_encoder_len)
