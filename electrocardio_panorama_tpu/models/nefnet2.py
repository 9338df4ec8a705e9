"""Nef-Net2 — the per-lead shared-encoder variant (reference
codes/network/model_nefnet2.py:63-227).

Differences from Nef-Net (model_nefnet.py): ONE single-lead encoder tower
shared by all leads (vs grouped per-lead towers), extra 1x1-ish
`single_conv_z1`/`single_conv_z2` conv stages, ROI align/reverse applied
per lead, and phase='gen' returns the post-reverse lead MEANS
(model_nefnet2.py:159-160 — despite its comment claiming pre-reverse).

The reference's Python per-lead loop (model_nefnet2.py:126-151) becomes a
lead-into-batch fold: [B, L, 512] -> [B*L, 1, 512] through the shared tower —
one launch, no loop, and the shared weights make this the better-scaling
variant for large lead counts.

NOTE: the reference never registers this model (network/__init__.py:7-12
accepts only 'model_nefnet'), and its own gen_ecg is inconsistent with its
gen-phase output shapes (gen returns [B,128,128] means but gen_ecg expects
[B,C,7,32] grids — dead code that would crash). Here it IS registered as
'model_nefnet2' (a deliberate extension), and gen_ecg takes the documented
pre-reverse grid like Nef-Net's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import init as inits
from electrocardio_panorama_tpu.models.blocks import (
    init_double_conv,
    init_model_block,
    model_block,
)
from electrocardio_panorama_tpu.models.encoder import encoder_apply, init_encoder
from electrocardio_panorama_tpu.models.nefnet import (
    ALIGN_SIZE,
    FEAT_LEN,
    ROI_SEGMENTS,
    SEQ_LEN,
    SPATIAL_SCALE,
    _decode,
    decode_views,
    query_gates,
)
from electrocardio_panorama_tpu.ops import (
    angular_encode,
    conv1d,
    conv_transpose1d_k2s2,
    linear,
    roi_align_1d,
    roi_reverse_1d,
    theta_feature_dim,
)


def init_nefnet2(rng, *, lead_num: int, theta_encoder_len: int = 1, dtype=jnp.float32):
    tdim = theta_feature_dim(theta_encoder_len)
    keys = jax.random.split(rng, 14)
    params: dict = {}
    state: dict = {}

    params.update(init_encoder(keys[0], "W_encoder", 1, 128, dtype))
    w, b = inits.linear_default(keys[1], 128, tdim, dtype=dtype)
    params["mlp1.weight"], params["mlp1.bias"] = w, b
    w, b = inits.linear_default(keys[2], 256, tdim, dtype=dtype)
    params["mlp2.weight"], params["mlp2.bias"] = w, b
    w, b = inits.conv_default(keys[3], 128, 128, 3, bias=True, dtype=dtype)
    params["w_feature_extractor.0.weight"], params["w_feature_extractor.0.bias"] = w, b

    params.update(init_model_block(keys[4], "w_conv.0", 128, 128, 1, dtype))
    params.update(init_model_block(keys[5], "z1_conv.0", 64, 128, 1, dtype))
    params.update(init_model_block(keys[6], "z2_conv1.0", 64, 128, 1, dtype))
    G7 = ROI_SEGMENTS
    params.update(init_model_block(keys[7], "z2_conv2.0", 128 * G7, 128 * G7, G7, dtype))
    w, b = inits.conv_transpose_default(keys[8], 128 * G7, 64, 2, groups=G7, dtype=dtype)
    params["z2_conv2.1.weight"], params["z2_conv2.1.bias"] = w, b
    params.update(init_model_block(keys[9], "z2_conv2.2", 64 * G7, 128 * G7, G7, dtype))

    w, b = inits.conv_default(keys[10], 128, 128, 3, bias=True, dtype=dtype)
    params["single_conv_z1.0.weight"], params["single_conv_z1.0.bias"] = w, b
    w, b = inits.conv_default(keys[11], 128, 128, 3, bias=True, dtype=dtype)
    params["single_conv_z2.0.weight"], params["single_conv_z2.0.bias"] = w, b

    p, s = init_double_conv(keys[12], "decoder.1.double_conv", 256, 128, dtype)
    params.update(p), state.update(s)
    p, s = init_double_conv(keys[13], "decoder.3.double_conv", 128, 64, dtype)
    params.update(p), state.update(s)
    w, b = inits.conv_default(jax.random.fold_in(rng, 99), 1, 64, 3, bias=True, dtype=dtype)
    params["decoder.4.weight"], params["decoder.4.bias"] = w, b
    return params, state


def encode_latents2(p, x, input_thetas, rois, *, lead_num: int,
                    theta_encoder_len: int = 1, rng=None, train: bool = False):
    """[B, L, 512] -> per-lead z1, z2 [B, L, 128, 128] via the shared tower."""
    B, L = x.shape[0], lead_num
    rngs = jax.random.split(rng, 8) if rng is not None else [None] * 8

    xf = x.reshape(B * L, 1, SEQ_LEN)
    w = encoder_apply(p, "W_encoder", xf, lead_num=1, rng=rngs[0], train=train)  # [B*L,128,128]

    enc = angular_encode(input_thetas, theta_encoder_len)        # [B, L, tdim]
    gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])        # [B, L, 128]
    w = w * gate1.reshape(B * L, 128)[:, :, None]
    w = model_block(p, "w_conv.0", w, groups=1, rng=rngs[1], train=train)

    z1 = model_block(p, "z1_conv.0", w[:, :64], groups=1, rng=rngs[2], train=train)
    z1 = conv1d(z1, p["single_conv_z1.0.weight"], p["single_conv_z1.0.bias"], padding=1)
    z2 = model_block(p, "z2_conv1.0", w[:, 64:], groups=1, rng=rngs[3], train=train)

    rois_f = jnp.repeat(rois, L, axis=0)  # same rois for every lead of a sample
    a = roi_align_1d(z2, rois_f, size=ALIGN_SIZE, spatial_scale=SPATIAL_SCALE)
    a = a.reshape(B * L, 128 * ROI_SEGMENTS, ALIGN_SIZE)
    a = model_block(p, "z2_conv2.0", a, groups=ROI_SEGMENTS, rng=rngs[4], train=train)
    a = conv_transpose1d_k2s2(a, p["z2_conv2.1.weight"], p["z2_conv2.1.bias"], groups=ROI_SEGMENTS)
    a = model_block(p, "z2_conv2.2", a, groups=ROI_SEGMENTS, rng=rngs[5], train=train)
    z2_grid = a.reshape(B * L, 128, ROI_SEGMENTS, 2 * ALIGN_SIZE)

    z2 = roi_reverse_1d(z2_grid, rois_f, spatial_scale=SPATIAL_SCALE, out_len=FEAT_LEN)
    z2 = conv1d(z2, p["single_conv_z2.0.weight"], p["single_conv_z2.0.bias"], padding=1)

    return z1.reshape(B, L, 128, FEAT_LEN), z2.reshape(B, L, 128, FEAT_LEN)


def nefnet2_apply(p, s, x, input_thetas, query_theta, rois, rest_theta=None, *,
                  lead_num: int, theta_encoder_len: int = 1, phase: str = "train",
                  rng=None, shuffle_idx=None, bn_axis: str | None = None,
                  rest_decode_fn=None, train_decode_fn=None):
    train = phase == "train"
    if phase not in ("train", "val", "test", "gen"):
        raise KeyError("please type correct phase")

    enc_rng, shuf_rng = (jax.random.split(rng) if rng is not None else (None, None))
    z1_leads, z2_leads = encode_latents2(
        p, x, input_thetas, rois, lead_num=lead_num,
        theta_encoder_len=theta_encoder_len, rng=enc_rng, train=train and phase != "gen",
    )
    z1_mean = z1_leads.mean(axis=1)
    z2_mean = z2_leads.mean(axis=1)
    latent_all = jnp.concatenate([z1_mean, z2_mean], axis=1)

    if phase == "gen":
        # reference returns the post-reverse lead means (model_nefnet2.py:159-160)
        return (z1_mean, z2_mean), s

    if shuffle_idx is None:
        if shuf_rng is None:
            i1 = i2 = 0
        else:
            k1, k2 = jax.random.split(shuf_rng)
            i1 = jax.random.randint(k1, (), 0, lead_num)
            i2 = jax.random.randint(k2, (), 0, lead_num)
    else:
        i1, i2 = shuffle_idx
    shuffle_patient_all = jnp.concatenate([jnp.take(z1_leads, i1, axis=1), z2_mean], axis=1)
    shuffle_lead_all = jnp.concatenate([z1_mean, jnp.take(z2_leads, i2, axis=1)], axis=1)

    gate_q = query_gates(p, query_theta, theta_encoder_len=theta_encoder_len)

    if train:
        # same grouped three-decode restructuring as Nef-Net (shared decoder
        # params; see models/nefnet.py train branch)
        from electrocardio_panorama_tpu.models.nefnet import decoder_apply

        B = x.shape[0]
        gx = gate_q[:, :, None]
        stacked = jnp.concatenate(
            [gx * latent_all, gx * shuffle_patient_all, gx * shuffle_lead_all], axis=0
        )
        if train_decode_fn is not None:
            outs, u = train_decode_fn(p, s, stacked)
        else:
            o, u = decoder_apply(p, s, stacked, train=True, bn_axis=bn_axis, bn_groups=3)
            outs = jax.nn.sigmoid(o / 3.0).reshape(3, B, 1, o.shape[-1])
        new_s = dict(s)
        new_s.update(u)
        return (outs[0], outs[1], outs[2]), new_s

    out, _ = _decode(p, s, latent_all, gate_q, train=False)
    sp, _ = _decode(p, s, shuffle_patient_all, gate_q, train=False)
    sl, _ = _decode(p, s, shuffle_lead_all, gate_q, train=False)
    if rest_decode_fn is not None:
        rest_out = rest_decode_fn(latent_all, rest_theta)
    else:
        rest_out = decode_views(p, s, latent_all, rest_theta, theta_encoder_len=theta_encoder_len)
    return (out, sp, sl, rest_out), s
