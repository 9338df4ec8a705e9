"""1-D convolution primitives with PyTorch-parity semantics, built on XLA.

These wrap `lax.conv_general_dilated` in NCH layout with torch weight layouts
so parameters imported from reference checkpoints apply directly:

  * conv1d:            weight [O, I/groups, K]   (== lax 'OIH')
  * conv_transpose1d:  weight [I, O/groups, K]   (torch ConvTranspose1d layout)
  * max_pool1d:        reduce_window with -inf padding (torch MaxPool1d parity)

The grouped convs are the encoder's per-lead towers (reference
codes/network/encoder/resnet_1d.py:102-106 uses `groups=lead_num`); XLA maps
`feature_group_count` onto block-diagonal MXU matmuls, which is the TPU-native
equivalent of cuDNN grouped conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NCH", "OIH", "NCH")


def _precision(x: jnp.ndarray):
    """float32 work runs the MXU at full (f32-accurate) precision; bfloat16
    inputs use native bf16 MXU passes. Keeps torch-parity in f32 mode while
    letting the bf16 throughput mode stay fast."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d parity. x: [B, C_in, L], weight: [C_out, C_in/groups, K]."""
    dn = lax.conv_dimension_numbers(x.shape, weight.shape, _DIMNUMS)
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=_precision(x),
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv1d_mm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    padding: int,
    groups: int = 1,
) -> jnp.ndarray:
    """Stride-1 'same'-pad grouped conv1d as ONE batched matmul over stacked
    taps (im2col on the kernel axis only): dot_general with batch dim =
    groups, contraction = (C_in/g x K) over K time-shifted copies. Shifts
    ride the T axis of [B, C, T], so sample boundaries need no masks (torch
    zero padding == the jnp.pad zeros).

    MEASUREMENT OUTCOME (tools/bench_conv_forms.py, v5e): this form ties
    lax.conv_general_dilated on every encoder conv shape — an apparent 15x
    conv inefficiency in an earlier profile was tunnel-RTT contamination of
    short timing chains, not XLA. Kept as the measured-equal alternative and
    the record of that finding; the model keeps conv1d.

    torch.nn.functional.conv1d parity for stride=1, padding=K//2.
    x: [B, C_in, L], weight: [C_out, C_in/groups, K].
    """
    B, C_in, L = x.shape
    C_out, cpg, K = weight.shape
    assert K == 2 * padding + 1, "conv1d_mm is specialized for same-pad stride-1"
    g = groups
    xs = [
        jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))[:, :, k : k + L]
        for k in range(K)
    ]
    xk = jnp.stack(xs, axis=0).reshape(K, B, g, cpg, L)
    w4 = weight.reshape(g, C_out // g, cpg, K)
    out = jnp.einsum("kbgcl,gock->bgol", xk, w4, precision=_precision(x))
    out = out.reshape(B, C_out, L)
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv_transpose1d_k2s2(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    groups: int = 1,
) -> jnp.ndarray:
    """ConvTranspose1d(kernel=2, stride=2) parity — the z2 morphology upsampler
    (reference codes/network/model_nefnet.py:96-97).

    With K == stride == 2 the transposed conv has no overlap: each input step t
    emits exactly outputs (2t, 2t+1) via two independent per-group matmuls —
    a clean MXU mapping (einsum + interleave) with no scatter.

    x: [B, C_in, L]; weight: [C_in, C_out/groups, 2] (torch layout).
    Returns [B, C_out, 2L].
    """
    B, C_in, L = x.shape
    C_out_pg, K = weight.shape[1], weight.shape[2]
    assert K == 2, "specialized for kernel_size=2, stride=2"
    assert C_in % groups == 0 and weight.shape[0] == C_in
    C_in_pg = C_in // groups
    C_out = C_out_pg * groups

    xg = x.reshape(B, groups, C_in_pg, L)
    wg = weight.reshape(groups, C_in_pg, C_out_pg, K)
    # out[b, g, o, k, l] = sum_i x[b, g, i, l] * w[g, i, o, k]
    out = jnp.einsum("bgil,giok->bgokl", xg, wg, precision=_precision(x))
    # interleave the k axis into time: out[..., 2l + k]
    out = out.transpose(0, 1, 2, 4, 3).reshape(B, C_out, 2 * L)
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def max_pool1d(x: jnp.ndarray, *, kernel: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """torch MaxPool1d parity: pads with -inf (padding never wins the max)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 1, kernel),
        window_strides=(1, 1, stride),
        padding=((0, 0), (0, 0), (padding, padding)),
    )


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch.nn.Linear parity. weight: [out, in] (torch layout)."""
    out = jnp.einsum("...i,oi->...o", x, weight, precision=_precision(x))
    if bias is not None:
        out = out + bias
    return out


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array | None, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch parity: scale by 1/(1-p) at train time)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def batch_norm1d(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    offset: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """torch BatchNorm1d parity on [B, C, L].

    Train: normalize with biased batch statistics over (B, L); update running
    stats with the unbiased variance (torch semantics). Eval: running stats.
    Returns (out, new_running_mean, new_running_var).

    Under data parallelism (`axis_name` set inside shard_map/pmap), batch
    statistics are psum-synced across shards so sharded training normalizes by
    the FULL-batch statistics — the sync-BN policy for dp training
    (SURVEY.md section 7, hard part 6).
    """
    if train:
        n = x.shape[0] * x.shape[2]
        if axis_name is not None:
            mean = lax.pmean(jnp.mean(x, axis=(0, 2)), axis_name)
            sq = lax.pmean(jnp.mean(jnp.square(x), axis=(0, 2)), axis_name)
            var = sq - jnp.square(mean)
            n = n * lax.psum(1, axis_name)
        else:
            mean = jnp.mean(x, axis=(0, 2))
            var = jnp.var(x, axis=(0, 2))  # biased, used for normalization
        unbiased = var * n / max(n - 1, 1)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = lax.rsqrt(var + eps)
    out = (x - mean[None, :, None]) * (inv * scale)[None, :, None] + offset[None, :, None]
    return out, new_mean, new_var


def group_batch_norm1d(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    offset: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    groups: int,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """G independent train-mode BatchNorm1d calls batched into one op.

    x is group-major [G*B, C, L]; group g normalizes with ITS OWN biased batch
    statistics over that group's (B, L) — bitwise the same normalization as G
    sequential batch_norm1d calls — and the running stats apply the G
    sequential EMA updates in closed form:

        r_G = (1-m)^G r_0 + m * sum_g (1-m)^(G-1-g) * stat_g

    This is what lets Nef-Net's three train-mode decodes (pred,
    shuffle_patient, shuffle_lead — reference model_nefnet.py:167-176, whose
    BN update ORDER is part of the training semantics) run as ONE batched
    decoder pass instead of three sequential launches. Under data parallelism
    (`axis_name`) per-group statistics pmean across shards like batch_norm1d.
    Returns (out, new_running_mean, new_running_var).
    """
    gb, c, L = x.shape
    b = gb // groups
    xg = x.reshape(groups, b, c, L)
    n = b * L
    if axis_name is not None:
        mean = lax.pmean(jnp.mean(xg, axis=(1, 3)), axis_name)          # [G, C]
        sq = lax.pmean(jnp.mean(jnp.square(xg), axis=(1, 3)), axis_name)
        var = sq - jnp.square(mean)
        n = n * lax.psum(1, axis_name)
    else:
        mean = jnp.mean(xg, axis=(1, 3))
        var = jnp.var(xg, axis=(1, 3))  # biased, used for normalization
    unbiased = var * n / max(n - 1, 1)
    keep = (1 - momentum) ** groups
    w = momentum * (1 - momentum) ** jnp.arange(groups - 1, -1, -1, dtype=var.dtype)
    new_mean = keep * running_mean + jnp.tensordot(w, mean, axes=1)
    new_var = keep * running_var + jnp.tensordot(w, unbiased, axes=1)
    inv = lax.rsqrt(var + eps)
    out = (xg - mean[:, None, :, None]) * (inv * scale[None])[:, None, :, None] \
        + offset[None, None, :, None]
    return out.reshape(gb, c, L), new_mean, new_var
