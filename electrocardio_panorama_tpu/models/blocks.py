"""Functional building blocks shared by the encoder and Nef-Net.

Parameters live in a FLAT dict keyed by torch-style dotted names (e.g.
``w_conv.0.conv1.weight``). A flat dict is a valid JAX pytree, keeps sharding
and optax trivial, and makes PyTorch-checkpoint import an identity key mapping
(training/checkpoint.py).

Block semantics match the reference exactly:
  * resnet BasicBlock (k7, no BN): conv1 -> relu -> dropout(0.2) -> conv2 +
    identity residual -> relu (reference resnet_1d.py:27-53).
  * model-level BasicBlock (k3): same, but the residual passes through a
    grouped 1x1 conv iff channel counts differ (model_nefnet.py:36-60). The
    1x1 conv's parameters exist either way (checkpoint-key compatibility).
  * DoubleConv: (conv k3 -> BN -> relu) x2 (model_nefnet.py:10-27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import init as inits
from electrocardio_panorama_tpu.ops import (
    batch_norm1d,
    conv1d,
    dropout,
    group_batch_norm1d,
)

DROPOUT_RATE = 0.2


# --------------------------------------------------------------------- init
def init_resnet_block(rng, prefix: str, in_ch: int, out_ch: int, groups: int, dtype) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        f"{prefix}.conv1.weight": inits.conv_resnet(k1, out_ch, in_ch // groups, 7, dtype),
        f"{prefix}.conv2.weight": inits.conv_resnet(k2, out_ch, out_ch // groups, 7, dtype),
    }


def init_model_block(rng, prefix: str, in_ch: int, out_ch: int, groups: int, dtype) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    w1, _ = inits.conv_default(k1, out_ch, in_ch // groups, 3, bias=False, dtype=dtype)
    w2, _ = inits.conv_default(k2, out_ch, out_ch // groups, 3, bias=False, dtype=dtype)
    wr, br = inits.conv_default(k3, out_ch, in_ch // groups, 1, bias=True, dtype=dtype)
    return {
        f"{prefix}.conv1.weight": w1,
        f"{prefix}.conv2.weight": w2,
        f"{prefix}.residual_conv.weight": wr,
        f"{prefix}.residual_conv.bias": br,
    }


def init_double_conv(rng, prefix: str, in_ch: int, out_ch: int, dtype) -> tuple[dict, dict]:
    k1, k2 = jax.random.split(rng)
    w1, b1 = inits.conv_default(k1, out_ch, in_ch, 3, bias=True, dtype=dtype)
    w2, b2 = inits.conv_default(k2, out_ch, out_ch, 3, bias=True, dtype=dtype)
    bn1_p, bn1_s = inits.bn_init(out_ch, dtype)
    bn2_p, bn2_s = inits.bn_init(out_ch, dtype)
    params = {
        f"{prefix}.0.weight": w1,
        f"{prefix}.0.bias": b1,
        f"{prefix}.1.weight": bn1_p["weight"],
        f"{prefix}.1.bias": bn1_p["bias"],
        f"{prefix}.3.weight": w2,
        f"{prefix}.3.bias": b2,
        f"{prefix}.4.weight": bn2_p["weight"],
        f"{prefix}.4.bias": bn2_p["bias"],
    }
    state = {}
    for i, s in ((1, bn1_s), (4, bn2_s)):
        for name, val in s.items():
            state[f"{prefix}.{i}.{name}"] = val
    return params, state


# -------------------------------------------------------------------- apply
def resnet_block(p: dict, prefix: str, x, *, groups: int, rng, train: bool):
    out = conv1d(x, p[f"{prefix}.conv1.weight"], padding=3, groups=groups)
    out = jnp.maximum(out, 0)
    out = dropout(out, DROPOUT_RATE, rng, train)
    out = conv1d(out, p[f"{prefix}.conv2.weight"], padding=3, groups=groups)
    return jnp.maximum(out + x, 0)


def model_block(p: dict, prefix: str, x, *, groups: int, rng, train: bool):
    out = conv1d(x, p[f"{prefix}.conv1.weight"], padding=1, groups=groups)
    out = jnp.maximum(out, 0)
    out = dropout(out, DROPOUT_RATE, rng, train)
    out = conv1d(out, p[f"{prefix}.conv2.weight"], padding=1, groups=groups)
    residual = x
    if out.shape[1] != x.shape[1]:
        residual = conv1d(
            x, p[f"{prefix}.residual_conv.weight"], p[f"{prefix}.residual_conv.bias"], groups=groups
        )
    return jnp.maximum(out + residual, 0)


def double_conv(p: dict, s: dict, prefix: str, x, *, train: bool, bn_axis: str | None = None,
                bn_groups: int = 1):
    """Returns (out, state_updates) — state_updates holds new BN running stats.

    ``bn_groups=G`` (train only): x is group-major [G*B, C, L] and each group
    normalizes with its own batch statistics, running stats EMA-chained in
    group order — G sequential decoder calls batched into one (the Nef-Net
    three-decode restructuring; ops.group_batch_norm1d).
    """
    updates = {}

    def bn(h, i):
        if train and bn_groups > 1:
            out, m, v = group_batch_norm1d(
                h, p[f"{prefix}.{i}.weight"], p[f"{prefix}.{i}.bias"],
                s[f"{prefix}.{i}.running_mean"], s[f"{prefix}.{i}.running_var"],
                groups=bn_groups, axis_name=bn_axis,
            )
        else:
            out, m, v = batch_norm1d(
                h, p[f"{prefix}.{i}.weight"], p[f"{prefix}.{i}.bias"],
                s[f"{prefix}.{i}.running_mean"], s[f"{prefix}.{i}.running_var"],
                train=train, axis_name=bn_axis,
            )
        if train:
            updates[f"{prefix}.{i}.running_mean"] = m
            updates[f"{prefix}.{i}.running_var"] = v
            updates[f"{prefix}.{i}.num_batches_tracked"] = (
                s[f"{prefix}.{i}.num_batches_tracked"] + bn_groups
            )
        return out

    out = conv1d(x, p[f"{prefix}.0.weight"], p[f"{prefix}.0.bias"], padding=1)
    out = jnp.maximum(bn(out, 1), 0)
    out = conv1d(out, p[f"{prefix}.3.weight"], p[f"{prefix}.3.bias"], padding=1)
    out = jnp.maximum(bn(out, 4), 0)
    return out, updates
