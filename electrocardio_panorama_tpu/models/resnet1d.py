"""Full 1-D ResNet family for ECG classification (reference
codes/network/encoder/resnet_1d.py:97-218).

The Nef-Net encoder uses only conv1+layer1 of resnet34 (models/encoder.py);
this module provides the complete towers for standalone use (the reference's
legacy multi-label ECG classification path):

  * BasicBlock: k7 convs, NO BatchNorm, dropout 0.2 (resnet_1d.py:27-53);
  * Bottleneck: k7/k11/k7 convs WITH BatchNorm, expansion 4 (resnet_1d.py:56-94);
  * stem conv k15 s2 p7 grouped by lead_num; maxpool k3 s2 p1; layers 1-4 with
    stride-2 downsampling; adaptive avg pool; Linear head; sigmoid
    (multi-label, resnet_1d.py:139-158).

Note: the reference's `ResNet.forward` references `self.bn1`, which is never
defined (resnet_1d.py:141) — its full forward path is dead code that would
crash if called. This implementation applies the working stem (conv -> relu),
which is what the Encoder wrapper actually executes (encoder.py:35-37).

Weight init matches the reference: conv weights normal(0, sqrt(2/(k*k*C_out)))
(with the squared-k 1-D quirk), BN weight 1 / bias 0 (resnet_1d.py:114-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import init as inits
from electrocardio_panorama_tpu.ops import batch_norm1d, conv1d, dropout, linear, max_pool1d

LAYER_SPECS = {
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
}
_EXPANSION = {"basic": 1, "bottleneck": 4}


def _bn_entry(params, state, prefix, ch, dtype):
    p, s = inits.bn_init(ch, dtype)
    params[f"{prefix}.weight"] = p["weight"]
    params[f"{prefix}.bias"] = p["bias"]
    for k, v in s.items():
        state[f"{prefix}.{k}"] = v


def init_resnet1d(
    rng,
    arch: str = "resnet34",
    *,
    in_channel: int = 8,
    num_classes: int = 55,
    lead_num: int = 1,
    init_channels: int = 64,
    dtype=jnp.float32,
):
    """Returns (params, state, meta) — meta carries the static layer plan."""
    block, layers = LAYER_SPECS[arch]
    exp = _EXPANSION[block]
    params: dict = {}
    state: dict = {}
    key = iter(jax.random.split(rng, 4 + 4 * sum(layers) * 4))

    stem_ch = init_channels * lead_num
    params["conv1.weight"] = inits.conv_resnet(next(key), stem_ch, in_channel // lead_num, 15, dtype)

    plan = []
    inplanes = stem_ch
    for li, (blocks, mult) in enumerate(zip(layers, (1, 2, 4, 8)), start=1):
        planes = init_channels * mult * lead_num
        stride = 1 if li == 1 else 2
        layer_plan = []
        for bi in range(blocks):
            prefix = f"layer{li}.{bi}"
            s = stride if bi == 0 else 1
            downsample = bi == 0 and (s != 1 or inplanes != planes * exp)
            if block == "basic":
                params[f"{prefix}.conv1.weight"] = inits.conv_resnet(
                    next(key), planes, inplanes // lead_num, 7, dtype)
                params[f"{prefix}.conv2.weight"] = inits.conv_resnet(
                    next(key), planes, planes // lead_num, 7, dtype)
            else:
                params[f"{prefix}.conv1.weight"] = inits.conv_resnet(
                    next(key), planes, inplanes, 7, dtype)
                _bn_entry(params, state, f"{prefix}.bn1", planes, dtype)
                params[f"{prefix}.conv2.weight"] = inits.conv_resnet(
                    next(key), planes, planes, 11, dtype)
                _bn_entry(params, state, f"{prefix}.bn2", planes, dtype)
                params[f"{prefix}.conv3.weight"] = inits.conv_resnet(
                    next(key), planes * 4, planes, 7, dtype)
                _bn_entry(params, state, f"{prefix}.bn3", planes * 4, dtype)
            if downsample:
                params[f"{prefix}.downsample.0.weight"] = inits.conv_resnet(
                    next(key), planes * exp, inplanes // (lead_num if block == "basic" else 1), 1, dtype)
                _bn_entry(params, state, f"{prefix}.downsample.1", planes * exp, dtype)
            layer_plan.append({"prefix": prefix, "stride": s, "downsample": downsample,
                               "inplanes": inplanes, "planes": planes})
            inplanes = planes * exp
        plan.append(layer_plan)

    w, b = inits.linear_default(next(key), num_classes, inplanes, dtype=dtype)
    params["fc.weight"], params["fc.bias"] = w, b
    meta = {"arch": arch, "block": block, "plan": plan, "lead_num": lead_num,
            "out_features": inplanes}
    return params, state, meta


def _bn(p, s, prefix, x, train, updates):
    out, m, v = batch_norm1d(
        x, p[f"{prefix}.weight"], p[f"{prefix}.bias"],
        s[f"{prefix}.running_mean"], s[f"{prefix}.running_var"], train=train,
    )
    if train:
        updates[f"{prefix}.running_mean"] = m
        updates[f"{prefix}.running_var"] = v
        updates[f"{prefix}.num_batches_tracked"] = s[f"{prefix}.num_batches_tracked"] + 1
    return out


def resnet1d_apply(params, state, meta, x, *, train: bool = False, rng=None,
                   features_only: bool = False):
    """x: [B, in_channel, T] -> [B, num_classes] sigmoid multi-label scores
    (or pooled features when features_only)."""
    p, s = params, state
    updates: dict = {}
    block = meta["block"]
    g = meta["lead_num"]
    n_drop = sum(len(lp) for lp in meta["plan"])
    rngs = iter(jax.random.split(rng, n_drop) if rng is not None else [None] * n_drop)

    h = conv1d(x, p["conv1.weight"], stride=2, padding=7, groups=g)
    h = jnp.maximum(h, 0)
    h = max_pool1d(h)

    for layer_plan in meta["plan"]:
        for bp in layer_plan:
            prefix, stride = bp["prefix"], bp["stride"]
            residual = h
            if block == "basic":
                out = conv1d(h, p[f"{prefix}.conv1.weight"], stride=stride, padding=3, groups=g)
                out = jnp.maximum(out, 0)
                out = dropout(out, 0.2, next(rngs), train)
                out = conv1d(out, p[f"{prefix}.conv2.weight"], padding=3, groups=g)
            else:
                out = conv1d(h, p[f"{prefix}.conv1.weight"], padding=3)
                out = jnp.maximum(_bn(p, s, f"{prefix}.bn1", out, train, updates), 0)
                out = conv1d(out, p[f"{prefix}.conv2.weight"], stride=stride, padding=5)
                out = jnp.maximum(_bn(p, s, f"{prefix}.bn2", out, train, updates), 0)
                out = dropout(out, 0.2, next(rngs), train)
                out = conv1d(out, p[f"{prefix}.conv3.weight"], padding=3)
                out = _bn(p, s, f"{prefix}.bn3", out, train, updates)
            if bp["downsample"]:
                residual = conv1d(h, p[f"{prefix}.downsample.0.weight"], stride=stride,
                                  groups=g if block == "basic" else 1)
                residual = _bn(p, s, f"{prefix}.downsample.1", residual, train, updates)
            h = jnp.maximum(out + residual, 0)

    pooled = h.mean(axis=2)  # AdaptiveAvgPool1d(1)
    if features_only:
        return pooled, updates
    logits = linear(pooled, p["fc.weight"], p["fc.bias"])
    return jax.nn.sigmoid(logits), updates
