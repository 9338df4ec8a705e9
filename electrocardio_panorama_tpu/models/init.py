"""Parameter initializers with exact PyTorch-default semantics.

Two regimes coexist in the reference:
  * Conv1d layers constructed inside the ResNet get the custom
    normal(0, sqrt(2/n)) init with the reference's n = k*k*out_channels quirk
    (k squared even though convs are 1-D — resnet_1d.py:114-117).
  * Everything constructed at the Model_nefnet level (mlps, w/z convs,
    transposed conv, decoder) keeps torch defaults: kaiming_uniform(a=sqrt(5))
    for weights — i.e. U(+-sqrt(1/fan_in)) — and U(+-1/sqrt(fan_in)) for biases.

fan_in conventions (torch _calculate_fan_in_and_fan_out):
  Conv1d  [out, in/groups, k]        -> fan_in = (in/groups) * k
  ConvT1d [in, out/groups, k]        -> fan_in = (out/groups) * k   (torch quirk)
  Linear  [out, in]                  -> fan_in = in
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(rng, shape, bound, dtype):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def conv_default(rng, out_ch: int, in_ch_per_group: int, k: int, *, bias: bool, dtype=jnp.float32):
    """torch Conv1d default init. Returns (weight, bias|None)."""
    fan_in = in_ch_per_group * k
    kw, kb = jax.random.split(rng)
    w = _uniform(kw, (out_ch, in_ch_per_group, k), math.sqrt(1.0 / fan_in), dtype)
    b = _uniform(kb, (out_ch,), 1.0 / math.sqrt(fan_in), dtype) if bias else None
    return w, b


def conv_transpose_default(rng, in_ch: int, out_ch_per_group: int, k: int, *, groups: int = 1, dtype=jnp.float32):
    """torch ConvTranspose1d default init (fan_in over weight dim 1 — a torch
    quirk: (out/groups)*k, not (in/groups)*k). Returns (weight, bias)."""
    fan_in = out_ch_per_group * k
    kw, kb = jax.random.split(rng)
    w = _uniform(kw, (in_ch, out_ch_per_group, k), math.sqrt(1.0 / fan_in), dtype)
    b = _uniform(kb, (out_ch_per_group * groups,), 1.0 / math.sqrt(fan_in), dtype)
    return w, b


def linear_default(rng, out_f: int, in_f: int, *, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(rng)
    w = _uniform(kw, (out_f, in_f), math.sqrt(1.0 / in_f), dtype)
    b = _uniform(kb, (out_f,), 1.0 / math.sqrt(in_f), dtype) if bias else None
    return w, b


def conv_resnet(rng, out_ch: int, in_ch_per_group: int, k: int, dtype=jnp.float32):
    """Reference ResNet init: normal(0, sqrt(2/(k*k*out_channels)))."""
    n = k * k * out_ch
    return jax.random.normal(rng, (out_ch, in_ch_per_group, k), dtype) * math.sqrt(2.0 / n)


def bn_init(ch: int, dtype=jnp.float32):
    """torch BatchNorm1d init: weight 1, bias 0, running (0, 1)."""
    return {
        "weight": jnp.ones((ch,), dtype),
        "bias": jnp.zeros((ch,), dtype),
    }, {
        "running_mean": jnp.zeros((ch,), dtype),
        "running_var": jnp.ones((ch,), dtype),
        "num_batches_tracked": jnp.zeros((), jnp.int32),
    }
