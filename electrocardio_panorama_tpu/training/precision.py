"""The mixed-precision training policy, shared by every train-step builder.

One policy, one place: master params/optimizer state/BN running stats stay
f32; forward/backward run in TPU.compute_dtype (bf16 at native MXU rate);
rois stay f32 (ROI index math is f32 internally); model outputs and BN-state
updates are cast back to f32 before the loss/carry. bf16 shares f32's
exponent range, so no loss scaling is needed. Used by
training/solver.py (single-device + GSPMD dp) and parallel/sharding.py
(explicit shard_map dp) — tests pin the two steps equal, and sharing the
policy here is what keeps them from drifting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (ints untouched)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def cast_floats_f32(tree):
    return cast_floats(tree, jnp.float32)
