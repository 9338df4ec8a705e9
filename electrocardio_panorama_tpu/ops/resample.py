"""Linear resampling ops with PyTorch half-pixel (align_corners=False) parity.

The reference decoder upsamples with `nn.Upsample(scale_factor=2, mode='linear',
align_corners=False)` (codes/network/model_nefnet.py:102,104) and the ROI
reverse op uses `F.interpolate(..., mode='linear', align_corners=False)`
(codes/network/utils/roi_pooling_1d.py:94). Both use half-pixel source
coordinates  src = (i + 0.5) * L_in / L_out - 0.5,  clamped to src >= 0, with
the upper neighbor clamped to L_in - 1.

`upsample_linear_x2` exploits the fixed x2 pattern: even outputs are
0.25*x[k-1] + 0.75*x[k] and odd outputs 0.75*x[k] + 0.25*x[k+1] (edges
clamped), implemented with shifts + an interleave — pure VPU work that XLA
fuses into the surrounding convs, no gather needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_linear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """[..., L] -> [..., 2L], torch Upsample(scale=2, linear, align_corners=False)."""
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)   # x[k-1], edge-clamped
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)  # x[k+1], edge-clamped
    even = 0.25 * left + 0.75 * x
    odd = 0.75 * x + 0.25 * right
    out = jnp.stack([even, odd], axis=-1)  # [..., L, 2]
    return out.reshape(*x.shape[:-1], 2 * x.shape[-1])


def interp_linear_coords(out_idx: jnp.ndarray, in_len, out_len) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather indices + lerp weight for torch F.interpolate(linear, align_corners=False).

    out_idx, out_len may be traced arrays (used by the ROI reverse op where the
    per-segment output length is data-dependent). Returns (i0, i1, w) with
    out = (1-w)*x[i0] + w*x[i1].
    """
    src = (out_idx.astype(jnp.float32) + 0.5) * (in_len / out_len) - 0.5
    src = jnp.maximum(src, 0.0)  # torch clamps the source coordinate at 0
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_len - 1)
    i1 = jnp.minimum(i0 + 1, in_len - 1)
    w = src - i0.astype(jnp.float32)
    return i0, i1, w
