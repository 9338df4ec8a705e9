"""1-D ROI ops over the 7 contiguous heartbeat segments — static-shape XLA.

The reference implements these with Python per-batch/per-roi loops around
`F.grid_sample` / `F.interpolate` / `F.adaptive_max_pool1d`
(codes/network/utils/roi_pooling_1d.py:5-99). On TPU those become single
batched gather/interpolation launches with indices and lerp weights computed
in-jit from the rois tensor — no host loops, no dynamic shapes.

Bit-parity notes (each verified against torch goldens in tests/test_roi.py):

* `roi_align_1d` reproduces the reference `roi_algin` *as executed*, not as
  intended. The reference feeds `F.grid_sample` a [B, C, L, 1] tensor with the
  ROI coordinates on the width-1 axis (roi_pooling_1d.py:65-67, grid x maps to
  W=1), so the sampled value is the time-axis midpoint 0.5*(x[L/2-1] + x[L/2])
  scaled by the zero-padding bilinear weight (1 - |x|/2) of the ROI ramp. We
  compute exactly that closed form: one add + one outer product.

* `roi_reverse_1d` reproduces `roi_pooling_reverse`: each segment j is linearly
  resampled (torch half-pixel convention) from its fixed S=32 grid back to its
  true length floor(e_j*s) - floor(s_j*s), and segments are concatenated along
  time. Because the 7 ROIs share endpoints and span [0, 512], the lengths
  telescope to exactly L_out = 128. Default implementation: a batched matmul
  against a per-batch one-hot lerp matrix [R*S, T] — on TPU the backward of a
  gather is a scatter-add (serialized, slow), while the matmul form runs both
  directions on the MXU (measured 174 -> 71 us fwd+bwd bf16 at the Nef-Net
  shape). `roi_reverse_1d_gather` keeps the gather+lerp form as the
  element-exact oracle.

* `roi_pool_1d` reproduces `roi_pooling` (adaptive max pool per segment) — the
  reference defines it but never calls it in the Nef-Net forward; provided for
  API completeness, off the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def roi_align_ramp(
    rois: jnp.ndarray,
    *,
    size: int = 16,
    spatial_scale: float = 128 / 512,
    feat_len: int = 128,
) -> jnp.ndarray:
    """The per-segment sampling-weight ramp of `roi_align_1d`'s closed form:
    the zero-padding bilinear weight of the ROI grid on the W=1 axis.

    rois: [B, R, 2] -> [B, R, size] f32. Shared by the XLA align op and the
    fused Pallas encoder (which consumes the ramp precomputed)."""
    # ROI endpoints projected to (-1, 1): r * scale * 2/L - 1  (no truncation).
    c = rois.astype(jnp.float32) * (spatial_scale * 2.0 / feat_len) - 1.0
    frac = jnp.arange(size, dtype=jnp.float32) / (size - 1)  # torch.linspace
    grid = c[..., 0:1] + (c[..., 1:2] - c[..., 0:1]) * frac  # [B, R, size]
    return jnp.clip(1.0 - jnp.abs(grid) * 0.5, 0.0, None)


def roi_align_1d(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    *,
    size: int = 16,
    spatial_scale: float = 128 / 512,
) -> jnp.ndarray:
    """Exact-parity rewrite of reference `roi_algin` (roi_pooling_1d.py:38-69).

    Args:
      x: [B, C, L] features (L even in practice; L=128 in Nef-Net).
      rois: [B, R, 2] integer segment endpoints at the original 512-sample scale.
      size: samples per segment grid.
      spatial_scale: feature_len / original_len.

    Returns: [B, C, R, size].
    """
    B, C, L = x.shape
    # grid_sample height coordinate is fixed at y=0 -> source index (L-1)/2.
    if L % 2 == 0:
        mid = 0.5 * (x[..., L // 2 - 1] + x[..., L // 2])  # [B, C]
    else:
        mid = x[..., (L - 1) // 2]
    w = roi_align_ramp(rois, size=size, spatial_scale=spatial_scale, feat_len=L)
    return (mid[:, :, None, None] * w[:, None, :, :]).astype(x.dtype)


def _segment_layout(rois: jnp.ndarray, spatial_scale: float):
    """Per-batch segment lengths and exclusive-prefix starts after scaling.

    rois: [B, R, 2] -> (lens [B, R] int32, starts [B, R] int32, total [B]).
    Matches the reference's `rois.mul_(scale).long()` truncation (non-negative
    endpoints => floor).
    """
    scaled = jnp.floor(rois.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    lens = scaled[..., 1] - scaled[..., 0]  # [B, R]
    cum = jnp.cumsum(lens, axis=-1)  # inclusive
    starts = cum - lens
    return lens, starts, cum


def _reverse_lerp_layout(rois, *, spatial_scale, out_len, S, R):
    """Per-output-slot source indices and lerp weight shared by both forms.

    Returns (idx0, idx1 [B, T] int32 into the flattened R*S grid axis,
    w [B, T] f32 — the weight of idx1).
    """
    lens, starts, cum = _segment_layout(rois, spatial_scale)  # [B, R]
    t = jnp.arange(out_len, dtype=jnp.int32)  # [T]

    # Segment owning each output slot: count of inclusive-cums <= t.
    seg = jnp.sum(t[None, None, :] >= cum[:, :, None], axis=1)  # [B, T]
    seg = jnp.minimum(seg, R - 1)

    seg_len = jnp.take_along_axis(lens, seg, axis=1)  # [B, T]
    seg_start = jnp.take_along_axis(starts, seg, axis=1)
    local = (t[None, :] - seg_start).astype(jnp.float32)

    # torch F.interpolate(linear, align_corners=False): half-pixel, clamped at 0.
    denom = jnp.maximum(seg_len, 1).astype(jnp.float32)
    src = jnp.maximum((local + 0.5) * (S / denom) - 0.5, 0.0)
    i0 = jnp.minimum(jnp.floor(src).astype(jnp.int32), S - 1)
    i1 = jnp.minimum(i0 + 1, S - 1)
    w = src - i0.astype(jnp.float32)  # [B, T]
    return seg * S + i0, seg * S + i1, w


def roi_reverse_matrix(
    rois: jnp.ndarray,
    *,
    spatial_scale: float = 128 / 512,
    out_len: int = 128,
    segments: int = 7,
    grid: int = 32,
) -> jnp.ndarray:
    """[B, R*S, T] one-hot lerp matrix M with roi_reverse(x) == flat(x) @ M.

    Index math lives only in M's construction ([B, R*S, T] booleans); the
    resample itself becomes an MXU matmul whose transpose IS the backward.
    """
    idx0, idx1, w = _reverse_lerp_layout(
        rois, spatial_scale=spatial_scale, out_len=out_len, S=grid, R=segments
    )
    j = jnp.arange(segments * grid, dtype=jnp.int32)
    return (
        (j[None, :, None] == idx0[:, None, :]) * (1.0 - w[:, None, :])
        + (j[None, :, None] == idx1[:, None, :]) * w[:, None, :]
    )  # [B, R*S, T] f32


def roi_reverse_1d(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    *,
    spatial_scale: float = 128 / 512,
    out_len: int = 128,
) -> jnp.ndarray:
    """Exact-parity rewrite of reference `roi_pooling_reverse` (roi_pooling_1d.py:72-99).

    Args:
      x: [B, C, R, S] per-segment feature grids (S=32 in Nef-Net).
      rois: [B, R, 2] integer endpoints at the original scale. Must form a
        contiguous partition whose scaled lengths sum to `out_len` (guaranteed
        by the dataset: rois[0,0]=0, rois[-1,1]=512).
      out_len: static output length (128 in Nef-Net).

    Returns: [B, C, out_len].

    Matmul form (see module docstring): each output column has exactly two
    non-zero matrix entries, so at HIGHEST precision the sum reproduces the
    gather+lerp values to within one rounding of the same two products.
    """
    B, C, R, S = x.shape
    m = roi_reverse_matrix(
        rois, spatial_scale=spatial_scale, out_len=out_len, segments=R, grid=S
    ).astype(x.dtype)
    return lax.dot_general(
        x.reshape(B, C, R * S), m, (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
    )


def roi_reverse_1d_gather(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    *,
    spatial_scale: float = 128 / 512,
    out_len: int = 128,
) -> jnp.ndarray:
    """Gather+lerp form of `roi_reverse_1d` — element-exact, kept as the
    oracle for the matmul form (and for backends where gathers win)."""
    B, C, R, S = x.shape
    idx0, idx1, w = _reverse_lerp_layout(
        rois, spatial_scale=spatial_scale, out_len=out_len, S=S, R=R
    )
    w = w.astype(x.dtype)
    flat = x.reshape(B, C, R * S)
    g0 = jnp.take_along_axis(flat, idx0[:, None, :], axis=2)  # [B, C, T]
    g1 = jnp.take_along_axis(flat, idx1[:, None, :], axis=2)
    return g0 * (1.0 - w[:, None, :]) + g1 * w[:, None, :]


def roi_pool_1d(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    *,
    size: int = 8,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """Exact-parity rewrite of reference `roi_pooling` (roi_pooling_1d.py:5-35):
    adaptive max pool of each *inclusive* slice x[..., r0 : r1+1] to `size` bins.

    Not on the Nef-Net forward path (the reference defines but never calls it);
    implemented with a bin-membership mask reduction.

    x: [B, C, L]; rois: [B, R, 2]. Returns [B, C, R, size].
    """
    B, C, L = x.shape
    R = rois.shape[1]
    scaled = jnp.floor(rois.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    r0 = scaled[..., 0]  # [B, R]
    # Inclusive slice x[r0 : r1+1], clipped to the array length by slicing
    # semantics (the final segment ends at L, so r1+1 == L+1 gets clipped).
    roi_len = jnp.minimum(scaled[..., 1] + 1, L) - scaled[..., 0]

    k = jnp.arange(size, dtype=jnp.float32)
    # torch adaptive_max_pool1d bin k over a length-n slice: [floor(k*n/size), ceil((k+1)*n/size))
    n = roi_len[..., None].astype(jnp.float32)  # [B, R, 1]
    lo = jnp.floor(k * n / size).astype(jnp.int32) + r0[..., None]  # [B, R, size]
    hi = jnp.ceil((k + 1) * n / size).astype(jnp.int32) + r0[..., None]

    t = jnp.arange(L, dtype=jnp.int32)
    mask = (t >= lo[..., None]) & (t < hi[..., None])  # [B, R, size, L]
    neg = jnp.array(-jnp.inf, dtype=x.dtype)
    vals = jnp.where(mask[:, None], x[:, :, None, None, :], neg)  # [B, C, R, size, L]
    return jnp.max(vals, axis=-1)
