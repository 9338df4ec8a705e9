"""ROI op parity vs the reference implementations, executed via torch as oracle.

The oracle functions below re-run the reference's *documented call pattern*
(grid_sample / interpolate / adaptive_max_pool1d with the exact scaling and
truncation steps of codes/network/utils/roi_pooling_1d.py) without importing
reference code.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from electrocardio_panorama_tpu.ops import (
    roi_align_1d,
    roi_pool_1d,
    roi_reverse_1d,
    roi_reverse_1d_gather,
)


def make_rois(rng, batch, n_seg=7, total=512):
    """Contiguous ROI partitions like the dataset emits (tianchi.py:103-106):
    segments share endpoints, start at 0, end at 512."""
    rois = []
    for _ in range(batch):
        cuts = np.sort(rng.choice(np.arange(4, total - 4, 4), size=n_seg - 1, replace=False))
        pts = np.concatenate([[0], cuts, [total]])
        rois.append(np.stack([pts[:-1], pts[1:]], axis=1))
    return np.stack(rois).astype(np.int64)


def torch_roi_align(inp, rois, size, spatial_scale):
    r = torch.tensor(rois, dtype=torch.float32) * spatial_scale
    length = inp.shape[2]
    r = r * (2 / length) - 1
    gx = torch.stack(
        [
            torch.stack([torch.linspace(r[i, j, 0], r[i, j, 1], steps=size) for j in range(r.shape[1])])
            for i in range(r.shape[0])
        ]
    )
    grid = torch.stack([gx, torch.zeros_like(gx)], dim=3)
    return F.grid_sample(torch.tensor(inp).unsqueeze(-1), grid, align_corners=False)


def torch_roi_reverse(inp, rois, spatial_scale):
    r = (torch.tensor(rois, dtype=torch.float32) * spatial_scale).long()
    out = []
    for i in range(inp.shape[0]):
        segs = []
        for j in range(r.shape[1]):
            roi_len = int(r[i, j, 1] - r[i, j, 0])
            if roi_len != 0:
                im = torch.tensor(inp[i : i + 1, :, j, :])
                segs.append(F.interpolate(im, roi_len, mode="linear", align_corners=False))
        out.append(torch.cat(segs, dim=-1))
    return torch.cat(out, dim=0)


def torch_roi_pool(inp, rois, size, spatial_scale):
    r = (torch.tensor(rois, dtype=torch.float32) * spatial_scale).long()
    out = []
    for i in range(inp.shape[0]):
        segs = []
        for j in range(r.shape[1]):
            im = torch.tensor(inp[i : i + 1])[..., r[i, j, 0] : r[i, j, 1] + 1]
            segs.append(F.adaptive_max_pool1d(im, size))
        out.append(torch.cat(segs))
    return torch.stack(out).transpose(1, 2)


def test_roi_align_parity(rng):
    x = rng.standard_normal((3, 8, 128)).astype(np.float32)
    rois = make_rois(rng, 3)
    ref = torch_roi_align(x, rois, size=16, spatial_scale=128 / 512)
    ours = roi_align_1d(jnp.asarray(x), jnp.asarray(rois), size=16, spatial_scale=128 / 512)
    assert ours.shape == (3, 8, 7, 16)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_roi_reverse_parity(rng):
    x = rng.standard_normal((3, 8, 7, 32)).astype(np.float32)
    rois = make_rois(rng, 3)
    ref = torch_roi_reverse(x, rois, spatial_scale=128 / 512)
    ours = roi_reverse_1d(jnp.asarray(x), jnp.asarray(rois), spatial_scale=128 / 512, out_len=128)
    assert ref.shape[-1] == 128, "telescoping invariant"
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_roi_reverse_zero_length_segment(rng):
    """A degenerate segment (equal endpoints after scaling) must be skipped,
    exactly like the reference's `if roi_len != 0` branch."""
    x = rng.standard_normal((1, 4, 7, 32)).astype(np.float32)
    pts = np.array([0, 40, 40, 160, 260, 330, 470, 512])  # segment 1 empty
    rois = np.stack([pts[:-1], pts[1:]], axis=1)[None].astype(np.int64)
    ref = torch_roi_reverse(x, rois, 128 / 512)
    ours = roi_reverse_1d(jnp.asarray(x), jnp.asarray(rois), spatial_scale=128 / 512, out_len=128)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_roi_reverse_matmul_matches_gather(rng):
    """The default matmul form and the gather oracle must agree in values AND
    gradients (the matmul's transpose is its backward; the gather's backward
    is a scatter-add — same linear map, different execution)."""
    import jax

    x = jnp.asarray(rng.standard_normal((4, 16, 7, 32)).astype(np.float32))
    rois = jnp.asarray(make_rois(rng, 4))
    a = roi_reverse_1d(x, rois)
    b = roi_reverse_1d_gather(x, rois)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ct = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    ga = jax.grad(lambda v: (roi_reverse_1d(v, rois) * ct).sum())(x)
    gb = jax.grad(lambda v: (roi_reverse_1d_gather(v, rois) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_roi_pool_parity(rng):
    x = rng.standard_normal((2, 4, 512)).astype(np.float32)
    rois = make_rois(rng, 2)
    ref = torch_roi_pool(x, rois, size=8, spatial_scale=1.0)
    ours = roi_pool_1d(jnp.asarray(x), jnp.asarray(rois), size=8, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_roi_align_reverse_gradients():
    """Both ops must be differentiable (they sit mid-forward in training)."""
    import jax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 128)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((2, 4, 7, 32)).astype(np.float32))
    rois = jnp.asarray(make_rois(rng, 2))

    g1 = jax.grad(lambda a: roi_align_1d(a, rois).sum())(x)
    g2 = jax.grad(lambda a: roi_reverse_1d(a, rois).sum())(z)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    assert np.abs(np.asarray(g2)).sum() > 0
