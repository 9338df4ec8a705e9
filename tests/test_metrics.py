"""Metric parity: PSNR definition, SSIM vs the skimage algorithm, masked JAX PSNR."""

import numpy as np
import jax.numpy as jnp

from electrocardio_panorama_tpu.training.metrics import psnr, psnr_masked, ssim, ssim_1d


def make_rois(rng, batch):
    rois = []
    for _ in range(batch):
        cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
        pts = np.concatenate([[0], cuts, [512]])
        rois.append(np.stack([pts[:-1], pts[1:]], 1))
    return np.stack(rois).astype(np.int64)


def test_psnr_definition(rng):
    pred = rng.uniform(0, 1, (2, 3, 512)).astype(np.float32)
    gt = rng.uniform(0, 1, (2, 3, 512)).astype(np.float32)
    rois = make_rois(rng, 2)
    # manual per-(i,j) computation (mertic.py:7-21)
    vals = []
    for i in range(2):
        end = rois[i, -1, 0]
        for j in range(3):
            rmse = np.sqrt(np.mean((pred[i, j, :end] - gt[i, j, :end]) ** 2))
            vals.append(20 * np.log10(1.0 / rmse))
    assert abs(psnr(pred, gt, rois) - np.mean(vals)) < 1e-9


def test_psnr_identical_is_100():
    x = np.ones((1, 1, 512), np.float32) * 0.5
    assert psnr(x, x.copy(), None) == 100.0


def test_psnr_masked_matches_numpy(rng):
    pred = rng.uniform(0, 1, (4, 3, 512)).astype(np.float32)
    gt = rng.uniform(0, 1, (4, 3, 512)).astype(np.float32)
    rois = make_rois(rng, 4)
    ref = psnr(pred, gt, rois)
    ours = float(psnr_masked(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(rois)))
    assert abs(ref - ours) < 1e-3


def test_ssim_skimage_algorithm(rng):
    """Validate against a hand-rolled direct implementation of skimage's
    documented algorithm (win=7, uniform filter, crop pad, N/(N-1) covariance)."""
    x = rng.uniform(0, 1, 300)
    y = np.clip(x + rng.normal(0, 0.05, 300), 0, 1)
    win, pad = 7, 3
    # direct sliding-window computation
    svals = []
    for c in range(pad, 300 - pad):
        xs = x[c - pad : c + pad + 1]
        ys = y[c - pad : c + pad + 1]
        ux, uy = xs.mean(), ys.mean()
        vx = xs.var(ddof=1)
        vy = ys.var(ddof=1)
        vxy = ((xs - ux) * (ys - uy)).sum() / (win - 1)
        c1, c2 = 0.01**2, 0.03**2
        svals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2)))
    assert abs(ssim_1d(x, y) - np.mean(svals)) < 1e-10


def test_ssim_perfect_match():
    x = np.random.default_rng(0).uniform(0, 1, (1, 1, 256)).astype(np.float64)
    assert abs(ssim(x, x.copy(), None) - 1.0) < 1e-12


def test_ssim_against_torch_reference_values():
    """Cross-check a couple of values against piecewise manual expectations."""
    x = np.linspace(0, 1, 100)
    y = 1 - x
    v = ssim_1d(x, y)
    assert -1.0 <= v < 0.5


def test_ssim_values_device_matches_scipy_oracle(rng):
    """On-device masked SSIM (jitted conv formulation) vs the host scipy
    implementation, per (sample, lead), with per-sample roi ends."""
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.training.metrics import ssim_masked, ssim_values

    B, L, T = 4, 3, 512
    t = np.linspace(0, 20, T)
    pred = (0.3 * np.sin(t)[None, None] + 0.5 + rng.normal(0, 0.05, (B, L, T))).astype(np.float32)
    gt = (0.3 * np.sin(t)[None, None] + 0.5 + rng.normal(0, 0.05, (B, L, T))).astype(np.float32)
    rois = np.zeros((B, 7, 2), np.int32)
    rois[:, -1, 0] = [400, 512, 357, 289]
    dev = np.asarray(ssim_values(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(rois)))
    for i in range(B):
        end = rois[i, -1, 0]
        for j in range(L):
            assert abs(dev[i, j] - ssim_1d(pred[i, j, :end], gt[i, j, :end])) < 5e-5
    # scalar wrapper == reference SSIM() mean contract
    host = ssim(pred, gt, rois)
    assert abs(float(ssim_masked(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(rois))) - host) < 5e-5


def test_psnr_values_per_lead(rng):
    """psnr_values [B, L] matches the host psnr() on each single-lead slice."""
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.training.metrics import psnr, psnr_values

    B, L, T = 3, 4, 512
    pred = rng.uniform(0, 1, (B, L, T)).astype(np.float32)
    gt = rng.uniform(0, 1, (B, L, T)).astype(np.float32)
    rois = np.zeros((B, 7, 2), np.int32)
    rois[:, -1, 0] = [312, 512, 100]
    vals = np.asarray(psnr_values(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(rois)))
    for j in range(L):
        ref = psnr(pred[:, j : j + 1], gt[:, j : j + 1], rois)
        assert abs(vals[:, j].mean() - ref) < 1e-4
