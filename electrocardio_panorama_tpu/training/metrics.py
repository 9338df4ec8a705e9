"""Evaluation metrics: PSNR and SSIM with reference parity.

PSNR (reference utils/mertic.py:7-21): per-(sample, lead) RMSE over the
real-signal region [0 : rois[i, -1, 0]], 20*log10(1/rmse), 100 if rmse == 0,
averaged over all (sample, lead) pairs.

SSIM (utils/mertic.py:24-32): skimage.metrics.structural_similarity on the same
region with data_range=1.0 — i.e. 1-D SSIM, win_size=7, uniform filter,
K1=0.01/K2=0.03, borders cropped by (win-1)//2, sample covariance normalization
N/(N-1). skimage is unavailable here, so `ssim_1d` implements that exact
algorithm via scipy.ndimage.uniform_filter (boundary mode is irrelevant after
the crop).

Masked JAX variants (`psnr_masked`) run on-device inside the eval step so the
metric does not force a host round-trip per batch; the numpy versions are the
reference-parity oracles.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter

import jax
import jax.numpy as jnp

_WIN = 7
_K1, _K2 = 0.01, 0.03


def psnr(pred: np.ndarray, gt: np.ndarray, rois: np.ndarray | None = None) -> float:
    """pred/gt: [B, L, T]; rois: [B, 7, 2] or None (full length)."""
    vals = []
    for i in range(pred.shape[0]):
        end = int(rois[i, -1, 0]) if rois is not None else pred.shape[2]
        for j in range(pred.shape[1]):
            diff = pred[i, j, :end] - gt[i, j, :end]
            rmse = float(np.sqrt(np.mean(diff**2)))
            vals.append(100.0 if rmse == 0 else 20 * np.log10(1.0 / rmse))
    return float(np.mean(vals))


def ssim_1d(x: np.ndarray, y: np.ndarray, data_range: float = 1.0) -> float:
    """skimage structural_similarity parity for 1-D float inputs."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    npts = _WIN
    cov_norm = npts / (npts - 1)
    ux = uniform_filter(x, _WIN)
    uy = uniform_filter(y, _WIN)
    uxx = uniform_filter(x * x, _WIN)
    uyy = uniform_filter(y * y, _WIN)
    uxy = uniform_filter(x * y, _WIN)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    pad = (_WIN - 1) // 2
    return float(s[pad:-pad].mean())


def ssim(pred: np.ndarray, gt: np.ndarray, rois: np.ndarray | None = None) -> float:
    """Reference SSIM wrapper (mertic.py:24-32): mean over (sample, lead)."""
    vals = []
    for i in range(pred.shape[0]):
        end = int(rois[i, -1, 0]) if rois is not None else pred.shape[2]
        for j in range(pred.shape[1]):
            vals.append(ssim_1d(pred[i, j, :end], gt[i, j, :end], data_range=1.0))
    return float(np.mean(vals))


# --------------------------------------------------------------- jax variants
def psnr_values(pred: jnp.ndarray, gt: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
    """On-device per-(sample, lead) PSNR over [0 : rois[:, -1, 0]].

    pred/gt: [B, L, T]; returns [B, L]. rmse==0 maps to 100 like the
    reference (mertic.py:16-17). Pass rois full of large sentinels for the
    whole-sequence branch (the end is clamped to T).
    """
    B, L, T = pred.shape
    end = jnp.minimum(rois[:, -1, 0], T)  # [B]; clamp supports full-length sentinels
    mask = (jnp.arange(T)[None, :] < end[:, None]).astype(pred.dtype)  # [B, T]
    diff2 = jnp.square(pred - gt) * mask[:, None, :]
    mse = diff2.sum(axis=2) / jnp.maximum(end[:, None], 1).astype(pred.dtype)  # [B, L]
    rmse = jnp.sqrt(mse)
    return jnp.where(rmse == 0, 100.0, 20 * jnp.log10(1.0 / jnp.maximum(rmse, 1e-30)))


def psnr_masked(pred: jnp.ndarray, gt: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
    """Scalar mean of psnr_values — the reference PSNR() contract."""
    return psnr_values(pred, gt, rois).mean()


def ssim_values(pred: jnp.ndarray, gt: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
    """On-device per-(sample, lead) SSIM over [0 : rois[:, -1, 0]] — the
    skimage algorithm (win 7, uniform filter, sample-covariance norm,
    border-cropped mean) expressed as five ones-kernel convolutions + masked
    reduction, so whole eval epochs stay on device (the host scipy `ssim` is
    the float64 oracle; this runs in f32, which agrees to ~1e-4 — the
    uxx - ux² cancellation is tamed by the C2 stabilizer).

    pred/gt: [B, L, T]; returns [B, L]. Positions whose 7-window crosses the
    region boundary are excluded exactly like skimage's pad-crop, so the
    zero padding of the convolution never contaminates the result.
    """
    B, L, T = pred.shape
    end = jnp.minimum(rois[:, -1, 0], T).astype(jnp.int32)  # [B]
    x = pred.reshape(B * L, T).astype(jnp.float32)
    y = gt.reshape(B * L, T).astype(jnp.float32)
    # one grouped conv over the 5 stacked moment inputs
    stack = jnp.stack([x, y, x * x, y * y, x * y], axis=1)  # [B*L, 5, T]
    kernel = jnp.full((5, 1, _WIN), 1.0 / _WIN, jnp.float32)
    # HIGHEST precision is load-bearing on TPU: the default f32 conv truncates
    # operands to one bf16 MXU pass, and the uxx - ux^2 cancellation then
    # loses the variance entirely (SSIM read ~0.45 instead of ~0.90 on v5e)
    u = jax.lax.conv_general_dilated(
        stack, kernel, window_strides=(1,), padding=[(_WIN // 2, _WIN // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=5,
        precision=jax.lax.Precision.HIGHEST,
    )
    ux, uy, uxx, uyy, uxy = (u[:, i] for i in range(5))
    cov_norm = _WIN / (_WIN - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = _K1 * _K1  # data_range fixed at 1.0 (reference mertic.py:29)
    c2 = _K2 * _K2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    pad = (_WIN - 1) // 2
    pos = jnp.arange(T)[None, :]
    valid = (pos >= pad) & (pos <= end[:, None] - pad - 1)  # [B, T]
    count = jnp.maximum(end - 2 * pad, 1).astype(jnp.float32)  # [B]
    sm = (s.reshape(B, L, T) * valid[:, None, :]).sum(axis=2) / count[:, None]
    return sm


def ssim_masked(pred: jnp.ndarray, gt: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
    """Scalar mean of ssim_values — the reference SSIM() contract."""
    return ssim_values(pred, gt, rois).mean()


def compute_clf_metrics(pred_probs: np.ndarray, gt_labels: np.ndarray, target_label: int = -1) -> dict:
    """Classification metric suite parity (reference utils/mertic.py:35-69):
    per-class PR-AUC, accuracy, per-class precision/recall. pred_probs:
    [N, n_classes] probabilities; gt_labels: [N] int class ids."""
    from sklearn.metrics import (
        accuracy_score,
        auc,
        precision_recall_curve,
        precision_score,
        recall_score,
    )

    pr_auc_list = []
    label_list = np.unique(gt_labels)
    label_list.sort()
    target_recall = target_precision = None
    for label in label_list:
        gt_bin = np.where(gt_labels == label, 1, 0)
        probs = pred_probs[:, label]
        precision, recall, _ = precision_recall_curve(gt_bin, probs)
        pr_auc_list.append(auc(recall, precision))
        if label == target_label:
            target_recall, target_precision = recall, precision

    pred_ids = np.argmax(pred_probs, axis=1)
    precision = precision_score(gt_labels, pred_ids, average=None, zero_division=0)
    recall = recall_score(gt_labels, pred_ids, average=None, zero_division=0)
    result = {
        "mean_auc": float(np.mean(pr_auc_list)),
        "acc": float(accuracy_score(gt_labels, pred_ids)),
        "per_class_auc": [float(a) for a in pr_auc_list],
        "target_recall_points": target_recall,
        "target_precision_points": target_precision,
        "target_recall": float(recall[target_label]) if target_label >= 0 else None,
        "target_precision": float(precision[target_label]) if target_label >= 0 else None,
    }
    return result
