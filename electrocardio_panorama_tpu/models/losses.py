"""Standin-Learning losses (reference codes/network/loss/losses.py).

loss1/loss2 are the self-supervision terms: L1 between the prediction (with a
STOP-GRADIENT, matching `input0.detach()` at losses.py:17) and the
standin-shuffled decodes. loss3 is the supervised regression term (L1 or MSE
per SOLVER.reg_loss). Weighted by SOLVER.loss_factor and gated by
SOLVER.loss_using exactly as losswrapper does (losses.py:37-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def _abs_torch(x):
    """|x| with torch's L1 subgradient convention: d|x|/dx = sign(x), which
    is 0 AT x == 0 (torch.abs backward). JAX's builtin abs uses 1 there —
    a real training bug when a residual is exactly zero: with lead_num=1 the
    standin-shuffled decodes are bitwise equal to the prediction, so the
    standin L1 sits at exactly 0 and JAX's convention injects a phantom
    full-magnitude gradient through both standin terms that fights the
    supervised loss (the 1-lead PTB recipe could not even overfit one batch;
    the torch reference could). jnp.sign(0) == 0 restores parity."""
    return jnp.abs(x)


@_abs_torch.defjvp
def _abs_torch_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return jnp.abs(x), jnp.sign(x) * t


def l1(a, b):
    return jnp.mean(_abs_torch(a - b))


def mse(a, b):
    return jnp.mean(jnp.square(a - b))


def standin_l1(pred, shuffled):
    """OurLoss1: L1 with stop-gradient on the prediction side (losses.py:10-18)."""
    return l1(jax.lax.stop_gradient(pred), shuffled)


def loss_wrapper(
    predict,
    predict_shuffle_p,
    predict_shuffle_l,
    target,
    cfg,
    rest_out=None,
    rest_view=None,
    loss1_gt=None,
    loss2_gt=None,
):
    """Parity port of `losswrapper` (losses.py:21-50).

    Returns (loss, loss1*f0, loss2*f1, loss3*f2[, loss_unsperv]) — the val-time
    tuple includes the unsupervised regression term when rest tensors are given.
    """
    reg = {"l2_loss": mse, "l1_loss": l1}[cfg.SOLVER.reg_loss]

    loss1_gt = predict if loss1_gt is None else loss1_gt
    loss2_gt = predict if loss2_gt is None else loss2_gt

    using = cfg.SOLVER.loss_using
    loss1 = standin_l1(loss1_gt, predict_shuffle_p) if 1 in using else 0.0
    loss2 = standin_l1(loss2_gt, predict_shuffle_l) if 2 in using else 0.0
    loss3 = reg(predict, target) if 3 in using else 0.0

    f = cfg.SOLVER.loss_factor
    loss = loss1 * f[0] + loss2 * f[1] + loss3 * f[2]

    if rest_out is not None and rest_view is not None:
        loss_unsperv = reg(rest_out, rest_view)
        return loss, loss1 * f[0], loss2 * f[1], loss3 * f[2], loss_unsperv
    return loss, loss1 * f[0], loss2 * f[1], loss3 * f[2]


def mse_per_lead(pred, target):
    """MSELead helper parity (losses.py:53-64): mean over per-lead MSEs."""
    return jnp.mean(jnp.mean(jnp.square(pred - target), axis=(0, 2)))
