"""Optimizer + LR schedule factory (reference solver/optim_scheduler.py:5-18).

torch parity:
  * SGD(lr, momentum=0.9): optax trace(decay=0.9) then -lr scaling — identical
    update v = 0.9 v + g; p -= lr v.
  * Adam(lr): optax.adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8).
  * StepLR(step=50, gamma=0.1) / MultiStepLR(cfg.SOLVER.lr_step, gamma=0.1) are
    epoch-indexed; the learning rate enters the jitted step as a scalar arg so
    schedule changes never retrace.
"""

from __future__ import annotations

import optax


def get_optimizer(cfg) -> optax.GradientTransformation:
    name = cfg.SOLVER.optim
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.SOLVER.lr)
    if name == "sgd":
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.SOLVER.lr, momentum=0.9
        )
    raise ValueError(f"unknown optimizer {name}")


def lr_for_epoch(cfg, epoch: int) -> float:
    """Epoch-indexed LR matching torch StepLR/MultiStepLR with gamma=0.1."""
    base = cfg.SOLVER.lr
    sched = cfg.SOLVER.scheduler
    if sched == "steplr":
        return base * (0.1 ** (epoch // 50))
    if sched == "MultiStep":
        passed = sum(1 for m in cfg.SOLVER.lr_step if epoch >= m)
        return base * (0.1**passed)
    raise ValueError(f"unknown scheduler {sched}")


def set_lr(opt_state, lr: float):
    """Update the injected learning_rate hyperparam in-place-ish."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
