"""Determinism (reference utils/seed_torch.py:7-17).

The reference seeds python/numpy/torch/cuda globally. Here all device-side
randomness flows through explicit jax.random keys and all host-side randomness
through per-(epoch, index) numpy Generators (data/pipeline.py), so one seed
pins the full run. Global numpy/python seeds are still set for any stray
library calls.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def seed_everything(seed: int = 123) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
