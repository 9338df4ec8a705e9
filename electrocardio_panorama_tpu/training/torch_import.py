"""PyTorch checkpoint -> JAX param/state pytree import.

Because the framework stores parameters in a flat dict keyed by torch-style
dotted names (models/blocks.py), importing a reference checkpoint is an
identity key mapping: tensors convert to jnp arrays, BatchNorm buffers
(running_mean / running_var / num_batches_tracked) split into the state dict,
and DataParallel 'module.' prefixes are stripped (reference
utils/checkpointer.py:73-91).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_STATE_MARKERS = ("running_mean", "running_var", "num_batches_tracked")


def strip_module_prefix(state_dict: dict) -> dict:
    keys = list(state_dict.keys())
    if keys and all(k.startswith("module.") for k in keys):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return state_dict


def split_params_state(named_arrays: dict, dtype=jnp.float32):
    """Split a {torch_name: ndarray} mapping into (params, state) flat dicts."""
    params, state = {}, {}
    for k, v in named_arrays.items():
        arr = np.asarray(v)
        if any(k.endswith(m) for m in _STATE_MARKERS):
            if k.endswith("num_batches_tracked"):
                state[k] = jnp.asarray(arr)
            else:
                state[k] = jnp.asarray(arr, dtype)
        else:
            params[k] = jnp.asarray(arr, dtype)
    return params, state


def import_torch_state_dict(state_dict, dtype=jnp.float32):
    """state_dict: torch-style {name: tensor-like}. Returns (params, state)."""
    named = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in state_dict.items()}
    return split_params_state(strip_module_prefix(named), dtype)


def import_torch_pkl(path: str, dtype=jnp.float32):
    """Load a reference `.pkl` checkpoint (torch.save format; requires torch).

    Returns (params, state, extras) where extras carries epoch/psnr metadata
    exactly as the reference CheckPointer stores them (checkpointer.py:18-35).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = ckpt.pop("model") if "model" in ckpt else ckpt
    params, state = import_torch_state_dict(model_sd, dtype)
    extras = {k: v for k, v in ckpt.items() if k not in ("optimizer", "scheduler")}
    return params, state, extras
