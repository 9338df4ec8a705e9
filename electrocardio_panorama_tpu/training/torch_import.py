"""PyTorch checkpoint <-> JAX param/state pytree conversion, both directions.

Because the framework stores parameters in a flat dict keyed by torch-style
dotted names (models/blocks.py), importing a reference checkpoint is an
identity key mapping: tensors convert to jnp arrays, BatchNorm buffers
(running_mean / running_var / num_batches_tracked) split into the state dict,
and DataParallel 'module.' prefixes are stripped (reference
utils/checkpointer.py:73-91). Export is the exact inverse: a model trained
here loads into the reference's Model_nefnet via its own CheckPointer
(`{"model": state_dict, **extras}` torch.save payload, checkpointer.py:18-35).
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


def export_torch_state_dict(params: dict, state: dict):
    """Inverse of `import_torch_state_dict`: merge the flat param/state dicts
    back into one torch-keyed state_dict of torch tensors. Dtypes carry over
    (num_batches_tracked stays integer, which torch BN expects)."""
    import torch

    out = {}
    for k, v in {**params, **state}.items():
        arr = np.array(v)
        if np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(np.int64)  # torch stores BN counters as Long
        out[k] = torch.from_numpy(arr)
    return out


def export_torch_pkl(path: str, params: dict, state: dict, **extras) -> str:
    """Write a reference-format checkpoint (torch.save .pkl) so a model
    trained in this framework runs in the reference stack unchanged: the
    payload shape matches the reference CheckPointer (checkpointer.py:18-35)
    minus optimizer/scheduler (torch optimizer state has no JAX twin; the
    reference loader treats both as optional)."""
    import torch

    torch.save({"model": export_torch_state_dict(params, state), **extras}, path)
    return path


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
