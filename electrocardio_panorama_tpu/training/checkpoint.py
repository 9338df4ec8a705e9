"""Checkpointing with the reference CheckPointer's exact file semantics
(utils/checkpointer.py:18-98):

  * save(name, **extras) -> {save_dir}/{name}.pkl + pointer file
    `last_checkpoint` containing the path;
  * load(): explicit path -> `last_checkpoint` pointer -> best_valid.pkl;
  * extras (epoch, psnr_gen, best_test_psnr_gen, ...) round-trip for resume
    (solver.py:50-58).

Contents are JAX pytrees (flat torch-keyed param/state dicts + optax state)
pickled as numpy. `load` transparently accepts reference PyTorch .pkl
checkpoints (torch.save format) via the torch importer, so reference-trained
weights drop straight in.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree.map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


class CheckPointer:
    # multi-host contract: pickle saves happen on process 0 only (the Solver
    # gates on this flag); Orbax saves are collective across processes
    collective = False

    def __init__(self, save_dir: str | None):
        self.save_dir = save_dir
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

    # ------------------------------------------------------------------ save
    def save(self, name: str, *, params, bn_state, opt_state=None, **extras) -> str | None:
        if self.save_dir is None:
            return None
        payload = {
            "model": _to_numpy(params),
            "bn_state": _to_numpy(bn_state),
        }
        if opt_state is not None:
            payload["optimizer"] = _to_numpy(opt_state)
        payload.update(extras)
        path = os.path.join(self.save_dir, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(path)
        return path

    # ------------------------------------------------------------------ load
    def epoch_path(self, epoch: int) -> str:
        """Path of a specific epoch checkpoint for this backend."""
        return os.path.join(self.save_dir or ".", f"epoch_{epoch}.pkl")

    def has_checkpoint(self) -> bool:
        return self.save_dir is not None and os.path.exists(
            os.path.join(self.save_dir, "last_checkpoint")
        )

    def resolve(self, resume: str | None = None, best_valid: bool = False) -> str | None:
        if resume:
            return resume
        if not self.save_dir:
            return None
        if best_valid:
            path = os.path.join(self.save_dir, "best_valid.pkl")
            return path if os.path.exists(path) else None
        ptr = os.path.join(self.save_dir, "last_checkpoint")
        if os.path.exists(ptr):
            with open(ptr) as f:
                return f.read().strip()
        return None

    def load(self, resume: str | None = None, best_valid: bool = False):
        """Returns (params, bn_state, opt_state, extras) or None if nothing to load.

        An EXPLICIT resume path that does not exist raises instead of
        silently training from scratch (observed live: a mistyped
        MODEL.resume truncated the scalar history and restarted epoch 0)."""
        path = self.resolve(resume, best_valid)
        if resume and (path is None or not os.path.exists(path)):
            raise FileNotFoundError(
                f"MODEL.resume checkpoint not found: {resume!r} (resume takes "
                "a checkpoint PATH, e.g. output/run/desc/epoch_123.pkl)"
            )
        if path is None or not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            if not isinstance(payload, dict) or "model" not in payload:
                raise ValueError("not a framework checkpoint")
            native = isinstance(payload["model"], dict) and not _looks_like_torch(payload["model"])
        except Exception:
            native = False
        if not native:
            # reference PyTorch checkpoint (torch.save .pkl)
            from electrocardio_panorama_tpu.training.torch_import import import_torch_pkl

            params, bn_state, extras = import_torch_pkl(path)
            return params, bn_state, None, extras
        params = _to_jax(payload.pop("model"))
        bn_state = _to_jax(payload.pop("bn_state", {}))
        opt_state = payload.pop("optimizer", None)
        if opt_state is not None:
            opt_state = _to_jax(opt_state)
        return params, bn_state, opt_state, payload


def _looks_like_torch(model_dict) -> bool:
    try:
        import torch

        return any(isinstance(v, torch.Tensor) for v in model_dict.values())
    except ImportError:
        return False


class OrbaxCheckPointer(CheckPointer):
    """Orbax-backed variant: same name/pointer/best semantics, directory
    checkpoints via orbax.checkpoint.PyTreeCheckpointer (async-capable storage
    layer, multi-host safe) instead of pickle files.

    Layout: {save_dir}/{name}.orbax/ holding {"model", "bn_state",
    "optimizer", "extras"}; the `last_checkpoint` pointer file stores the
    directory path, and `load` dispatches on the path suffix so pickle and
    orbax checkpoints coexist in one run directory.
    """

    collective = True  # all processes must enter save() (orbax coordinates)

    def save(self, name: str, *, params, bn_state, opt_state=None, **extras) -> str | None:
        if self.save_dir is None:
            return None
        import orbax.checkpoint as ocp

        payload = {"model": _to_numpy(params), "bn_state": _to_numpy(bn_state)}
        if opt_state is not None:
            payload["optimizer"] = _to_numpy(opt_state)
        payload["extras"] = dict(extras)
        path = os.path.abspath(os.path.join(self.save_dir, f"{name}.orbax"))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(path)
        return path

    def load(self, resume: str | None = None, best_valid: bool = False):
        path = self.resolve(resume, best_valid)
        if path is None and best_valid and self.save_dir:
            cand = os.path.join(self.save_dir, "best_valid.orbax")
            path = cand if os.path.exists(cand) else None
        if resume and (path is None or not os.path.exists(path)):
            raise FileNotFoundError(
                f"MODEL.resume checkpoint not found: {resume!r} (resume takes "
                "a checkpoint PATH)"
            )
        if path is None or not os.path.exists(path):
            return None
        if not path.endswith(".orbax"):
            return super().load(resume=path)
        import orbax.checkpoint as ocp

        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        params = _to_jax(payload["model"])
        bn_state = _to_jax(payload.get("bn_state", {}))
        opt_state = payload.get("optimizer")
        if opt_state is not None:
            opt_state = _to_jax(opt_state)
        return params, bn_state, opt_state, dict(payload.get("extras", {}))

    def resolve(self, resume: str | None = None, best_valid: bool = False) -> str | None:
        if not resume and best_valid and self.save_dir:
            cand = os.path.join(self.save_dir, "best_valid.orbax")
            if os.path.exists(cand):
                return cand
        return super().resolve(resume, best_valid)

    def epoch_path(self, epoch: int) -> str:
        return os.path.join(self.save_dir or ".", f"epoch_{epoch}.orbax")
