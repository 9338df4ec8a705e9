"""Torch round-trip proof: train the PyTorch REFERENCE (imported read-only
from /root/reference/codes, CPU), save its checkpoint through the reference's
own CheckPointer (.pkl + last_checkpoint pointer, utils/checkpointer.py:18-35),
then import it with training/torch_import.py and show the JAX framework's
evaluation of the trained weights matches the torch evaluation.

This closes the "correlation vs a reference-TRAINED checkpoint" gap: parity is
demonstrated on weights produced by actual reference training dynamics
(SGD+momentum, dropout, BN running stats), not just at random init.

Usage: python tools/torch_roundtrip.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference/codes"


def make_synth_batches(batch: int, n_batches: int, seed: int, lead_num: int = 3):
    """Batches from the framework's synthetic ECG corpus (learnable targets,
    shipped IIv2v5_v4I_372 lead partition)."""
    import tempfile

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.data import build_dataset
    from electrocardio_panorama_tpu.data.pipeline import collate

    cfg = get_cfg()
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = lead_num
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    with tempfile.TemporaryDirectory() as td:
        cfg.DATA.synthetic_root = os.path.join(td, "synth")
        ds = build_dataset(cfg, "test")
        rng = np.random.default_rng(seed)
        batches = []
        for b in range(n_batches):
            metas = [
                ds.__getitem__((b * batch + i) % len(ds), rng=rng)
                for i in range(batch)
            ]
            batches.append(collate(metas))
    return batches


def train_reference(batches, out_dir: str, epochs: int = 2, lr: float = 0.05,
                    seed: int = 0, lead_num: int = 3):
    """Train the reference Model_nefnet on CPU with the reference's loss
    (0.5 sg-L1 x2 + L1 reg, nef_net.yml loss_factor) and SGD momentum 0.9,
    save via the reference CheckPointer. Returns (pkl_path, loss_curve)."""
    sys.path.insert(0, REFERENCE)
    import torch
    import network.model_nefnet as mn  # reference, read-only
    from utils.checkpointer import CheckPointer as RefCheckPointer

    torch.manual_seed(seed)
    model = mn.Model_nefnet(theta_encoder_len=1, lead_num=lead_num).float()
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9)
    l1 = torch.nn.L1Loss()
    curve = []
    model.train()
    for _ in range(epochs):
        for b in batches:
            x = torch.tensor(b["data"], dtype=torch.float32)
            it = torch.tensor(b["input_theta"], dtype=torch.float32)
            qt = torch.tensor(b["target_theta"], dtype=torch.float32)
            rois = torch.tensor(b["rois"])
            tv = torch.tensor(b["target_view"], dtype=torch.float32)[:, None, :]
            out, sp, sl = model(x, it, qt, rois, None, "train")
            loss = 0.5 * l1(out.detach(), sp) + 0.5 * l1(out.detach(), sl) + l1(out, tv)
            opt.zero_grad()
            loss.backward()
            opt.step()
            curve.append(float(loss.detach()))
    os.makedirs(out_dir, exist_ok=True)
    ckpt = RefCheckPointer(model, opt, None, save_dir=out_dir)
    ckpt.save("roundtrip", epoch=epochs - 1, best_test_psnr_gen=0.0)
    return os.path.join(out_dir, "roundtrip.pkl"), curve


def eval_reference(pkl_path: str, batch, lead_num: int = 3):
    """Torch evaluation of the trained checkpoint: rest-view decode + the
    reference PSNR metric (utils/mertic.py:7-21)."""
    sys.path.insert(0, REFERENCE)
    import torch
    import network.model_nefnet as mn

    # reference PSNR semantics (utils/mertic.py:7-21) — that module imports
    # skimage (absent here), so the 5-line formula is applied directly
    def RefPSNR(pred, gt, rois):
        import math

        vals = []
        for i in range(pred.shape[0]):
            end = rois[i, -1, 0]
            for j in range(pred.shape[1]):
                rmse = math.sqrt(np.mean((pred[i, j, :end] - gt[i, j, :end]) ** 2))
                vals.append(100 if rmse == 0 else 20 * np.log10(1.0 / rmse))
        return np.mean(vals)

    model = mn.Model_nefnet(theta_encoder_len=1, lead_num=lead_num).float()
    ckpt = torch.load(pkl_path, map_location="cpu", weights_only=False)
    model.load_state_dict(ckpt["model"])
    model.eval()
    with torch.no_grad():
        out, sp, sl, rest_out = model(
            torch.tensor(batch["data"], dtype=torch.float32),
            torch.tensor(batch["input_theta"], dtype=torch.float32),
            torch.tensor(batch["target_theta"], dtype=torch.float32),
            torch.tensor(batch["rois"]),
            torch.tensor(batch["rest_theta"], dtype=torch.float32),
            "val",
        )
    rest_np = rest_out.numpy()
    psnr = float(RefPSNR(rest_np, batch["rest_view"], batch["rois"]))
    return rest_np, psnr


def eval_imported(pkl_path: str, batch, lead_num: int = 3):
    """JAX evaluation of the SAME checkpoint through torch_import."""
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.models import NefNetDef
    from electrocardio_panorama_tpu.training.metrics import psnr
    from electrocardio_panorama_tpu.training.torch_import import import_torch_pkl

    params, state, extras = import_torch_pkl(pkl_path)
    model = NefNetDef(lead_num)
    (out, sp, sl, rest_out), _ = model.apply(
        params, state,
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["rest_theta"]), phase="test", shuffle_idx=(0, 0),
    )
    rest_np = np.asarray(rest_out)
    return rest_np, float(psnr(rest_np, batch["rest_view"], batch["rois"])), extras


def main(out_dir: str = "output/torch_roundtrip"):
    batches = make_synth_batches(batch=8, n_batches=8, seed=0)
    pkl, curve = train_reference(batches, out_dir, epochs=2)
    print(f"reference trained on CPU: loss {curve[0]:.4f} -> {curve[-1]:.4f}")
    eval_b = make_synth_batches(batch=8, n_batches=1, seed=99)[0]
    rest_t, psnr_t = eval_reference(pkl, eval_b)
    rest_j, psnr_j, extras = eval_imported(pkl, eval_b)
    corr = float(np.corrcoef(rest_t.ravel(), rest_j.ravel())[0, 1])
    print(f"torch psnr={psnr_t:.6f}  jax psnr={psnr_j:.6f}  corr={corr:.8f}")
    print(f"imported extras: {extras}")
    assert corr > 0.999999 and abs(psnr_t - psnr_j) < 0.01
    print("ROUNDTRIP OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
