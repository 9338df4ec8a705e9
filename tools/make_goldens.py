"""Record golden activations from the PyTorch reference for parity testing.

Runs the reference Nef-Net (imported read-only from /root/reference/codes — no
code is copied) on fixed random inputs and saves weights + inputs + outputs to
tests/goldens/*.npz. The committed goldens make the parity tests independent of
the reference checkout.

Determinism: torch seeded; the reference's in-forward `random.randint` standin
draws (model_nefnet.py:154-157) are pinned by monkeypatching `random.randint`;
dropout is disabled by putting Dropout modules in eval (the JAX side runs with
rng=None, which no-ops dropout identically) while BatchNorm stays in the mode
under test.

Usage: python tools/make_goldens.py
"""

import sys

sys.path.insert(0, "/root/reference/codes")

import numpy as np
import torch

import network.model_nefnet as mn  # noqa: E402  (reference, read-only)

OUT_DIR = "tests/goldens"
def shuffle_idx_for(lead_num):
    """Pinned standin lead draws (z1 lead, z2 lead), valid for any lead_num."""
    return (min(1, lead_num - 1), 0)


def make_rois(rng, batch, n_seg=7, total=512):
    rois = []
    for _ in range(batch):
        cuts = np.sort(rng.choice(np.arange(8, total - 8, 4), size=n_seg - 1, replace=False))
        pts = np.concatenate([[0], cuts, [total]])
        rois.append(np.stack([pts[:-1], pts[1:]], axis=1))
    return np.stack(rois).astype(np.int64)


def set_dropout_eval(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()


def record(lead_num: int, batch: int = 4, n_rest: int = 9, seed: int = 0):
    SHUFFLE_IDX = shuffle_idx_for(lead_num)
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    model = mn.Model_nefnet(theta_encoder_len=1, lead_num=lead_num).float()

    x = rng.standard_normal((batch, lead_num, 512)).astype(np.float32)
    input_thetas = rng.uniform(-np.pi, np.pi, (batch, lead_num, 2)).astype(np.float32)
    query_theta = rng.uniform(-np.pi, np.pi, (batch, 2)).astype(np.float32)
    rest_theta = rng.uniform(-np.pi, np.pi, (batch, n_rest, 2)).astype(np.float32)
    rois = make_rois(rng, batch)

    tx = torch.tensor(x)
    tin = torch.tensor(input_thetas)
    tq = torch.tensor(query_theta)
    trest = torch.tensor(rest_theta)
    trois = torch.tensor(rois)

    # pin the standin draws (alternating z1-lead, z2-lead)
    orig_randint = mn.random.randint
    counter = {"n": 0}

    def pinned_randint(_a, _b):
        v = SHUFFLE_IDX[counter["n"] % 2]
        counter["n"] += 1
        return v

    mn.random.randint = pinned_randint

    data = {
        "x": x, "input_thetas": input_thetas, "query_theta": query_theta,
        "rest_theta": rest_theta, "rois": rois,
        "shuffle_idx": np.array(SHUFFLE_IDX),
    }
    for k, v in model.state_dict().items():
        data[f"param::{k}"] = v.numpy().copy()

    # ---- eval mode, phase 'test' (BN running stats, all-views decode)
    model.eval()
    with torch.no_grad():
        out, sp, sl, rest_out = model(tx, tin, tq, trois, rest_theta=trest, phase="test")
    data["eval.out"] = out.numpy()
    data["eval.shuffle_p"] = sp.numpy()
    data["eval.shuffle_l"] = sl.numpy()
    data["eval.rest_out"] = rest_out.numpy()

    # ---- phase 'gen' latents + gen_ecg decode
    with torch.no_grad():
        z1, z2 = model(tx, tin, tq, trois, phase="gen")
        gen = model.gen_ecg(z1, z2, trest, trois)
    data["gen.z1"] = z1.numpy()
    data["gen.z2"] = z2.numpy()
    data["gen.ecg"] = gen.numpy()

    # ---- train mode (BN batch stats, dropout pinned off), phase 'train'
    counter["n"] = 0
    model.train()
    set_dropout_eval(model)
    with torch.no_grad():
        out_t, sp_t, sl_t = model(tx, tin, tq, trois, phase="train")
    data["train.out"] = out_t.numpy()
    data["train.shuffle_p"] = sp_t.numpy()
    data["train.shuffle_l"] = sl_t.numpy()
    for k, v in model.state_dict().items():
        if "running_" in k or "num_batches" in k:
            data[f"post_train_state::{k}"] = v.numpy().copy()

    # ---- gradient golden: one full train-mode backward (dropout off, pinned
    # shuffles, the shipped loss recipe: 0.5*sg-L1 x2 + 1.0*L1(out, target))
    model.load_state_dict({k: torch.tensor(data[f"param::{k}"]) for k in
                           [kk[len("param::"):] for kk in data if kk.startswith("param::")]})
    model.train()
    set_dropout_eval(model)
    counter["n"] = 0
    target = torch.tensor(rng.uniform(0, 1, (batch, 1, 512)).astype(np.float32))
    data["grad_target"] = target.numpy()
    out_g, sp_g, sl_g = model(tx, tin, tq, trois, phase="train")
    l1 = torch.nn.L1Loss()
    loss = 0.5 * l1(out_g.detach(), sp_g) + 0.5 * l1(out_g.detach(), sl_g) + 1.0 * l1(out_g, target)
    loss.backward()
    data["grad_loss"] = np.array(loss.item(), np.float32)
    for k, v in model.named_parameters():
        if v.grad is not None:
            data[f"grad::{k}"] = v.grad.numpy().copy()

    mn.random.randint = orig_randint

    import os

    os.makedirs(OUT_DIR, exist_ok=True)
    path = f"{OUT_DIR}/nefnet_lead{lead_num}.npz"
    np.savez_compressed(path, **data)
    print(f"wrote {path} ({len(data)} arrays)")




def record_nefnet2(lead_num: int = 3, batch: int = 2, n_rest: int = 5, seed: int = 0):
    """Goldens for the Nef-Net2 variant (eval path): validates the
    lead-into-batch fold against the reference's per-lead Python loop."""
    import network.model_nefnet2 as mn2

    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    model = mn2.Model_nefnet2(theta_encoder_len=1, lead_num=lead_num).float()

    x = rng.standard_normal((batch, lead_num, 512)).astype(np.float32)
    input_thetas = rng.uniform(-np.pi, np.pi, (batch, lead_num, 2)).astype(np.float32)
    query_theta = rng.uniform(-np.pi, np.pi, (batch, 2)).astype(np.float32)
    rest_theta = rng.uniform(-np.pi, np.pi, (batch, n_rest, 2)).astype(np.float32)
    rois = make_rois(rng, batch)

    idx = shuffle_idx_for(lead_num)
    counter = {"n": 0}

    def pinned(_a, _b):
        v = idx[counter["n"] % 2]
        counter["n"] += 1
        return v

    orig = mn2.random.randint
    mn2.random.randint = pinned

    data = {
        "x": x, "input_thetas": input_thetas, "query_theta": query_theta,
        "rest_theta": rest_theta, "rois": rois, "shuffle_idx": np.array(idx),
    }
    for k, v in model.state_dict().items():
        data[f"param::{k}"] = v.numpy().copy()

    model.eval()
    with torch.no_grad():
        out, sp, sl, rest = model(
            torch.tensor(x), torch.tensor(input_thetas), torch.tensor(query_theta),
            torch.tensor(rois), rest_theta=torch.tensor(rest_theta), phase="test",
        )
        z1m, z2m = model(
            torch.tensor(x), torch.tensor(input_thetas), torch.tensor(query_theta),
            torch.tensor(rois), phase="gen",
        )
    data["eval.out"] = out.numpy()
    data["eval.shuffle_p"] = sp.numpy()
    data["eval.shuffle_l"] = sl.numpy()
    data["eval.rest_out"] = rest.numpy()
    data["gen.z1_mean"] = z1m.numpy()
    data["gen.z2_mean"] = z2m.numpy()
    mn2.random.randint = orig

    import os

    os.makedirs(OUT_DIR, exist_ok=True)
    path = f"{OUT_DIR}/nefnet2_lead{lead_num}.npz"
    np.savez_compressed(path, **data)
    print(f"wrote {path} ({len(data)} arrays)")


if __name__ == "__main__":
    record(lead_num=3)  # flagship config (nef_net.yml: lead_num 3)
    record(lead_num=1)  # minimum end-to-end slice (SURVEY.md section 7)
    record_nefnet2(lead_num=3)
