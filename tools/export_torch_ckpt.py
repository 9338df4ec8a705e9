"""Export a framework checkpoint to the reference's torch .pkl format.

The import direction (reference-trained .pkl -> this framework) has been in
place since round 1 (training/torch_import.py); this tool is the other half
of the interoperability story: a model trained HERE loads into the reference
stack via its own CheckPointer (reference utils/checkpointer.py:37-91 —
optimizer/scheduler entries are optional there, so the payload is
`{"model": state_dict, **extras}`).

With --check, the exported state_dict is loaded into the ACTUAL reference
Model_nefnet (imported read-only from /root/reference/codes, same pattern as
make_goldens.py) with load_state_dict(strict=True), and the reference's
eval-mode forward is compared against this framework's decode on the same
inputs — proving the exported file is consumable end to end, not just
key-compatible.

Usage:
  python tools/export_torch_ckpt.py <native_ckpt.pkl> <out.pkl> [--check]
  python tools/export_torch_ckpt.py --fresh <out.pkl> --check [--leads N]
      (fresh-init params; --leads exercises non-default model geometry)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # conversion tool; never touch the TPU tunnel


def load_native(path: str):
    """Read a framework checkpoint (training/checkpoint.py payload keys:
    model / bn_state / optimizer / extras)."""
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    extras = {k: v for k, v in payload.items()
              if k not in ("model", "bn_state", "optimizer", "scheduler")}
    return payload["model"], payload.get("bn_state", {}), extras


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check = "--check" in sys.argv
    fresh = "--fresh" in sys.argv

    from electrocardio_panorama_tpu.training.torch_import import export_torch_pkl

    if fresh:
        from electrocardio_panorama_tpu.models import NefNetDef

        leads = 3
        if "--leads" in sys.argv:
            leads = int(sys.argv[sys.argv.index("--leads") + 1])
            args.remove(str(leads))
        out_path = args[0]
        model = NefNetDef(leads)
        params, state = model.init(jax.random.PRNGKey(0))
        extras = {"epoch": 0, "best_test_psnr_gen": 0.0}
    else:
        ckpt_path, out_path = args[0], args[1]
        params, state, extras = load_native(ckpt_path)

    export_torch_pkl(out_path, params, state, **extras)
    print(f"wrote {out_path} ({len(params)} params, {len(state)} state buffers, "
          f"extras={sorted(extras)})")

    if not check:
        return

    # ---- strict load into the reference model + eval-forward comparison
    sys.path.insert(0, "/root/reference/codes")
    import torch

    import network.model_nefnet as mn  # reference, read-only

    # model geometry from the exported tensors themselves (the encoder tower
    # has 128 channels per lead; the theta feature dim is (2*len+1)*4), so
    # --check works for any lead_num / theta_L the checkpoint was trained with
    lead_num = int(params["W_encoder.conv1.weight"].shape[0]) // 128
    theta_len = (int(params["mlp1.weight"].shape[1]) // 4 - 1) // 2
    ref = mn.Model_nefnet(theta_encoder_len=theta_len, lead_num=lead_num)
    payload = torch.load(out_path, map_location="cpu", weights_only=False)
    ref.load_state_dict(payload["model"], strict=True)
    ref.eval()
    print("reference load_state_dict(strict=True): ok")

    from electrocardio_panorama_tpu.models import NefNetDef

    model = NefNetDef(lead_num, theta_encoder_len=theta_len)
    rng = np.random.default_rng(7)
    data = rng.uniform(0, 1, (2, lead_num, 512)).astype(np.float32)
    it = rng.uniform(-np.pi, np.pi, (2, lead_num, 2)).astype(np.float32)
    cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
    pts = np.concatenate([[0], cuts, [512]])
    rois = np.broadcast_to(np.stack([pts[:-1], pts[1:]], 1), (2, 7, 2)).astype(np.int64)
    views = rng.uniform(-np.pi, np.pi, (2, 5, 2)).astype(np.float32)

    latent = model.encode(params, data, it, rois).latent_all
    ours = np.asarray(model.decode_views(params, state, latent, views))

    # the reference decodes arbitrary views through its test phase
    # (model_nefnet.py:181-192: rest_theta drives a per-view decode loop)
    with torch.no_grad():
        _, _, _, rest = ref(
            torch.from_numpy(data), torch.from_numpy(it),
            torch.from_numpy(views[:, 0]), torch.from_numpy(rois),
            torch.from_numpy(views), phase="test",
        )
        theirs = rest.numpy()

    err = np.abs(ours - theirs).max()
    corr = np.corrcoef(ours.ravel(), theirs.ravel())[0, 1]
    print(f"forward parity vs reference on exported weights: corr={corr:.8f} max={err:.2e}")
    assert corr > 0.999999 and err < 5e-5, (corr, err)
    print("EXPORT CHECK OK")


if __name__ == "__main__":
    main()
