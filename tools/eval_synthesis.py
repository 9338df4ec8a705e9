"""Quantify synthesis-from-scratch (the reference README's SimGAN claim,
/root/reference/README.md:19-22): the reference ships the mechanism (gen_ecg)
but no sampler and no numbers; this tool evaluates our documented Gaussian
latent prior (synthesis.GaussianLatentPrior) with a measurable proxy plus a
side-by-side panorama figure.

Metric — encode/decode ROUND-TRIP consistency: a synthesized 12-lead beat is
fed back through the model (the training recipe's II/V2/V5 input leads ->
encode -> decode all 12 leads) and compared to itself. On-manifold signals
round-trip with high PSNR; off-manifold noise does not. Reported for
  * dataset-latent renders (upper anchor: what on-manifold looks like),
  * prior samples at temperature 1.0 and 0.5,
  * a matched-amplitude noise control (lower anchor).

Usage: python tools/eval_synthesis.py [--config configs/nef_net_convergence.yml]
Writes docs/synthesis_eval.png + prints a JSON line (consumed by
docs/SYNTHESIS.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config="configs/nef_net_convergence.yml", n=16, seed=0,
         plot_path="docs/synthesis_eval.png", cpu=False):
    import jax

    if cpu:  # small workload; lets the tool run while the TPU is busy
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.config import load_cfg
    from electrocardio_panorama_tpu.data import BeatLoader, LEAD_NAMES, LEAD_THETA, build_dataset
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.synthesis import GaussianLatentPrior
    from electrocardio_panorama_tpu.training.checkpoint import CheckPointer
    from electrocardio_panorama_tpu.training import metrics as M

    cfg = load_cfg(config)
    ckpt = CheckPointer(os.path.join(cfg.output_dir, cfg.desc))
    loaded = ckpt.load(best_valid=True)
    if loaded is None:
        raise FileNotFoundError("train the convergence recipe first (TRAINING.md)")
    params, bn_state, _, extras = loaded
    model = build_model(cfg)
    print(f"checkpoint: epoch {extras.get('epoch')} psnr_gen {extras.get('psnr_gen'):.2f}",
          file=sys.stderr)

    ds = build_dataset(cfg, "test")
    dl = BeatLoader(ds, 8, shuffle=False, drop_last=True, seed=cfg.seed)
    prior = GaussianLatentPrior.fit(model, params, iter(dl), max_batches=8)

    # the training recipe's input leads II/V2/V5 (IIv2v5_v4I_372) and the full
    # 12-lead standard view set
    in_idx = [1, 3, 6]
    thetas12 = jnp.asarray(LEAD_THETA.astype(np.float32))
    in_thetas = jnp.asarray(LEAD_THETA[in_idx].astype(np.float32))

    def roundtrip(waves12, rois):
        """waves12 [N, 12, 512] -> re-encode II/V2/V5 -> decode 12 leads."""
        N = waves12.shape[0]
        x = waves12[:, in_idx, :]
        it = jnp.broadcast_to(in_thetas[None], (N, 3, 2))
        lat = model.encode(params, jnp.asarray(x), it, jnp.asarray(rois)).latent_all
        v = jnp.broadcast_to(thetas12[None], (N, 12, 2))
        return np.asarray(model.decode_views(params, bn_state, lat, v))

    def score(waves12, rois):
        rt = roundtrip(waves12, rois)
        r = jnp.asarray(rois)
        return (
            float(M.psnr_masked(jnp.asarray(rt), jnp.asarray(waves12), r)),
            float(M.ssim_masked(jnp.asarray(rt), jnp.asarray(waves12), r)),
            rt,
        )

    rng = np.random.default_rng(seed)
    results = {}

    # ---- anchor: dataset-latent renders (phase-test path on real beats)
    batch = next(iter(BeatLoader(ds, n, shuffle=False, drop_last=True, seed=cfg.seed + 7)))
    lat = model.encode(
        params, jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["rois"]),
    ).latent_all
    v12 = jnp.broadcast_to(thetas12[None], (n, 12, 2))
    ds_render = np.asarray(model.decode_views(params, bn_state, lat, v12))
    p, s, _ = score(ds_render, batch["rois"])
    results["dataset_latents"] = {"roundtrip_psnr": p, "roundtrip_ssim": s}

    # ---- prior samples, two temperatures
    prior_render = None
    for temp in (1.0, 0.5):
        z1, z2, rois = prior.sample(rng, n, temperature=temp)
        render = np.asarray(model.gen_ecg(
            params, bn_state, jnp.asarray(z1), jnp.asarray(z2), v12, jnp.asarray(rois)
        ))
        p, s, _ = score(render, rois)
        results[f"prior_T{temp}"] = {"roundtrip_psnr": p, "roundtrip_ssim": s}
        if temp == 1.0:
            prior_render, prior_rois = render, rois

    # ---- lower anchor: matched-amplitude smooth noise is NOT on-manifold
    t = np.linspace(0, 16, 512, dtype=np.float32)
    phases = rng.uniform(0, 2 * np.pi, (n, 12, 5, 1)).astype(np.float32)
    freqs = rng.uniform(0.5, 4.0, (n, 12, 5, 1)).astype(np.float32)
    noise = (0.5 + 0.12 * np.sin(freqs * t[None, None, None] + phases).sum(2)).astype(np.float32)
    noise = np.clip(noise, 0, 1)
    p, s, _ = score(noise, prior_rois)
    results["noise_control"] = {"roundtrip_psnr": p, "roundtrip_ssim": s}

    # ---- figure: dataset renders vs prior samples, 4 leads x 4 examples
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    leads = [0, 1, 3, 6]  # I, II, V2, V5
    fig, axes = plt.subplots(4, 8, figsize=(22, 7), squeeze=False)
    for col in range(4):
        end = int(batch["rois"][col, -1, 0])
        ends = int(prior_rois[col, -1, 0])
        for row, li in enumerate(leads):
            ax = axes[row][col]
            ax.plot(ds_render[col, li, :end], lw=0.8, color="#1f77b4")
            ax.set_xticks([]), ax.set_yticks([])
            if row == 0:
                ax.set_title(f"dataset #{col}", fontsize=8)
            if col == 0:
                ax.set_ylabel(LEAD_NAMES[li])
            ax2 = axes[row][4 + col]
            ax2.plot(prior_render[col, li, :ends], lw=0.8, color="#d62728")
            ax2.set_xticks([]), ax2.set_yticks([])
            if row == 0:
                ax2.set_title(f"prior sample #{col}", fontsize=8)
    fig.suptitle("Dataset-latent renders (left) vs Gaussian-prior samples (right) — 12-lead decode, 4 leads shown")
    fig.tight_layout()
    os.makedirs(os.path.dirname(plot_path) or ".", exist_ok=True)
    fig.savefig(plot_path, dpi=110)
    print(json.dumps({"n": n, "results": results, "plot": plot_path}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/nef_net_convergence.yml")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", default="docs/synthesis_eval.png")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    main(a.config, a.n, a.seed, a.plot, cpu=a.cpu)
