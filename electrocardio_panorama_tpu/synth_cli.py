"""Synthesis-from-scratch CLI: the latent workflow the reference only implies.

The reference exposes phase='gen' latent extraction and gen_ecg decoding
(model_nefnet.py:140-141,196-218) plus a `latent_save_dir` config key
(config/default.py:8) but ships no latent sampler (README.md:19-22). This CLI
completes the pipeline:

    python -m electrocardio_panorama_tpu.synth_cli export-latents --config-file CFG
        -> encode the test split with phase='gen', save z1/z2/rois npz shards
           into cfg.latent_save_dir
    python -m electrocardio_panorama_tpu.synth_cli fit-prior --config-file CFG
        -> fit the Gaussian latent prior over the saved (or freshly encoded)
           latents -> latent_save_dir/prior.npz
    python -m electrocardio_panorama_tpu.synth_cli generate --config-file CFG \
        [--n 8] [--views 24] [--out gen.npz] [--plot gen.png]
        -> sample the prior, decode under a viewpoint grid (gen_ecg two-step
           API), save waveforms
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from electrocardio_panorama_tpu.cli import cfg_from_args
from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
from electrocardio_panorama_tpu.models import build_model
from electrocardio_panorama_tpu.synthesis import (
    GaussianLatentPrior,
    plot_panorama,
    synthesize_from_scratch,
    theta_grid,
)
from electrocardio_panorama_tpu.training.checkpoint import CheckPointer
from electrocardio_panorama_tpu.utils import seed_everything


def _load_model(cfg):
    ckpt = CheckPointer(os.path.join(cfg.output_dir, cfg.desc))
    loaded = ckpt.load(cfg.MODEL.resume or None, best_valid=not cfg.MODEL.resume)
    if loaded is None:
        raise FileNotFoundError("no checkpoint (train first, or set MODEL.resume)")
    params, bn_state, _, _ = loaded
    return build_model(cfg), params, bn_state


def export_latents(cfg, max_batches=None, batch_size=8):
    import jax

    model, params, bn_state = _load_model(cfg)
    ds = build_dataset(cfg, "test")
    dl = BeatLoader(ds, batch_size, shuffle=False, drop_last=False, seed=cfg.seed)
    enc = jax.jit(
        lambda p, x, it, r: model.encode(p, x, it, r, stop_before_reverse=True)
    )
    out_dir = cfg.latent_save_dir
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for bi, batch in enumerate(dl):
        if max_batches is not None and bi >= max_batches:
            break
        z1, z2 = enc(params, jnp.asarray(batch["data"]),
                     jnp.asarray(batch["input_theta"]), jnp.asarray(batch["rois"]))
        np.savez(
            os.path.join(out_dir, f"latents_{bi:05d}.npz"),
            z1=np.asarray(z1), z2=np.asarray(z2), rois=batch["rois"],
        )
        n += z1.shape[0]
    print(f"exported {n} latents -> {out_dir}")
    return n


def fit_prior(cfg, max_batches=8, batch_size=8, loaded=None):
    """Fit the Gaussian prior. Prefers latents previously saved by
    export-latents (latent_save_dir/latents_*.npz); falls back to encoding
    up to max_batches fresh test batches."""
    import glob

    shards = sorted(glob.glob(os.path.join(cfg.latent_save_dir, "latents_*.npz")))
    if shards:
        z1s, z2s, rois = [], [], None
        for s in shards:
            z = np.load(s)
            z1s.append(z["z1"])
            z2s.append(z["z2"])
            if rois is None:
                rois = z["rois"][0]
        z1 = np.concatenate(z1s)
        z2 = np.concatenate(z2s)
        eps = 1e-6
        prior = GaussianLatentPrior(
            z1.mean(0), z1.std(0) + eps, z2.mean(0), z2.std(0) + eps, rois
        )
        print(f"prior fitted from {len(shards)} exported shard(s) ({z1.shape[0]} latents)")
    else:
        model, params, bn_state = loaded or _load_model(cfg)
        ds = build_dataset(cfg, "test")
        dl = BeatLoader(ds, batch_size, shuffle=False, drop_last=False, seed=cfg.seed)
        prior = GaussianLatentPrior.fit(model, params, iter(dl), max_batches=max_batches)
        print(f"prior fitted from {max_batches} freshly encoded batch(es)")
    path = os.path.join(cfg.latent_save_dir, "prior.npz")
    prior.save(path)
    print(f"prior -> {path}")
    return path


def _grid_dims(n_views: int) -> tuple[int, int]:
    """Factor a view count into the most square (n_theta, n_phi) grid."""
    if n_views < 1:
        raise ValueError(f"--views must be >= 1, got {n_views}")
    for d in range(int(n_views**0.5), 0, -1):
        if n_views % d == 0:
            return d, n_views // d
    return 1, n_views


def generate(cfg, n=8, n_views=24, out_path=None, plot_path=None, seed=0,
             temperature=1.0):
    loaded = _load_model(cfg)
    model, params, bn_state = loaded
    prior_path = os.path.join(cfg.latent_save_dir, "prior.npz")
    if not os.path.exists(prior_path):
        fit_prior(cfg, loaded=loaded)
    prior = GaussianLatentPrior.load(prior_path)
    nt, np_ = _grid_dims(n_views)
    views = theta_grid(nt, np_)
    ecg = synthesize_from_scratch(model, params, bn_state, prior, views, n=n,
                                  seed=seed, temperature=temperature)
    ecg = np.asarray(ecg)
    out_path = out_path or os.path.join(cfg.latent_save_dir, "generated.npz")
    rois = np.broadcast_to(prior.rois_template, (n, *prior.rois_template.shape))
    np.savez(out_path, ecg=ecg, views=views, rois=rois)
    print(f"generated {n} beats x {len(views)} views -> {out_path}")
    if plot_path:
        plot_panorama(ecg, rois, 0, plot_path, nt, np_)
        print(f"plot -> {plot_path}")
    return ecg


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="ECG synthesis from scratch")
    parser.add_argument("cmd", choices=["export-latents", "fit-prior", "generate"])
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--out", default=None)
    parser.add_argument("--plot", default=None)
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=None,
                        help="sampling seed (default: cfg.seed)")
    parser.add_argument("opts", nargs="*", default=[], help="KEY VALUE overrides")
    args = parser.parse_args()
    cfg = cfg_from_args(args)
    seed_everything(cfg.seed)
    if args.cmd == "export-latents":
        export_latents(cfg, args.max_batches)
    elif args.cmd == "fit-prior":
        fit_prior(cfg, args.max_batches or 8)
    else:
        generate(cfg, args.n, args.views, args.out, args.plot,
                 seed=cfg.seed if args.seed is None else args.seed,
                 temperature=args.temperature)
