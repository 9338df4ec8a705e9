"""Latent workflow + full-record rendering + weighted sampler."""

import os

import numpy as np
import pytest
import jax

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
from electrocardio_panorama_tpu.models import NefNetDef, build_model
from electrocardio_panorama_tpu.synthesis import PanoramaGenerator, render_full_record, theta_grid
from electrocardio_panorama_tpu.training.checkpoint import CheckPointer


@pytest.fixture(scope="module")
def trained_cfg(tmp_path_factory):
    """Config with a saved (untrained) checkpoint so checkpoint-gated CLIs run."""
    cfg = get_cfg()
    cfg.desc = "synthcli"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.synthetic_root = str(tmp_path_factory.mktemp("synth"))
    cfg.output_dir = str(tmp_path_factory.mktemp("out"))
    cfg.latent_save_dir = str(tmp_path_factory.mktemp("latents"))
    model = build_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    ckpt = CheckPointer(os.path.join(cfg.output_dir, cfg.desc))
    ckpt.save("best_valid", params=params, bn_state=bn, epoch=0, best_test_psnr_gen=1.0)
    return cfg


def test_export_latents_and_prior_and_generate(trained_cfg):
    from electrocardio_panorama_tpu.synth_cli import export_latents, fit_prior, generate

    n = export_latents(trained_cfg, max_batches=1, batch_size=2)
    assert n == 2
    files = [f for f in os.listdir(trained_cfg.latent_save_dir) if f.startswith("latents_")]
    assert files
    z = np.load(os.path.join(trained_cfg.latent_save_dir, files[0]))
    assert z["z1"].shape == (2, 384, 128)
    assert z["z2"].shape == (2, 384, 7, 32)

    fit_prior(trained_cfg, max_batches=1, batch_size=2)
    assert os.path.exists(os.path.join(trained_cfg.latent_save_dir, "prior.npz"))

    ecg = generate(trained_cfg, n=3, n_views=24)
    assert ecg.shape == (3, 24, 512)
    assert np.isfinite(ecg).all()
    assert os.path.exists(os.path.join(trained_cfg.latent_save_dir, "generated.npz"))


def test_render_full_record(trained_cfg):
    ds = build_dataset(trained_cfg, "test")
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(0))
    gen = PanoramaGenerator(model, params, state)
    views = theta_grid(3, 4)
    pano, batch = render_full_record(gen, ds, 0, views)
    n_beats = ds.num_beats(0)
    assert pano.shape == (n_beats, 12, 512)
    assert np.isfinite(np.asarray(pano)).all()


def test_weighted_sampler_loader():
    class Tiny:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng=None):
            return {"data": np.full((1, 8), i, np.float32), "rois": np.zeros((7, 2), np.int64),
                    "input_theta": np.zeros((1, 2), np.float32),
                    "target_view": np.zeros(8, np.float32), "target_theta": np.zeros(2, np.float32),
                    "ori_data": np.zeros((2, 8), np.float32), "rest_view": np.zeros((2, 8), np.float32),
                    "rest_theta": np.zeros((2, 2), np.float32), "noise": np.zeros(8, np.float32)}

    # heavily weight index 3
    dl = BeatLoader(Tiny(), batch_size=8, shuffle=True, drop_last=True, seed=0,
                    sample_weights=[0.01, 0.01, 0.01, 10.0], num_samples=64)
    assert len(dl) == 8
    vals = np.concatenate([b["data"][:, 0, 0] for b in dl])
    assert len(vals) == 64
    assert (vals == 3).mean() > 0.8
