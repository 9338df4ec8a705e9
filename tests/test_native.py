"""Native C++ beat-preprocessing: parity with the numpy path + throughput sanity."""

import time

import numpy as np
import pytest

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.data import build_dataset, native


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.MODEL.jitter_factor = 0.0  # deterministic theta for parity check
    cfg.DATA.synthetic_root = str(tmp_path_factory.mktemp("synth"))
    cfg.output_dir = str(tmp_path_factory.mktemp("out"))
    return cfg


def test_native_builds_and_loads():
    assert native.available(), "native lib should build via native/build.sh"


def test_native_matches_numpy_path(cfg):
    cfg.DATA.beat_cache = 0  # cache would serve the first path's prep to the second
    ds = build_dataset(cfg, "train")
    for idx in range(3):
        cfg.DATA.use_native_prep = True
        m_native = ds.__getitem__(idx, rng=np.random.default_rng(42))
        cfg.DATA.use_native_prep = False
        m_numpy = ds.__getitem__(idx, rng=np.random.default_rng(42))
        cfg.DATA.use_native_prep = True
        for key in ("data", "ori_data", "rest_view", "target_view", "rois", "noise"):
            np.testing.assert_allclose(
                m_native[key], m_numpy[key], atol=1e-6, err_msg=f"{key} idx={idx}"
            )


def test_native_prep_beat_direct():
    rng = np.random.default_rng(1)
    rec8 = rng.standard_normal((8, 1500)) * 50
    out = native.prep_beat(rec8, 100, 550, 380, 450)
    assert out is not None
    beat, sigma = out
    assert beat.shape == (12, 512)
    assert sigma.shape == (12,)
    # padded region zero, real region normalized to [0, 1]
    assert (beat[:, 450:] == 0).all()
    assert beat[:, :450].min() >= 0 and beat[:, :450].max() <= 1.0
    assert abs(beat[:, :450].max() - 1.0) < 1e-6 and abs(beat[:, :450].min()) < 1e-6


def test_native_bad_window_errors():
    rec8 = np.zeros((8, 100))
    with pytest.raises(ValueError):
        native.prep_beat(rec8, 90, 50, 0, 10)  # p_on >= end


def test_native_is_not_slower(cfg):
    """The C++ path should beat the numpy path on the per-example hot loop."""
    ds = build_dataset(cfg, "train")
    rng = np.random.default_rng(0)

    def run(n, use_native):
        cfg.DATA.use_native_prep = use_native
        t0 = time.perf_counter()
        for i in range(n):
            ds.__getitem__(i % len(ds), rng=rng)
        return time.perf_counter() - t0

    run(5, True), run(5, False)  # warm file caches
    t_native = run(40, True)
    t_numpy = run(40, False)
    cfg.DATA.use_native_prep = True
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
