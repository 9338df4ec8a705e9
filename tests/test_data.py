"""Data layer: lead math, partition matrix, dataset semantics, loader shapes."""

import numpy as np
import pytest

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.data import (
    BeatLoader,
    LEAD_THETA,
    build_dataset,
    derive_augmented_leads,
    lead_partition,
    partition_sizes,
)


def test_lead_theta_table():
    assert LEAD_THETA.shape == (12, 2)
    # spot values from the reference table (tianchi.py:55-67)
    np.testing.assert_allclose(LEAD_THETA[0], [np.pi / 2, np.pi / 2])
    np.testing.assert_allclose(LEAD_THETA[1], [np.pi * 5 / 6, np.pi / 2])
    np.testing.assert_allclose(LEAD_THETA[2], [np.pi / 2, -np.pi / 18])
    np.testing.assert_allclose(LEAD_THETA[11], [np.pi, np.pi / 2])


def test_derived_leads():
    rng = np.random.default_rng(0)
    d8 = rng.standard_normal((8, 100))
    d12 = derive_augmented_leads(d8)
    assert d12.shape == (12, 100)
    I, II = d8[0], d8[1]
    np.testing.assert_allclose(d12[8], II - I)           # III
    np.testing.assert_allclose(d12[9], -0.5 * (I + II))  # aVR
    np.testing.assert_allclose(d12[10], I - 0.5 * II)    # aVL
    np.testing.assert_allclose(d12[11], II - 0.5 * I)    # aVF


# Expected partitions straight from the reference if-ladder (SURVEY.md 2.2).
PARTITION_CASES = [
    (3, "IIv2v5_v4I_372", "input_fix", [1, 3, 6], [5, 0]),
    (12, "_12120", "normal", list(range(12)), []),
    (9, "any", "normal", [x for x in range(12) if x not in (0, 1, 3)], []),
    (8, "_8120", "normal", list(range(8)), []),
    (4, "_480", "normal", [2, 6, 0, 8], []),
    (4, "_462", "normal", [2, 6, 0, 8], [4, 11]),
    (5, "_552", "normal", [2, 6, 0, 8, 10], [4, 11]),
    (5, "_561", "normal", [2, 6, 0, 8, 10], [4]),
    (5, "_570", "normal", [2, 6, 0, 8, 10], []),
    (2, "_2100", "normal", [1, 6], []),
    (1, "_1110", "normal", [1], []),
    (1, "_1101", "normal", [1], [4]),
    (1, "_192", "normal", [1], [4, 11]),
]


@pytest.mark.parametrize("lead_num,mode,tdm,select,unsup", PARTITION_CASES)
def test_lead_partition(lead_num, mode, tdm, select, unsup):
    rng = np.random.default_rng(0)
    sel, sup, uns = lead_partition(lead_num, mode, tdm, rng)
    assert sel == select
    assert uns == unsup
    if (lead_num, mode) == (12, "_12120") or (lead_num, mode) == (8, "_8120"):
        assert sup == list(range(12))
    elif lead_num == 9:
        assert sup == [0, 1, 3]
    else:
        assert sup == [x for x in range(12) if x not in select + unsup]


def test_lead_partition_228():
    sel, sup, uns = lead_partition(2, "_228", "normal", np.random.default_rng(0))
    assert sel == [1, 6]
    assert sup == [1, 6, 9, 3]
    assert uns == [x for x in range(12) if x not in sup]


def test_lead_partition_random3():
    rng = np.random.default_rng(7)
    for _ in range(20):
        sel, sup, uns = lead_partition(3, "normal", "normal", rng)
        assert len(sel) == 3 and len(set(sel)) == 3
        n_lamb = sum(1 for x in sel if x in [2, 4, 6, 7])
        assert n_lamb in (1, 2)
        assert all(x in [2, 4, 6, 7, 0, 1, 8, 9] for x in sel)


def test_lead_partition_bad_lead_num():
    with pytest.raises(KeyError):
        lead_partition(7, "nope", "normal", np.random.default_rng(0))


@pytest.fixture(scope="module")
def synthetic_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.MODEL.jitter_factor = 2.5
    cfg.DATA.synthetic_root = str(tmp_path_factory.mktemp("synth"))
    cfg.output_dir = str(tmp_path_factory.mktemp("out"))
    return cfg


def test_synthetic_dataset_meta(synthetic_cfg):
    ds = build_dataset(synthetic_cfg, "train")
    assert len(ds) == 16
    rng = np.random.default_rng(0)
    meta = ds.__getitem__(0, rng=rng)
    assert meta["data"].shape == (3, 512)
    assert meta["rois"].shape == (7, 2)
    assert meta["input_theta"].shape == (3, 2)
    assert meta["target_view"].shape == (512,)
    assert meta["target_theta"].shape == (2,)
    assert meta["ori_data"].shape == (12, 512)
    assert meta["rest_view"].shape == (9, 512)   # 7 rest + 2 unsup
    assert meta["rest_theta"].shape == (9, 2)
    assert meta["noise"].shape == (512,)
    assert meta["unsupervision_lead_name"] == [5, 0]
    # ROI invariants: contiguous partition from 0 to 512
    r = meta["rois"]
    assert r[0, 0] == 0 and r[-1, 1] == 512
    assert (r[1:, 0] == r[:-1, 1]).all()
    # normalization: joint min-max into [0, 1] over the real-signal region
    end = r[-1, 0]
    assert 0.0 <= meta["ori_data"][:, :end].min() <= meta["ori_data"][:, :end].max() <= 1.0


def test_loader_batching_and_determinism(synthetic_cfg):
    ds = build_dataset(synthetic_cfg, "train")
    dl = BeatLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=9)
    batches = list(dl)
    assert len(batches) == 4  # 16 train records / batch 4
    b = batches[0]
    assert b["data"].shape == (4, 3, 512)
    assert b["rest_view"].shape == (4, 9, 512)
    # same seed + epoch => identical batches
    dl2 = BeatLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=9)
    b2 = next(iter(dl2))
    np.testing.assert_array_equal(b["data"], b2["data"])
    # next epoch differs (reshuffle + new beat picks)
    b3 = next(iter(dl))
    assert not np.array_equal(b["data"], b3["data"])


def test_partition_sizes(synthetic_cfg):
    n_in, n_rest = partition_sizes(3, "IIv2v5_v4I_372", "input_fix")
    assert (n_in, n_rest) == (3, 9)
    n_in, n_rest = partition_sizes(1, "_1110", "normal")
    assert (n_in, n_rest) == (1, 11)


def test_ptb_dataset_end_to_end(tmp_path):
    """PTB pipeline: synthetic corpus in PTB layout -> beat indexing -> pickle
    cache -> meta assembly with the PTB lead reorder."""
    from electrocardio_panorama_tpu.data import generate_ptb_dataset
    from electrocardio_panorama_tpu.data.ptb import PTBBeatDataset, reorder_ptb_leads

    overrides = generate_ptb_dataset(str(tmp_path), n_patients=3, records_per_patient=2)
    cfg = get_cfg()
    cfg.DATA.lead_num = 1
    cfg.DATA.super_mode = "_1110"
    for k, v in overrides.items():
        cfg.DATA[k] = v

    ds = PTBBeatDataset(cfg, "train")
    assert len(ds) > 0
    meta = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert meta["data"].shape == (1, 512)
    assert meta["rest_view"].shape == (11, 512)
    # pickle cache created and reused
    import os
    assert os.path.exists(cfg.DATA.train_pkl_path)
    ds2 = PTBBeatDataset(cfg, "train")
    assert len(ds2) == len(ds)

    # lead reorder: raw PTB [I,II,III,aVR,aVL,aVF,V1..V6] -> canonical
    raw = np.arange(12)[:, None] * np.ones((1, 8))
    re = reorder_ptb_leads(raw)
    np.testing.assert_array_equal(re[:, 0], [0, 1, 6, 7, 8, 9, 10, 11, 2, 3, 4, 5])


def test_threaded_loader_matches_synchronous(synthetic_cfg):
    """num_threads>1 must produce byte-identical batches to the synchronous
    path (per-(epoch, position) RNG streams are position-keyed, not
    thread-keyed)."""
    ds = build_dataset(synthetic_cfg, "train")
    dl_sync = BeatLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=5, num_threads=0)
    dl_thr = BeatLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=5, num_threads=4)
    for a, b in zip(dl_sync, dl_thr):
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["rois"], b["rois"])
        np.testing.assert_array_equal(a["noise"], b["noise"])


def test_beat_and_record_caches_transparent(synthetic_cfg):
    """The record/prepped-beat LRU caches must be behavior-invisible: a
    dataset with caching disabled produces byte-identical metas, both on the
    native-prep and numpy-fallback paths, and repeated hits of the same beat
    don't corrupt cached buffers (meta arrays may alias the cache)."""
    for native in (True, False):
        cfg = synthetic_cfg.clone()
        cfg.DATA.use_native_prep = native
        ds_cached = build_dataset(cfg, "train")
        cfg2 = cfg.clone()
        cfg2.DATA.record_cache = 0
        cfg2.DATA.beat_cache = 0
        ds_cold = build_dataset(cfg2, "train")
        assert ds_cold._beat_cache.maxsize == 0
        for index in (0, 3):
            for draw in range(3):  # same beat repeatedly -> cache hits
                rng_a = np.random.default_rng([11, draw, index])
                rng_b = np.random.default_rng([11, draw, index])
                a = ds_cached.__getitem__(index, rng=rng_a)
                b = ds_cold.__getitem__(index, rng=rng_b)
                for k in ("data", "rois", "input_theta", "target_view",
                          "target_theta", "ori_data", "rest_view",
                          "rest_theta", "noise"):
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert len(ds_cached._beat_cache) > 0 and len(ds_cold._beat_cache) == 0
        # cached metas alias frozen cache entries (data/cache.py): in-place
        # mutation must be a loud error, not silent cross-epoch corruption
        m = ds_cached.__getitem__(0, rng=np.random.default_rng(1))
        with pytest.raises(ValueError):
            m["ori_data"][0, 0] = 5.0


def test_reference_shipped_yml_loads_unchanged():
    """The reference's own config file (codes/config/nef_net.yml) must merge
    into our config tree without edits — key schema + type compatibility."""
    import os

    ref_yml = "/root/reference/codes/config/nef_net.yml"
    if not os.path.exists(ref_yml):
        pytest.skip("reference checkout not mounted")
    from electrocardio_panorama_tpu.config import load_cfg

    cfg = load_cfg(ref_yml)
    assert cfg.MODEL.model == "model_nefnet"
    assert cfg.MODEL.jitter_factor == 2.5
    assert cfg.SOLVER.loss_factor == [0.5, 0.5, 1]
    assert cfg.SOLVER.lr == 0.1  # '1e-1' string coerced to float
    assert cfg.SOLVER.lr_step == [50, 100]
    assert cfg.DATA.lead_num == 3
    assert cfg.DATA.super_mode == "IIv2v5_v4I_372"
    assert cfg.desc == "nef_net"


def test_synthetic_corpus_regenerates_on_size_change(tmp_path):
    """A resized synthetic_n_train must regenerate the corpus, not silently
    reuse the stale one behind the marker file."""
    cfg = get_cfg()
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.DATA.synthetic_n_train = 4
    cfg.DATA.synthetic_n_test = 2
    build_dataset(cfg, "train")
    with open(tmp_path / "synth" / "tianchi_train_jsons.txt") as f:
        assert sum(1 for l in f if l.strip()) == 4

    cfg2 = cfg.clone()
    cfg2.DATA.synthetic_n_train = 6
    build_dataset(cfg2, "train")
    with open(tmp_path / "synth" / "tianchi_train_jsons.txt") as f:
        assert sum(1 for l in f if l.strip()) == 6


def test_locked_lru_concurrent_and_frozen():
    """data/cache.py: hammered get/put from a thread pool keeps the LRU
    bounded and intact (the OrderedDict ops race without the lock), and put
    freezes ndarray values read-only."""
    from concurrent.futures import ThreadPoolExecutor

    from electrocardio_panorama_tpu.data.cache import LockedLRU

    lru = LockedLRU(64)

    def worker(seed):
        rng = np.random.default_rng(seed)
        for _ in range(500):
            k = int(rng.integers(200))
            v = lru.get(k)
            if v is None:
                v = lru.put(k, (np.full(4, k, np.float32), k))
            assert int(v[0][0]) == k == v[1]

    with ThreadPoolExecutor(8) as pool:
        list(pool.map(worker, range(8)))
    assert len(lru) <= 64
    frozen = lru.put("x", np.zeros(3))
    with pytest.raises(ValueError):
        frozen[0] = 1.0
    # maxsize<=0 disables caching and leaves values writable
    off = LockedLRU(0)
    v = off.put("k", np.zeros(2))
    v[0] = 1.0
    assert off.get("k") is None and len(off) == 0
