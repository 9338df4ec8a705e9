"""Contact with the REAL shipped data (the last un-oracled subsystem).

Two suites, both skipping cleanly when /root/reference is absent:

1. Oracle test: run the reference `EcgTianChiInterval` (torch-free numpy code,
   codes/dataset/tianchi.py:84-225) on the two real ECG records that ship
   inside the reference checkout (codes/data/tianchi/npy_data/
   tianchi_train_round1/{40723,11315}.npy + matching interval jsons) and
   assert this framework's pipeline produces the same deterministic meta
   fields — normalization, noise sigma, rois, lead partitions, padding — for
   the same (beat, target) draws, across every deterministic super_mode.

2. Corpus test: drive all 1000 released ManualAnnotation label files
   (PartitionLabels/Tianchi/ManualAnnotation/ManualAnnotation.zip, SURVEY.md
   section 2.1 #24) through annotation/schema.py validation and beat_rois,
   surfacing degenerate-beat edge cases the synthetic generator never makes.
"""

from __future__ import annotations

import json
import os
import random
import sys
import zipfile

import numpy as np
import pytest

REF = "/root/reference"
NPY_DIR = f"{REF}/codes/data/tianchi/npy_data/tianchi_train_round1"
INTERVAL_DIR = f"{REF}/codes/data/tianchi/tianchi_interval"
ZIP_PATH = f"{REF}/PartitionLabels/Tianchi/ManualAnnotation/ManualAnnotation.zip"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/codes"), reason="reference checkout not available"
)

RECORDS = ("40723.json", "11315.json")

# every rng-free lead-partition mode (SURVEY.md section 2.2); the 3-lead
# shipped config is input_fix so its partition is deterministic too
MODES = [
    (3, "IIv2v5_v4I_372", "input_fix"),
    (12, "_12120", ""),
    (9, "_972", ""),
    (8, "_8120", ""),
    (4, "_480", ""),
    (4, "_462", ""),
    (5, "_552", ""),
    (5, "_561", ""),
    (5, "_570", ""),
    (2, "_228", ""),
    (2, "_2100", ""),
    (1, "_1110", ""),
    (1, "_1101", ""),
    (1, "_192", ""),
]


class _Group:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_cfg(lead_num, super_mode, train_data_mode, label_txt):
    return _Group(
        DATA=_Group(
            train_label_path=label_txt,
            test_label_path=label_txt,
            train_data_root=NPY_DIR,
            train_label_root=INTERVAL_DIR,
            lead_num=lead_num,
            super_mode=super_mode,
            train_data_mode=train_data_mode,
        ),
        MODEL=_Group(jitter_factor=0.0),
    )


def _our_cfg(lead_num, super_mode, train_data_mode, label_txt):
    from electrocardio_panorama_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.dataset = "tianchi"
    cfg.DATA.train_label_path = label_txt
    cfg.DATA.test_label_path = label_txt
    cfg.DATA.train_data_root = NPY_DIR
    cfg.DATA.train_label_root = INTERVAL_DIR
    cfg.DATA.lead_num = lead_num
    cfg.DATA.super_mode = super_mode
    cfg.DATA.train_data_mode = train_data_mode
    cfg.MODEL.jitter_factor = 0.0
    return cfg


@pytest.fixture(scope="module")
def ref_dataset_cls():
    """Import the reference EcgTianChiInterval read-only (the declared oracle
    pattern, tools/make_goldens.py). The reference targets numpy<1.24
    (`np.float`/`np.int`, tianchi.py:86,214); shim the removed aliases for
    the import's lifetime and restore after the module tests finish."""
    sys.path.insert(0, f"{REF}/codes")
    had_f, had_i = hasattr(np, "float"), hasattr(np, "int")
    if not had_f:
        np.float = float  # numpy 2.x removed the alias the reference uses
    if not had_i:
        np.int = int
    try:
        from dataset.tianchi import EcgTianChiInterval

        yield EcgTianChiInterval
    finally:
        if not had_f:
            del np.float
        if not had_i:
            del np.int
        sys.path.remove(f"{REF}/codes")


@pytest.fixture(scope="module")
def label_txt(tmp_path_factory):
    p = tmp_path_factory.mktemp("real") / "records.txt"
    p.write_text("\n".join(RECORDS) + "\n")
    return str(p)


def _replay_choices(seed, n_beats, lead_num, super_mode, train_data_mode):
    """Clone the reference's `random` stream for one __getitem__: beat pick
    (tianchi.py:97), then — for the deterministic modes above — the target
    pick (tianchi.py:193). Returns (beat_index, target_index)."""
    from electrocardio_panorama_tpu.data.leads import (
        REST_EQUALS_SUPERVISION,
        lead_partition,
    )

    rr = random.Random(seed)
    beat_index = rr.sample(range(n_beats), 1)[0]
    if lead_num == 3:
        rr.randint(1, 2)  # drawn before the input_fix check (tianchi.py:128)
    select, supervision, _ = lead_partition(lead_num, super_mode, train_data_mode, None)
    if super_mode in REST_EQUALS_SUPERVISION:
        rest = list(supervision)
    else:
        rest = [x for x in supervision if x not in select]
    target_index = rr.sample(rest, 1)[0]
    return beat_index, target_index, select, rest


@pytest.mark.parametrize("mode", MODES, ids=[m[1] for m in MODES])
@pytest.mark.parametrize("rec_idx", [0, 1])
def test_reference_pipeline_oracle_on_real_records(
    ref_dataset_cls, label_txt, mode, rec_idx
):
    """The reference dataset code executing on the real shipped records is
    the oracle; our pipeline must reproduce every deterministic meta field."""
    from electrocardio_panorama_tpu.data.leads import LEAD_THETA
    from electrocardio_panorama_tpu.data.tianchi import TianchiBeatDataset

    lead_num, super_mode, tdm = mode
    seed = 1234 + rec_idx

    # ---- reference side: pinned random streams, capture the noise sigma
    captured = {}
    orig_normal = np.random.normal

    def capturing_normal(*a, **kw):
        if "scale" in kw and np.ndim(kw["scale"]) == 1:
            captured["noise_std"] = np.asarray(kw["scale"], np.float64)
        return orig_normal(*a, **kw)

    ref_ds = ref_dataset_cls(_ref_cfg(lead_num, super_mode, tdm, label_txt), "test")
    random.seed(seed)
    np.random.seed(seed)
    np.random.normal = capturing_normal
    try:
        meta_ref = ref_ds[rec_idx]
    finally:
        np.random.normal = orig_normal

    # ---- replay the reference's random picks
    with open(os.path.join(INTERVAL_DIR, RECORDS[rec_idx])) as f:
        label = json.load(f)
    n_beats = len(label["P on"]) - 1
    beat_index, target_index, select, rest = _replay_choices(
        seed, n_beats, lead_num, super_mode, tdm
    )
    unsup = list(meta_ref["unsupervision_lead_name"])

    # ---- our pipeline on the same (record, beat)
    ours = TianchiBeatDataset(_our_cfg(lead_num, super_mode, tdm, label_txt), "test")
    out12, sigma, beat_len, rois = ours._prep_beat(RECORDS[rec_idx], beat_index)

    # rois: exact integer equality with the reference's 7-segment table
    np.testing.assert_array_equal(rois, meta_ref["rois"])
    assert beat_len == int(meta_ref["rois"][5][1])

    # normalization + padding: the reference's padded ori_data is float64 of
    # the joint-min-max beat; ours is the f32 image of the same math
    np.testing.assert_allclose(
        out12, meta_ref["ori_data"].astype(np.float32), atol=2e-7
    )

    # per-lead noise sigma: captured from the reference's np.random.normal call
    assert "noise_std" in captured, "reference noise draw not captured"
    np.testing.assert_allclose(sigma, captured["noise_std"], rtol=1e-5, atol=1e-8)

    # lead partitions: input rows, thetas, rest ordering (unsup at the END),
    # target row — all pure index selections of the shared image
    np.testing.assert_allclose(meta_ref["data"], out12[select], atol=2e-7)
    np.testing.assert_allclose(
        meta_ref["input_theta"], LEAD_THETA[select].astype(np.float32)
    )
    np.testing.assert_allclose(
        meta_ref["rest_theta"], LEAD_THETA[rest + unsup].astype(np.float32)
    )
    np.testing.assert_allclose(meta_ref["rest_view"], out12[rest + unsup], atol=2e-7)
    np.testing.assert_allclose(meta_ref["target_view"], out12[target_index], atol=2e-7)
    np.testing.assert_allclose(
        meta_ref["target_theta"], LEAD_THETA[target_index].astype(np.float32)
    )

    # the full assembled meta from our __getitem__ path: same shapes/dtypes,
    # same deterministic partition fields (rng fields differ by stream design)
    mine = ours.get_beat(rec_idx, beat_index, np.random.default_rng(seed))
    for k in ("data", "rois", "input_theta", "target_view", "target_theta",
              "ori_data", "rest_view", "rest_theta", "noise"):
        assert mine[k].shape == np.asarray(meta_ref[k]).shape, k
    np.testing.assert_allclose(mine["ori_data"], out12)
    np.testing.assert_allclose(mine["input_theta"], meta_ref["input_theta"])
    assert mine["unsupervision_lead_name"] == unsup


def test_real_records_shapes(ref_dataset_cls):
    """The shipped records match the documented format: (8, 5000) int."""
    for rec in RECORDS:
        a = np.load(os.path.join(NPY_DIR, rec.replace(".json", ".npy")))
        assert a.shape == (8, 5000)
        assert np.issubdtype(a.dtype, np.integer)


# --------------------------------------------------------------------- corpus
# The audit of the released corpus (this suite is its executable record):
# of the 1000 label files, 2 are malformed JSON (missing list commas), 94
# have unequal breakpoint-list lengths (an annotator skipped a P/T wave), 2
# have breakpoints out of order within a beat, 2 have overlapping beats, and
# 1 indexes beyond the 5000-sample record — the reference dataset code would
# crash (zip misalignment) or slice negative-length segments on these.
# validate_breakpoints is the gate that keeps them out of the pipeline.
KNOWN_BAD_JSON = {"ManualAnnotation/2373.json", "ManualAnnotation/34480.json"}
EXPECTED_INVALID = 99
EXPECTED_CLEAN = 899


def _scan_corpus():
    from electrocardio_panorama_tpu.annotation.schema import validate_breakpoints

    z = zipfile.ZipFile(ZIP_PATH)
    names = [n for n in z.namelist() if n.endswith(".json")]
    bad_json, invalid, clean = [], [], []
    for n in names:
        try:
            bp = json.loads(z.read(n))
        except json.JSONDecodeError:
            bad_json.append(n)
            continue
        try:
            validate_breakpoints(bp, record_len=5000)
        except ValueError as e:
            invalid.append((n, str(e)))
            continue
        clean.append((n, bp))
    return names, bad_json, invalid, clean


@pytest.mark.skipif(not os.path.exists(ZIP_PATH), reason="label zip missing")
def test_manual_annotation_corpus():
    """Every released label file is either consumed or explicitly rejected by
    the schema gate; every CLEAN beat yields a contiguous non-negative
    7-segment ROI table (the telescoping invariant the ROI ops rely on)."""
    from electrocardio_panorama_tpu.annotation.schema import beats_in
    from electrocardio_panorama_tpu.data.beats import SEQ_LEN, beat_rois

    names, bad_json, invalid, clean = _scan_corpus()
    assert len(names) == 1000, f"expected 1000 label files, found {len(names)}"
    assert set(bad_json) == KNOWN_BAD_JSON
    assert len(invalid) == EXPECTED_INVALID, invalid[:5]
    assert len(clean) == EXPECTED_CLEAN

    n_beats = long_beats = zero_segs = 0
    for n, bp in clean:
        for b in range(beats_in(bp)):
            rois, p_on, end_point = beat_rois(bp, b, 5000)
            n_beats += 1
            # contiguity: segments share endpoints
            assert (rois[1:, 0] == rois[:-1, 1]).all(), (n, b)
            assert rois[0, 0] == 0 and rois[6, 1] == SEQ_LEN, (n, b)
            seg = rois[:6, 1] - rois[:6, 0]
            assert (seg >= 0).all(), (n, b, rois)
            zero_segs += int((seg == 0).any())
            long_beats += int(end_point - p_on > SEQ_LEN)
    assert n_beats == 10031
    # real-data facts the synthetic generator never makes: zero-length
    # segments exist, and 846 beats are longer than 512 (pipeline truncates)
    assert zero_segs > 0
    assert long_beats == 846


@pytest.mark.skipif(not os.path.exists(ZIP_PATH), reason="label zip missing")
def test_annotation_corpus_edge_beats_through_pipeline():
    """Push the corpus's EXTREME clean beats — shortest (137), longest (971,
    exercising the >512 truncation where rois keep raw beyond-SEQ_LEN values,
    tianchi.py:199-211), and a zero-length-segment beat — through the full
    prep + assemble pipeline AND the jitted ROI ops; the fixed-shape contract
    must absorb whatever the real labels contain."""
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.data.beats import beat_rois, build_meta
    from electrocardio_panorama_tpu.ops.roi import roi_align_1d, roi_reverse_1d

    _, _, _, clean = _scan_corpus()
    stats = []  # (beat_len, min_seg, name, beat, bp)
    for n, bp in clean:
        for b in range(len(bp["P on"]) - 1):
            rois, p_on, end = beat_rois(bp, b, 5000)
            seg = rois[:6, 1] - rois[:6, 0]
            stats.append((end - p_on, int(seg.min()), n, b, bp))
    stats.sort(key=lambda s: s[0])
    extremes = [stats[0], stats[-1], min(stats, key=lambda s: s[1])]
    assert extremes[0][0] == 137 and extremes[1][0] == 971
    assert extremes[2][1] == 0

    cfg = get_cfg()
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    rng = np.random.default_rng(0)
    sig = rng.integers(-400, 400, size=(12, 5000)).astype(np.float64)
    for beat_len, min_seg, name, b, bp in extremes:
        rois, p_on, end = beat_rois(bp, b, 5000)
        meta = build_meta(
            sig[:, p_on:end], rois, cfg=cfg, phase="test",
            rng=np.random.default_rng(1), record_id=name,
        )
        assert meta["data"].shape == (3, 512)
        assert meta["ori_data"].shape == (12, 512)
        assert np.isfinite(meta["data"]).all(), (name, b)
        assert np.isfinite(meta["noise"]).all(), (name, b)
        # the model-side ROI ops on these real rois: finite, fixed shapes
        feat = jnp.asarray(rng.normal(size=(1, 8, 128)), jnp.float32)
        r = jnp.asarray(meta["rois"], jnp.float32)[None]
        a = roi_align_1d(feat, r, size=16, spatial_scale=0.25)
        assert a.shape == (1, 8, 7, 16)
        assert bool(jnp.isfinite(a).all()), (name, b)
        back = roi_reverse_1d(a.reshape(1, 8, 7, 16).repeat(2, axis=-1), r)
        assert back.shape == (1, 8, 128)
        assert bool(jnp.isfinite(back).all()), (name, b)


def test_real_records_train_eval_render_end_to_end(tmp_path):
    """VERDICT r4 item 5: the model/solver consumes REAL ECG beats
    end-to-end — a short overfit train on the two shipped records through
    the production Solver, a val pass producing PSNR/SSIM, and a panorama
    render from a real beat. (The full on-chip artifact lives in
    docs/real_overfit/ via tools/real_overfit.py; this is the always-on
    miniature.)"""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from real_overfit import build_cfg
    finally:
        sys.path.pop(0)
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
    from electrocardio_panorama_tpu.synthesis import PanoramaGenerator, theta_grid
    from electrocardio_panorama_tpu.training.solver import Solver
    from electrocardio_panorama_tpu.utils import seed_everything

    cfg = build_cfg(str(tmp_path), epochs=2)
    cfg.DATA.batch_size = 4
    cfg.DATA.num_workers = 2
    cfg.TPU.steps_per_epoch = 1
    seed_everything(cfg.seed)
    train_ds = build_dataset(cfg, phase="train")
    test_ds = build_dataset(cfg, phase="test")
    assert len(train_ds) == 512  # 2 records x REPEAT=256
    train_dl = BeatLoader(train_ds, 4, shuffle=True, drop_last=True, seed=0,
                          num_threads=2)
    test_dl = BeatLoader(test_ds, 4, shuffle=False, drop_last=True, seed=1,
                         num_threads=2)
    solver = Solver(cfg, use_writer=False)
    solver.train(train_dl, test_dl)

    met = solver.val(test_dl, epoch=-1)
    for k, v in met.items():
        assert np.isfinite(v), (k, v)
    assert met["psnr_gen"] > 0  # PSNR of a finite non-degenerate render

    # panorama from a real beat through the production generator
    ckpt_params, ckpt_bn, _, _ = solver._checkpointer().load(best_valid=True)
    model = solver.model
    gen = PanoramaGenerator(model, ckpt_params, ckpt_bn,
                            compute_dtype=jnp.float32)
    batch = next(iter(test_dl))
    views = theta_grid(3, 4)
    pano = gen.render(
        jnp.asarray(batch["data"][:1]), jnp.asarray(batch["input_theta"][:1]),
        jnp.asarray(batch["rois"][:1]), jnp.asarray(views),
    )
    assert pano.shape == (1, 12, 512)
    assert np.isfinite(np.asarray(pano)).all()
