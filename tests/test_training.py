"""Training runtime: jitted step, checkpoint round-trip, resume, LR schedule."""

import os

import numpy as np
import pytest
import jax

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
from electrocardio_panorama_tpu.training import CheckPointer, lr_for_epoch
from electrocardio_panorama_tpu.training.solver import Solver, gen_lead_count


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.desc = "smoke"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 4
    cfg.MODEL.model = "model_nefnet"
    cfg.MODEL.jitter_factor = 2.5
    cfg.SOLVER.epochs = 2
    cfg.SOLVER.lr = 0.05
    cfg.SOLVER.scheduler = "MultiStep"
    cfg.SOLVER.lr_step = [50, 100]
    cfg.SOLVER.loss_factor = [0.5, 0.5, 1]
    cfg.TPU.steps_per_epoch = 2
    cfg.DATA.synthetic_root = str(tmp_path_factory.mktemp("synth"))
    cfg.output_dir = str(tmp_path_factory.mktemp("out"))
    return cfg


def test_lr_schedule(cfg):
    assert lr_for_epoch(cfg, 0) == pytest.approx(0.05)
    assert lr_for_epoch(cfg, 50) == pytest.approx(0.005)
    assert lr_for_epoch(cfg, 100) == pytest.approx(0.0005)
    c2 = get_cfg()
    c2.SOLVER.lr = 1.0
    c2.SOLVER.scheduler = "steplr"
    assert lr_for_epoch(c2, 49) == pytest.approx(1.0)
    assert lr_for_epoch(c2, 51) == pytest.approx(0.1)


def test_gen_lead_count(cfg):
    assert gen_lead_count(cfg) == 2  # 'IIv2v5_v4I_372' ends in 2
    c = get_cfg()
    assert gen_lead_count(c) == 4  # 'normal'


def test_train_two_epochs_and_resume(cfg):
    train_ds = build_dataset(cfg, "train")
    test_ds = build_dataset(cfg, "test")
    dl_tr = BeatLoader(train_ds, cfg.DATA.batch_size, shuffle=True, drop_last=True, seed=1)
    dl_te = BeatLoader(test_ds, cfg.DATA.batch_size, shuffle=False, drop_last=True, seed=2)

    solver = Solver(cfg, use_writer=False)
    params, bn_state = solver.train(dl_tr, dl_te)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(params))

    out_dir = os.path.join(cfg.output_dir, cfg.desc)
    assert os.path.exists(os.path.join(out_dir, "epoch_1.pkl"))
    assert os.path.exists(os.path.join(out_dir, "last_checkpoint"))
    assert os.path.exists(os.path.join(out_dir, "best_valid.pkl"))

    # resume: third epoch picks up at epoch 2
    cfg.SOLVER.epochs = 3
    solver2 = Solver(cfg, use_writer=False)
    ckpt = CheckPointer(out_dir)
    loaded = ckpt.load()
    assert loaded is not None
    _, _, _, extras = loaded
    assert extras["epoch"] == 1
    solver2.train(dl_tr, dl_te)
    assert os.path.exists(os.path.join(out_dir, "epoch_2.pkl"))

    # val: loads best checkpoint and reports the four metrics
    m = solver2.val(dl_te, epoch=-1)
    assert np.isfinite(m["psnr_gen"]) and np.isfinite(m["ssim_gen"])


def test_run_lock_rejects_second_trainer(cfg, tmp_path):
    """Two trainers on one output_dir must fail fast, not interleave
    checkpoints/scalars (observed live: a surviving half-killed trainer and
    a fresh resume corrupted the scalar history). The lock releases when
    train() exits, so sequential train->resume in one process still works
    (test_train_two_epochs_and_resume)."""
    c = cfg.clone()
    c.output_dir = str(tmp_path)
    a = Solver(c, use_writer=False)
    b = Solver(c, use_writer=False)
    lock = a._acquire_run_lock()
    assert lock is not None
    with pytest.raises(RuntimeError, match="another trainer"):
        b._acquire_run_lock()
    lock.close()  # release -> a fresh trainer may start
    lock2 = b._acquire_run_lock()
    assert lock2 is not None
    lock2.close()


def test_empty_epoch_warns_not_silent_zero(cfg, tmp_path, capsys):
    """A batch_size larger than the split makes drop_last swallow every
    sample; the epoch must warn instead of reporting 0.0 loss as if it
    trained (hit live with a batch_size 32 override on the 24-sample
    synthetic corpus)."""
    c = cfg.clone()
    c.DATA.batch_size = 10_000
    c.output_dir = str(tmp_path)
    train_ds = build_dataset(c, "train")
    dl = BeatLoader(train_ds, c.DATA.batch_size, shuffle=True,
                    drop_last=True, seed=1)
    s = Solver(c, use_writer=False)
    params, bn_state = s.model.init(jax.random.PRNGKey(0))
    out = s.run_one_epoch(dl, "train", epoch=0, params=params,
                          bn_state=bn_state, opt_state=s.tx.init(params),
                          rng=jax.random.PRNGKey(1))
    assert out["losses"].size == 0
    assert "produced 0 batches" in capsys.readouterr().out


def test_nan_guard_raises_with_step_context(cfg):
    """Failure detection: a non-finite step loss must surface as a
    FloatingPointError naming the offending step and the resume path. The
    guard runs once per epoch on the stacked device-resident losses (no
    per-step device sync), so a step-2 NaN is reported at epoch end."""
    train_ds = build_dataset(cfg, "train")
    dl_tr = BeatLoader(train_ds, cfg.DATA.batch_size, shuffle=True, drop_last=True, seed=1)
    c = cfg.clone()
    c.TPU.steps_per_epoch = 4
    solver = Solver(c, use_writer=False)
    params, bn_state = solver.model.init(jax.random.PRNGKey(0))
    calls = {"n": 0}

    def poisoned_step(params, bn_state, opt_state, epoch_rng, step_i, i1, i2, *arrays):
        lvec = np.full((4,), np.nan, np.float32) if calls["n"] == 2 else np.zeros((4,), np.float32)
        calls["n"] += 1
        return params, bn_state, opt_state, lvec

    solver._train_step = poisoned_step
    with pytest.raises(FloatingPointError, match="step 2"):
        solver.run_one_epoch(
            dl_tr, "train", epoch=0, params=params, bn_state=bn_state,
            opt_state={}, rng=jax.random.PRNGKey(1),
        )
    assert calls["n"] == 4  # guard fires at epoch end, not mid-epoch


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_rng_impl_train_determinism(cfg, tmp_path, impl):
    """Both TPU.rng_impl choices train to finite params, deterministically
    per seed (two identical runs produce identical parameters)."""
    train_ds = build_dataset(cfg, "train")
    test_ds = build_dataset(cfg, "test")

    def run(tag):
        c = cfg.clone()
        c.desc = f"rng_{impl}_{tag}"
        c.output_dir = str(tmp_path / tag)
        c.SOLVER.epochs = 1
        c.TPU.rng_impl = impl
        dl_tr = BeatLoader(train_ds, c.DATA.batch_size, shuffle=True, drop_last=True, seed=1)
        dl_te = BeatLoader(test_ds, c.DATA.batch_size, shuffle=False, drop_last=True, seed=2)
        return Solver(c, use_writer=False).train(dl_tr, dl_te)[0]

    p1, p2 = run("a"), run("b")
    for k in p1:
        v = np.asarray(p1[k])
        assert np.isfinite(v).all(), k
        np.testing.assert_array_equal(v, np.asarray(p2[k]), err_msg=k)


def test_rng_impl_unknown_raises(cfg, tmp_path):
    c = cfg.clone()
    c.output_dir = str(tmp_path)
    c.TPU.rng_impl = "philox"
    with pytest.raises(ValueError, match="rng_impl"):
        Solver(c, use_writer=False)._train_rng()


def test_explicit_resume_path_must_exist(tmp_path):
    """A mistyped MODEL.resume must raise, not silently train from scratch
    (a silent fallback once truncated a run's committed scalar history)."""
    ck = CheckPointer(str(tmp_path))
    assert ck.load(None) is None  # auto-resume with nothing saved is fine
    with pytest.raises(FileNotFoundError, match="resume"):
        ck.load(str(tmp_path / "epoch_123.pkl"))


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    ckpt = CheckPointer(str(tmp_path))
    params = {"a.weight": jnp.ones((3, 3)), "b.bias": jnp.zeros((5,))}
    state = {"bn.running_mean": jnp.full((4,), 2.0)}
    ckpt.save("epoch_0", params=params, bn_state=state, epoch=0, psnr_gen=11.5)
    loaded = ckpt.load()
    p2, s2, opt2, extras = loaded
    np.testing.assert_array_equal(np.asarray(p2["a.weight"]), np.ones((3, 3)))
    np.testing.assert_array_equal(np.asarray(s2["bn.running_mean"]), np.full((4,), 2.0))
    assert extras["epoch"] == 0 and extras["psnr_gen"] == 11.5


def test_checkpoint_loads_reference_torch_pkl(tmp_path):
    """The reference's torch.save .pkl checkpoints load transparently."""
    import torch

    sd = {
        "mlp1.weight": torch.randn(128, 12),
        "decoder.1.double_conv.1.running_mean": torch.zeros(128),
    }
    torch.save({"model": sd, "epoch": 7}, str(tmp_path / "best_valid.pkl"))
    ckpt = CheckPointer(str(tmp_path))
    loaded = ckpt.load(best_valid=True)
    params, state, opt, extras = loaded
    assert "mlp1.weight" in params
    assert "decoder.1.double_conv.1.running_mean" in state
    assert extras["epoch"] == 7


def test_export_torch_pkl_roundtrip(tmp_path):
    """Export (this framework -> reference torch .pkl) must be the exact
    inverse of the importer: re-importing the exported file reproduces the
    param/state pytrees bit-for-bit, the payload carries extras like the
    reference CheckPointer's, and integer BN counters stay integer (torch
    load_state_dict requires Long num_batches_tracked). The strict-load +
    forward-parity check against the actual reference model lives in
    tools/export_torch_ckpt.py --check."""
    import torch

    from electrocardio_panorama_tpu.models import NefNetDef
    from electrocardio_panorama_tpu.training.torch_import import export_torch_pkl

    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "exported.pkl")
    export_torch_pkl(path, params, state, epoch=9, best_test_psnr_gen=21.5)

    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["epoch"] == 9 and payload["best_test_psnr_gen"] == 21.5
    counters = [k for k in payload["model"] if k.endswith("num_batches_tracked")]
    assert counters and all(payload["model"][k].dtype == torch.int64 for k in counters)

    ckpt = CheckPointer(str(tmp_path))
    p2, s2, _, extras = ckpt.load(resume=path)
    assert extras["epoch"] == 9
    assert set(p2) == set(params) and set(s2) == set(state)
    for k in params:
        np.testing.assert_array_equal(np.asarray(p2[k]), np.asarray(params[k]), err_msg=k)
    for k in state:
        np.testing.assert_array_equal(np.asarray(s2[k]), np.asarray(state[k]), err_msg=k)


def test_solver_with_mesh_dp(tmp_path):
    """Solver GSPMD data-parallel path (cfg.TPU.mesh_shape): params replicated,
    batch sharded over the 8-device mesh — the dense_sweep_v5e8.yml route."""
    cfg = get_cfg()
    cfg.desc = "meshsmoke"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 8
    cfg.MODEL.model = "model_nefnet"
    cfg.SOLVER.epochs = 1
    cfg.SOLVER.lr = 0.01
    cfg.TPU.steps_per_epoch = 1
    cfg.TPU.mesh_shape = [8]
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")

    train_ds = build_dataset(cfg, "train")
    test_ds = build_dataset(cfg, "test")
    dl_tr = BeatLoader(train_ds, cfg.DATA.batch_size, shuffle=True, drop_last=True, seed=1)
    dl_te = BeatLoader(test_ds, cfg.DATA.batch_size, shuffle=False, drop_last=True, seed=2)
    solver = Solver(cfg, use_writer=False)
    assert solver.mesh is not None and solver.mesh.devices.size == 8
    params, bn = solver.train(dl_tr, dl_te)
    import jax

    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(params))


def test_solver_mesh_too_large_raises(tmp_path):
    cfg = get_cfg()
    cfg.desc = "debug"
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    cfg.TPU.mesh_shape = [64]
    cfg.output_dir = str(tmp_path)
    with pytest.raises(ValueError, match="devices"):
        Solver(cfg, use_writer=False)


def test_best_tracking_survives_resume_from_non_best_epoch(tmp_path):
    """Every epoch checkpoint carries best_test_psnr_gen, so resuming from a
    non-best epoch cannot regress best_valid.pkl (reference solver.py:105-116
    keeps it in the reused save_arguments dict)."""
    import jax.numpy as jnp

    ckpt = CheckPointer(str(tmp_path))
    params = {"w": jnp.ones(2)}
    # simulate: epoch 5 was best (psnr 25); epoch 9 saved later with worse psnr
    ckpt.save("best_valid", params=params, bn_state={}, epoch=5,
              psnr_gen=25.0, best_test_psnr_gen=25.0)
    ckpt.save("epoch_9", params=params, bn_state={}, epoch=9,
              psnr_gen=20.0, best_test_psnr_gen=25.0)
    # resume reads last_checkpoint -> epoch_9; best must still be 25
    _, _, _, extras = ckpt.load()
    assert extras["epoch"] == 9
    assert extras["best_test_psnr_gen"] == 25.0


def test_synthetic_config_produces_eval_batches(tmp_path):
    """The shipped nef_net_synthetic.yml must yield >= 1 test batch so metrics
    and best_valid.pkl actually materialize (regression for a zero-eval-batch
    corpus/batch-size mismatch)."""
    from electrocardio_panorama_tpu.config import load_cfg

    cfg = load_cfg("configs/nef_net_synthetic.yml")
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")
    ds = build_dataset(cfg, "test")
    dl = BeatLoader(ds, cfg.DATA.batch_size, shuffle=False, drop_last=True, seed=0)
    assert len(dl) >= 1, (len(ds), cfg.DATA.batch_size)


def test_orbax_checkpointer_roundtrip(tmp_path):
    """Orbax backend: same save/load contract as the pickle CheckPointer."""
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.training.checkpoint import OrbaxCheckPointer

    ckpt = OrbaxCheckPointer(str(tmp_path))
    params = {"mlp1.weight": jnp.ones((4, 3)), "decoder.4.bias": jnp.zeros((1,))}
    state = {"decoder.1.double_conv.1.running_mean": jnp.full((5,), 3.0)}
    ckpt.save("epoch_0", params=params, bn_state=state, epoch=0, psnr_gen=12.5)
    p2, s2, opt2, extras = ckpt.load()
    np.testing.assert_array_equal(np.asarray(p2["mlp1.weight"]), np.ones((4, 3)))
    np.testing.assert_array_equal(
        np.asarray(s2["decoder.1.double_conv.1.running_mean"]), np.full((5,), 3.0)
    )
    assert extras["epoch"] == 0 and extras["psnr_gen"] == 12.5

    # best_valid resolution + pointer dispatch
    ckpt.save("best_valid", params=params, bn_state=state, epoch=1,
              best_test_psnr_gen=13.0)
    loaded = ckpt.load(best_valid=True)
    assert loaded is not None and loaded[3]["best_test_psnr_gen"] == 13.0

    # a pickle checkpoint in the same dir still loads through the orbax class
    base = CheckPointer(str(tmp_path))
    base.save("epoch_1", params=params, bn_state=state, epoch=1)
    p3, _, _, e3 = ckpt.load()  # pointer now names the .pkl
    assert e3["epoch"] == 1


def test_solver_orbax_backend_train_and_val(tmp_path):
    """End-to-end train/resume/val with TPU.checkpoint_backend='orbax'."""
    cfg = get_cfg()
    cfg.desc = "orbaxsmoke"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 4
    cfg.MODEL.model = "model_nefnet"
    cfg.SOLVER.epochs = 1
    cfg.SOLVER.lr = 0.01
    cfg.TPU.steps_per_epoch = 1
    cfg.TPU.checkpoint_backend = "orbax"
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")

    ds_tr = build_dataset(cfg, "train")
    ds_te = build_dataset(cfg, "test")
    dl_tr = BeatLoader(ds_tr, 4, shuffle=True, drop_last=True, seed=1)
    dl_te = BeatLoader(ds_te, 4, shuffle=False, drop_last=True, seed=2)
    solver = Solver(cfg, use_writer=False)
    solver.train(dl_tr, dl_te)
    out_dir = os.path.join(cfg.output_dir, cfg.desc)
    assert os.path.isdir(os.path.join(out_dir, "epoch_0.orbax"))
    assert os.path.isdir(os.path.join(out_dir, "best_valid.orbax"))
    m = solver.val(dl_te, epoch=-1)
    assert np.isfinite(m["psnr_gen"])


def test_strip_module_prefix():
    """DataParallel 'module.' prefixes strip on import (checkpointer.py:73-91)."""
    import torch

    from electrocardio_panorama_tpu.training.torch_import import import_torch_state_dict

    sd = {"module.mlp1.weight": torch.ones(2, 2), "module.mlp1.bias": torch.zeros(2)}
    params, state = import_torch_state_dict(sd)
    assert set(params) == {"mlp1.weight", "mlp1.bias"}
    # mixed prefixes must NOT strip (same rule as the reference)
    sd2 = {"module.a.weight": torch.ones(1), "b.weight": torch.ones(1)}
    params2, _ = import_torch_state_dict(sd2)
    assert "module.a.weight" in params2


def test_scalar_writer_jsonl(tmp_path):
    import json

    from electrocardio_panorama_tpu.utils import ScalarWriter

    w = ScalarWriter(str(tmp_path), use_tensorboard=False)
    w.write({"psnr_gen": 21.5, "train_loss_all": 0.1}, step=3)
    w.close()
    rows = [json.loads(ln) for ln in open(tmp_path / "scalars.jsonl")]
    assert rows[0]["step"] == 3 and rows[0]["psnr_gen"] == 21.5


def test_scalar_writer_prune_from_keeps_one_clean_run(tmp_path):
    """prune_from drops stale rows at/after the first epoch about to run, so
    a resume (or a from-scratch re-run into the same output_dir) never leaves
    duplicate-epoch mixed-provenance rows in scalars.jsonl."""
    import json

    from electrocardio_panorama_tpu.utils import ScalarWriter

    w = ScalarWriter(str(tmp_path), use_tensorboard=False)
    for e in range(6):
        w.write({"psnr_gen": float(e)}, step=e)
    w.close()

    # resume from epoch 3: rows 3..5 are a diverged earlier future -> dropped
    w = ScalarWriter(str(tmp_path), use_tensorboard=False)
    w.prune_from(3)
    for e in (3, 4):
        w.write({"psnr_gen": 10.0 + e}, step=e)
    w.close()
    rows = [json.loads(ln) for ln in open(tmp_path / "scalars.jsonl")]
    assert [r["step"] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[3]["psnr_gen"] == 13.0  # the new process's row, not the stale one

    # fresh start into the same dir truncates entirely
    w = ScalarWriter(str(tmp_path), use_tensorboard=False)
    w.prune_from(0)
    w.write({"psnr_gen": 99.0}, step=0)
    w.close()
    rows = [json.loads(ln) for ln in open(tmp_path / "scalars.jsonl")]
    assert [r["step"] for r in rows] == [0] and rows[0]["psnr_gen"] == 99.0

    # the None writer no-ops
    ScalarWriter(None).prune_from(5)


def test_solver_paint(tmp_path):
    """Waveform-grid PNG dumps (reference paint, solver.py:247-277)."""
    cfg = get_cfg()
    cfg.desc = "debug"
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    cfg.output_dir = str(tmp_path)
    solver = Solver(cfg, use_writer=False)
    rng = np.random.default_rng(0)
    target = rng.uniform(0, 1, (2, 512))
    pred = rng.uniform(0, 1, (2, 512))
    inputs = rng.uniform(0, 1, (2, 3, 512))
    solver.paint(target, pred, inputs, epoch=0, flag="train")
    out_dir = os.path.join(solver.output_dir, "0_train")
    assert sorted(os.listdir(out_dir)) == ["0.png", "1.png"]
    assert os.path.getsize(os.path.join(out_dir, "0.png")) > 1000


def test_solver_paint_side_by_side(tmp_path):
    """paint_for_other_method / paint_for_mit (reference solver.py:279-327 —
    the two are byte-identical there, so they share one implementation)."""
    cfg = get_cfg()
    cfg.desc = "debug"
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    cfg.output_dir = str(tmp_path)
    solver = Solver(cfg, use_writer=False)
    assert Solver.paint_for_mit is Solver.paint_for_other_method
    rng = np.random.default_rng(0)
    target = rng.uniform(0, 1, (2, 7, 512))
    pred = rng.uniform(0, 1, (2, 7, 512))
    solver.paint_for_other_method(target, pred, epoch=1, flag="test")
    out_dir = os.path.join(solver.output_dir, "1_test")
    assert sorted(os.listdir(out_dir)) == ["0.png", "1.png"]
    assert os.path.getsize(os.path.join(out_dir, "0.png")) > 1000


def test_whole_sequence_metric_predicate():
    """The whole-sequence branch triggers for dataset 'mit', super_mode
    '_mit', and any super_mode ending in '0' (reference solver.py:200-201)."""
    from electrocardio_panorama_tpu.training.solver import whole_sequence_metrics

    cfg = get_cfg()
    cfg.DATA.dataset = "tianchi"
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    assert not whole_sequence_metrics(cfg)
    cfg.DATA.super_mode = "_1110"
    assert whole_sequence_metrics(cfg)
    cfg.DATA.super_mode = "_mit"
    assert whole_sequence_metrics(cfg)
    cfg.DATA.super_mode = "normal"
    assert not whole_sequence_metrics(cfg)
    cfg.DATA.dataset = "mit"
    assert whole_sequence_metrics(cfg)


def test_eval_whole_sequence_metric_branch(tmp_path):
    """super_mode ending in '0' (e.g. _1110) has no unseen leads: psnr_gen ==
    psnr_reg, computed over the WHOLE sequence without rois (reference
    solver.py:200-206)."""
    cfg = get_cfg()
    cfg.desc = "whole0"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 1
    cfg.DATA.super_mode = "_1110"
    cfg.DATA.train_data_mode = "normal"
    cfg.DATA.batch_size = 4
    cfg.MODEL.model = "model_nefnet"
    cfg.SOLVER.epochs = 1
    cfg.TPU.steps_per_epoch = 1
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")

    assert gen_lead_count(cfg) == 0
    ds = build_dataset(cfg, "test")
    dl = BeatLoader(ds, 4, shuffle=False, drop_last=True, seed=2)
    solver = Solver(cfg, use_writer=False)
    import jax

    params, bn = solver.model.init(jax.random.PRNGKey(0))
    te = solver.run_one_epoch(dl, "test", epoch=0, params=params, bn_state=bn)
    met = te["metrics"].mean(axis=0)
    assert met[0] == met[1]  # psnr_gen == psnr_reg
    assert met[2] == met[3]  # ssim_gen == ssim_reg
    assert np.isfinite(met).all()
    assert te["singlelead"] is None  # no per-lead gen metrics in this branch


def test_mixed_precision_train_step(cfg, tmp_path):
    """TPU.compute_dtype='bfloat16': forward/backward run bf16 while master
    params, optimizer state, and BN running stats stay f32, and the update
    tracks the f32 step closely on the same batch."""
    import jax.numpy as jnp

    mcfg = cfg.clone()
    mcfg.output_dir = str(tmp_path)
    mcfg.desc = "mixed"
    mcfg.SOLVER.epochs = 1

    train_ds = build_dataset(mcfg, "train")
    dl = BeatLoader(train_ds, mcfg.DATA.batch_size, shuffle=False, drop_last=True, seed=3)
    batch = next(iter(dl))
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )

    def one_step(c):
        s = Solver(c, use_writer=False)
        params, bn_state = s.model.init(jax.random.PRNGKey(0))
        opt_state = s.tx.init(params)
        return s._train_step(
            params, bn_state, opt_state, jax.random.PRNGKey(1), np.int32(0),
            jnp.asarray(0), jnp.asarray(1), *args,
        )

    f32cfg = mcfg.clone()
    p32, bn32, _, l32 = one_step(f32cfg)

    mcfg.TPU.compute_dtype = "bfloat16"
    p16, bn16, _, l16 = one_step(mcfg)

    # master state stays f32
    assert all(
        v.dtype == np.float32
        for v in jax.tree.leaves(p16)
        if np.issubdtype(v.dtype, np.floating)
    )
    assert all(
        v.dtype == np.float32
        for v in jax.tree.leaves(bn16)
        if np.issubdtype(v.dtype, np.floating)
    )
    l32, l16 = np.asarray(l32), np.asarray(l16)
    assert np.isfinite(l16).all()
    # bf16 forward/backward lands near the f32 step on the same batch
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.05
    d32 = np.concatenate([np.ravel(v) for _, v in sorted(p32.items())])
    d16 = np.concatenate([np.ravel(v) for _, v in sorted(p16.items())])
    assert np.corrcoef(d32, d16)[0, 1] > 0.999


def test_eval_step_fused_decoder_matches_xla(cfg):
    """TPU.eval_decoder='fused' rides the Pallas kernel (interpret mode on
    CPU) for the rest-view sweep; metrics must match the XLA decoder path."""
    import copy

    ds = build_dataset(cfg, "test")
    dl = list(BeatLoader(ds, 4, shuffle=False, drop_last=True, seed=3))[:1]

    cfg_x = copy.deepcopy(cfg)
    cfg_x.TPU.eval_decoder = "xla"
    cfg_f = copy.deepcopy(cfg)
    cfg_f.TPU.eval_decoder = "fused"
    sx = Solver(cfg_x, use_writer=False)
    sf = Solver(cfg_f, use_writer=False)
    params, bn = sx.model.init(jax.random.PRNGKey(0))

    tx = sx.run_one_epoch(dl, "test", epoch=0, params=params, bn_state=bn)
    tf = sf.run_one_epoch(dl, "test", epoch=0, params=params, bn_state=bn)
    np.testing.assert_allclose(tx["metrics"], tf["metrics"], atol=1e-3)
    np.testing.assert_allclose(tx["losses"], tf["losses"], atol=1e-3)
    np.testing.assert_allclose(tx["singlelead"], tf["singlelead"], atol=1e-3)


def test_train_step_fused_encoder(cfg, tmp_path):
    """TPU.train_encoder='fused': the train step rides the fused Pallas
    encoder (forward + custom-VJP backward) end to end. Dropout streams
    differ from the XLA path by design (masks are drawn in kernel layout),
    so the step is compared statistically: finite loss, same loss scale,
    highly correlated parameter update. Elementwise gradient parity under
    IDENTICAL masks is pinned by tests/test_pallas_encoder.py."""
    import jax.numpy as jnp

    mcfg = cfg.clone()
    mcfg.output_dir = str(tmp_path)
    mcfg.desc = "fusedenc"
    mcfg.SOLVER.epochs = 1
    mcfg.DATA.batch_size = 8  # fused encoder batch tile constraint

    train_ds = build_dataset(mcfg, "train")
    dl = BeatLoader(train_ds, mcfg.DATA.batch_size, shuffle=False, drop_last=True, seed=3)
    batch = next(iter(dl))
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )

    def one_step(c):
        s = Solver(c, use_writer=False)
        params, bn_state = s.model.init(jax.random.PRNGKey(0))
        opt_state = s.tx.init(params)
        return s._train_step(
            params, bn_state, opt_state, jax.random.PRNGKey(1), np.int32(0),
            jnp.asarray(0), jnp.asarray(1), *args,
        )

    px, _, _, lx = one_step(mcfg.clone())

    fcfg = mcfg.clone()
    fcfg.TPU.train_encoder = "fused"
    pf, _, _, lf = one_step(fcfg)

    lx, lf = np.asarray(lx), np.asarray(lf)
    assert np.isfinite(lf).all()
    assert abs(lf[0] - lx[0]) / abs(lx[0]) < 0.2  # same scale, masks differ
    dx = np.concatenate([np.ravel(v) for _, v in sorted(px.items())])
    df = np.concatenate([np.ravel(v) for _, v in sorted(pf.items())])
    assert np.corrcoef(dx, df)[0, 1] > 0.99


def test_train_encoder_unknown_raises(cfg, tmp_path):
    bad = cfg.clone()
    bad.output_dir = str(tmp_path)
    bad.TPU.train_encoder = "nope"
    with pytest.raises(ValueError, match="train_encoder"):
        Solver(bad, use_writer=False)


def test_train_encoder_auto_resolution(cfg, tmp_path):
    """'auto' (the default) rides the fused encoder only where it measured
    faster — real accelerator + bf16 + model_nefnet — and resolves to 'xla'
    everywhere else. On the CPU test backend it must therefore ALWAYS pick
    'xla' (the kernel would run interpreted), for both compute dtypes."""
    c = cfg.clone()
    c.output_dir = str(tmp_path)
    assert c.TPU.train_encoder == "auto"  # the shipped default
    s = Solver(c, use_writer=False)
    assert s._train_encoder_mode(mixed=True) == "xla"  # CPU backend
    assert s._train_encoder_mode(mixed=False) == "xla"

    # the measured-win regime is gated on backend, dtype, AND model: with a
    # non-CPU backend 'auto' picks fused only for bf16 model_nefnet
    import unittest.mock as mock

    fake = mock.MagicMock()
    fake.platform = "tpu"
    with mock.patch("jax.devices", return_value=[fake]):
        assert s._train_encoder_mode(mixed=True) == "fused"
        assert s._train_encoder_mode(mixed=False) == "xla"
        s.cfg.MODEL.model = "model_nefnet2"
        assert s._train_encoder_mode(mixed=True) == "xla"
        s.cfg.MODEL.model = "model_nefnet"

    # explicit settings pass through untouched
    s.cfg.TPU.train_encoder = "fused"
    assert s._train_encoder_mode(mixed=True) == "fused"
    s.cfg.TPU.train_encoder = "xla"
    assert s._train_encoder_mode(mixed=True) == "xla"
