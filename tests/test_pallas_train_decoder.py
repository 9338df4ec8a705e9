"""Fused TRAINING decoder (ops/pallas/decoder_train.py) vs the XLA grouped
three-decode: forward outputs, BN batch/running stats, and GRADIENTS (the
custom VJP's recomputing backward kernel), in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from electrocardio_panorama_tpu.models.nefnet import (
    decoder_apply,
    init_nefnet,
)
from electrocardio_panorama_tpu.ops.pallas.decoder_train import (
    make_train_decode_fn,
)

B = 4  # per-group batch


@pytest.fixture(scope="module")
def setup():
    params, state = init_nefnet(jax.random.PRNGKey(0), lead_num=3)
    state = {k: (v + 0.3 if v.dtype != np.int32 else v) for k, v in state.items()}
    rng = np.random.default_rng(5)
    stacked = jnp.asarray(rng.normal(0, 0.5, (3 * B, 256, 128)).astype(np.float32))
    return params, state, stacked


def _xla_ref(params, state, stacked):
    o, u = decoder_apply(params, state, stacked, train=True, bn_groups=3)
    return jax.nn.sigmoid(o / 3.0).reshape(3, B, 1, 512), u


def test_forward_and_stats_match_xla_grouped(setup):
    params, state, stacked = setup
    ref_out, ref_u = _xla_ref(params, state, stacked)
    fn = make_train_decode_fn(interpret=True)
    out, u = fn(params, state, stacked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=3e-6)
    for k in ref_u:
        np.testing.assert_allclose(
            np.asarray(u[k]), np.asarray(ref_u[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_gradients_match_xla_grouped(setup):
    params, state, stacked = setup
    dkeys = [k for k in params if k.startswith("decoder.")]

    def loss_xla(p, x):
        out, _ = _xla_ref(p, state, x)
        return jnp.sum(jnp.abs(out - 0.4))

    fn = make_train_decode_fn(interpret=True)

    def loss_ker(p, x):
        out, _ = fn(p, state, x)
        return jnp.sum(jnp.abs(out - 0.4))

    gx_ref, gp_ref = jax.grad(loss_xla, argnums=(1, 0))(params, stacked)
    gx, gp = jax.grad(loss_ker, argnums=(1, 0))(params, stacked)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-5)
    for k in dkeys:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), rtol=2e-4, atol=2e-5, err_msg=k
        )
    # non-decoder params get zero cotangent from this subgraph on both paths
    for k in gp:
        if not k.startswith("decoder."):
            np.testing.assert_allclose(np.asarray(gp[k]), 0.0, atol=1e-8)


def test_bf16_storage_runs_and_correlates(setup):
    params, state, stacked = setup
    ref_out, _ = _xla_ref(params, state, stacked)
    fn = make_train_decode_fn(compute_dtype=jnp.bfloat16, interpret=True)
    out, _ = fn(params, state, stacked)
    a = np.asarray(out, np.float64).ravel()
    b = np.asarray(ref_out, np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


def test_solver_train_step_fused_matches_xla(tmp_path):
    """TPU.train_decoder='fused': one Solver train step through the Pallas
    training kernel == the XLA grouped step (params, BN state, losses)."""
    import copy

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
    from electrocardio_panorama_tpu.training.solver import Solver

    cfg = get_cfg()
    cfg.desc = "fusedtrain"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 4
    cfg.MODEL.model = "model_nefnet"
    cfg.TPU.steps_per_epoch = 1
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")

    ds = build_dataset(cfg, "train")
    batch = next(iter(BeatLoader(ds, 4, shuffle=True, drop_last=True, seed=1)))
    cfg_f = copy.deepcopy(cfg)
    cfg_f.TPU.train_decoder = "fused"
    sx = Solver(cfg, use_writer=False)
    sf = Solver(cfg_f, use_writer=False)
    params, bn = sx.model.init(jax.random.PRNGKey(0))
    opt = sx.tx.init(params)
    rng = jax.random.PRNGKey(1)
    args = tuple(
        jnp.asarray(batch[k]) for k in
        ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )
    fresh = lambda t: jax.tree.map(jnp.array, t)  # donated buffers: copy per call
    px, bnx, ox, lx = sx._train_step(
        fresh(params), fresh(bn), fresh(opt), rng, np.int32(0),
        jnp.asarray(1), jnp.asarray(2), *args)
    pf, bnf, of, lf = sf._train_step(
        fresh(params), fresh(bn), fresh(opt), rng, np.int32(0),
        jnp.asarray(1), jnp.asarray(2), *args)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=1e-4, atol=1e-6)
    for k in px:
        np.testing.assert_allclose(
            np.asarray(pf[k]), np.asarray(px[k]), rtol=2e-4, atol=2e-6, err_msg=k)
    for k in bnx:
        np.testing.assert_allclose(
            np.asarray(bnf[k]), np.asarray(bnx[k]), rtol=1e-4, atol=1e-5, err_msg=k)


def test_dp_shard_map_rides_fused_train_decoder(tmp_path):
    """The dp shard_map step with TPU.train_decoder='fused' (per-shard-local
    kernel BN). At mesh size 1 local == global statistics, so the step must
    match the single-device fused step exactly; on the 8-device mesh it must
    run and stay finite (per-shard BN is the documented DataParallel-faithful
    semantic, parallel/sharding.py)."""
    import jax as _jax
    from jax.sharding import Mesh

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.data import BeatLoader, build_dataset
    from electrocardio_panorama_tpu.parallel.sharding import build_dp_train_step
    from electrocardio_panorama_tpu.training.optim import get_optimizer
    from electrocardio_panorama_tpu.training.solver import Solver

    cfg = get_cfg()
    cfg.desc = "fuseddp"
    cfg.DATA.dataset = "synthetic"
    cfg.DATA.lead_num = 3
    cfg.DATA.super_mode = "IIv2v5_v4I_372"
    cfg.DATA.train_data_mode = "input_fix"
    cfg.DATA.batch_size = 8
    cfg.MODEL.model = "model_nefnet"
    cfg.TPU.train_decoder = "fused"
    cfg.DATA.synthetic_root = str(tmp_path / "synth")
    cfg.output_dir = str(tmp_path / "out")

    ds = build_dataset(cfg, "train")
    batch = next(iter(BeatLoader(ds, 8, shuffle=True, drop_last=True, seed=2)))
    solver = Solver(cfg, use_writer=False)
    params, bn = solver.model.init(jax.random.PRNGKey(0))
    tx = get_optimizer(cfg)
    opt = tx.init(params)
    args = tuple(
        jnp.asarray(batch[k]) for k in
        ("data", "input_theta", "target_theta", "rois", "target_view", "noise")
    )
    rng = jax.random.PRNGKey(3)
    i1, i2 = jnp.asarray(0), jnp.asarray(1)

    import copy as _c
    fresh = lambda t: jax.tree.map(jnp.array, t)  # donated buffers: copy per call
    # mesh size 1: dp-fused == the XLA grouped computation at matching
    # semantics (deterministic, full batch, local == global BN stats)
    mesh1 = Mesh(np.asarray(_jax.devices()[:1]), ("data",))
    step1 = build_dp_train_step(solver.model, cfg, tx, mesh1, deterministic=True)
    p1, bn1, _, l1 = step1(fresh(params), fresh(bn), fresh(opt),
                           rng, i1, i2, *args)
    cfg_x = _c.deepcopy(cfg)
    cfg_x.TPU.train_decoder = "xla"
    stepx = build_dp_train_step(solver.model, cfg_x, tx, mesh1, deterministic=True)
    px, bnx, _, lx = stepx(fresh(params), fresh(bn), fresh(opt),
                           rng, i1, i2, *args)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lx), rtol=1e-4, atol=1e-6)
    for k in px:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(px[k]), rtol=2e-4, atol=2e-6, err_msg=k)

    # 8-device mesh: runs, finite, params move
    mesh8 = Mesh(np.asarray(_jax.devices()[:8]), ("data",))
    step8 = build_dp_train_step(solver.model, cfg, tx, mesh8, deterministic=True)
    p8, bn8, _, l8 = step8(fresh(params), fresh(bn), fresh(opt),
                           rng, i1, i2, *args)
    assert np.isfinite(np.asarray(l8)).all()
    assert any(
        not np.allclose(np.asarray(p8[k]), np.asarray(params[k])) for k in params
    )


def test_train_batch_vmem_guard():
    """The recomputing train kernels reject per-group batches whose working
    set would blow the VMEM budget (over budget is an opaque Mosaic failure
    or a worker crash, not an error). nb=32 is the measured-good production
    point; nb=48 must raise a clear ValueError naming the batch."""
    import pytest

    from electrocardio_panorama_tpu.ops.pallas.decoder_train import (
        VMEM_LIMIT_BYTES,
        _validate_train_nb,
        train_vmem_bytes_estimate,
    )

    _validate_train_nb(32)
    assert train_vmem_bytes_estimate(32) < VMEM_LIMIT_BYTES
    with pytest.raises(ValueError, match="per-group batch 48"):
        _validate_train_nb(48)
