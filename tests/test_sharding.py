"""Multi-device (8 virtual CPU devices) sharding tests: dp train step parity
with single-device, and view-sharded panorama equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.models import NefNetDef, build_model
from electrocardio_panorama_tpu.parallel import (
    build_dp_train_step,
    build_sharded_panorama,
    make_mesh,
    put_batch,
    put_replicated,
)
from electrocardio_panorama_tpu.training.optim import get_optimizer


@pytest.fixture(scope="module")
def cfg():
    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    cfg.SOLVER.loss_factor = [0.5, 0.5, 1]
    cfg.SOLVER.lr = 0.01
    return cfg


def make_batch(rng, B, L=3, R=9):
    rois = []
    for _ in range(B):
        cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
        pts = np.concatenate([[0], cuts, [512]])
        rois.append(np.stack([pts[:-1], pts[1:]], 1))
    return dict(
        data=rng.uniform(0, 1, (B, L, 512)).astype(np.float32),
        input_theta=rng.uniform(-np.pi, np.pi, (B, L, 2)).astype(np.float32),
        target_theta=rng.uniform(-np.pi, np.pi, (B, 2)).astype(np.float32),
        rois=np.stack(rois).astype(np.int64),
        target_view=rng.uniform(0, 1, (B, 512)).astype(np.float32),
        noise=np.zeros((B, 512), np.float32),
        rest_theta=rng.uniform(-np.pi, np.pi, (B, R, 2)).astype(np.float32),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_runs_and_matches_replicas(cfg):
    """Smoke: the shard_map dp step (dropout ON, per-shard rng) produces
    finite losses, replicated updated params, and updated synced BN stats.
    Exact parity with the single-device step is pinned separately below."""
    mesh = make_mesh((8,), ("data",))
    model = build_model(cfg)
    tx = get_optimizer(cfg)
    rng_np = np.random.default_rng(0)
    batch = make_batch(rng_np, B=16)

    params, bn_state = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    # snapshot before the step: donation may consume aliased source buffers
    mlp1_before = np.asarray(params["mlp1.weight"]).copy()
    bn_mean_before = np.asarray(bn_state["decoder.1.double_conv.1.running_mean"]).copy()
    params_r = put_replicated(params, mesh)
    bn_r = put_replicated(bn_state, mesh)
    opt_r = put_replicated(opt_state, mesh)
    arrays = put_batch(
        (jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
         jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
         jnp.asarray(batch["target_view"]), jnp.asarray(batch["noise"])),
        mesh,
    )
    step = build_dp_train_step(model, cfg, tx, mesh)
    new_p, new_bn, new_opt, losses = step(
        params_r, bn_r, opt_r, jax.random.PRNGKey(7),
        jnp.asarray(1), jnp.asarray(0), *arrays,
    )
    assert np.isfinite(np.asarray(losses)).all()
    for k in ("mlp1.weight", "decoder.4.weight"):
        assert np.isfinite(np.asarray(new_p[k])).all()
    # params must have changed
    assert not np.allclose(np.asarray(new_p["mlp1.weight"]), mlp1_before)
    # BN running stats synced and updated
    assert not np.allclose(
        np.asarray(new_bn["decoder.1.double_conv.1.running_mean"]), bn_mean_before
    )


def test_dp_train_step_exact_parity_with_single_device(cfg, tmp_path):
    """With dropout off (deterministic=True) and a fixed shuffle_idx, the
    8-shard dp step must compute the SAME params/grads/BN stats as the
    single-device Solver._train_step on the same batch: pmean'd per-shard
    grads equal the full-batch gradient, and the psum-synced BN
    (ops/convs.py batch_norm1d axis_name branch) equals full-batch BN."""
    from electrocardio_panorama_tpu.training.solver import Solver

    mesh = make_mesh((8,), ("data",))
    model = build_model(cfg)
    tx = get_optimizer(cfg)
    rng_np = np.random.default_rng(42)
    batch = make_batch(rng_np, B=16)
    params, bn_state = model.init(jax.random.PRNGKey(3))
    opt_state = tx.init(params)
    arrays_host = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["target_view"]), jnp.asarray(batch["noise"]),
    )
    i1, i2 = jnp.asarray(1), jnp.asarray(2)

    # host copies: both steps donate their (params, bn, opt) buffers
    def copy(t):
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), t)

    # --- single-device step (rng=None => dropout no-op throughout the stack)
    scfg = cfg.clone()
    scfg.output_dir = str(tmp_path)
    solver = Solver(scfg, use_writer=False)  # TPU.mesh_shape=[] => mesh None
    p1, bn1, opt1, lvec1 = solver._train_step(
        copy(params), copy(bn_state), copy(opt_state), None, np.int32(0),
        i1, i2, *arrays_host
    )

    # --- dp step over 8 shards of 2
    step = build_dp_train_step(model, cfg, tx, mesh, deterministic=True)
    p2, bn2, opt2, lvec2 = step(
        put_replicated(copy(params), mesh), put_replicated(copy(bn_state), mesh),
        put_replicated(copy(opt_state), mesh), jax.random.PRNGKey(0),
        i1, i2, *put_batch(arrays_host, mesh),
    )

    np.testing.assert_allclose(np.asarray(lvec2), np.asarray(lvec1), rtol=0, atol=2e-6)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p2[k]), np.asarray(p1[k]), rtol=0, atol=5e-6,
            err_msg=f"param {k} diverged between dp and single-device step",
        )
    for k in bn1:
        np.testing.assert_allclose(
            np.asarray(bn2[k]), np.asarray(bn1[k]), rtol=0, atol=5e-6,
            err_msg=f"bn state {k} diverged between dp and single-device step",
        )
    # momentum buffers too (same grads => same opt state)
    flat1, _ = jax.tree.flatten(opt1)
    flat2, _ = jax.tree.flatten(opt2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=5e-6)


def test_view_sharded_panorama_matches_single_device(cfg):
    mesh = make_mesh((2, 4), ("data", "view"))
    model = build_model(cfg)
    rng_np = np.random.default_rng(1)
    batch = make_batch(rng_np, B=4)
    params, bn_state = model.init(jax.random.PRNGKey(1))

    views = rng_np.uniform(-np.pi, np.pi, (16, 2)).astype(np.float32)
    render = build_sharded_panorama(model, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    pr = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    br = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), bn_state)
    data = jax.device_put(jnp.asarray(batch["data"]), NamedSharding(mesh, P("data")))
    it = jax.device_put(jnp.asarray(batch["input_theta"]), NamedSharding(mesh, P("data")))
    rois = jax.device_put(jnp.asarray(batch["rois"]), NamedSharding(mesh, P("data")))
    vs = jax.device_put(jnp.asarray(views), NamedSharding(mesh, P("view")))

    pano_sharded = render(pr, br, data, it, rois, vs)

    # single-device reference
    latent = model.encode(params, jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]), jnp.asarray(batch["rois"])).latent_all
    v = jnp.broadcast_to(jnp.asarray(views)[None], (4, 16, 2))
    pano_single = model.decode_views(params, bn_state, latent, v)
    np.testing.assert_allclose(np.asarray(pano_sharded), np.asarray(pano_single), atol=2e-5)


def test_dense_sweep_full_record_sharded(cfg):
    """BASELINE config 5: dense viewpoint sweep over a full multi-beat record,
    sharded (data x view) on the 8-device mesh — matches single-device."""
    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.data import build_dataset
    from electrocardio_panorama_tpu.data.pipeline import collate
    from jax.sharding import NamedSharding, PartitionSpec as P

    dcfg = get_cfg()
    dcfg.DATA.dataset = "synthetic"
    dcfg.DATA.lead_num = 3
    dcfg.DATA.super_mode = "IIv2v5_v4I_372"
    dcfg.DATA.train_data_mode = "input_fix"
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        dcfg.DATA.synthetic_root = td + "/synth"
        dcfg.output_dir = td + "/out"
        ds = build_dataset(dcfg, "test")
        rng = np.random.default_rng(0)
        # all beats of record 0, padded to a multiple of the data axis (4)
        n = ds.num_beats(0)
        metas = [ds.get_beat(0, b % n, rng) for b in range(((n + 3) // 4) * 4)]
        batch = collate(metas)

    mesh = make_mesh((4, 2), ("data", "view"))
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(2))
    views = np.asarray(
        np.stack(np.meshgrid(np.linspace(0.1, 3.0, 6), np.linspace(-3.1, 3.1, 6),
                             indexing="ij"), -1).reshape(-1, 2), np.float32)  # 36 views

    render = build_sharded_panorama(model, mesh)
    rep = NamedSharding(mesh, P())
    pano = render(
        jax.tree.map(lambda x: jax.device_put(x, rep), params),
        jax.tree.map(lambda x: jax.device_put(x, rep), state),
        jax.device_put(jnp.asarray(batch["data"]), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(batch["input_theta"]), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(batch["rois"]), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(views), NamedSharding(mesh, P("view"))),
    )
    assert pano.shape == (len(metas), 36, 512)

    # single-device reference
    latent = model.encode(params, jnp.asarray(batch["data"]),
                          jnp.asarray(batch["input_theta"]), jnp.asarray(batch["rois"])).latent_all
    v = jnp.broadcast_to(jnp.asarray(views)[None], (len(metas), 36, 2))
    ref = model.decode_views(params, state, latent, v)
    np.testing.assert_allclose(np.asarray(pano), np.asarray(ref), atol=2e-5)


def test_view_sharded_panorama_fused_kernel(cfg):
    """The fused Pallas decoder under shard_map (data x view mesh): each
    device runs the flagship single-chip pipeline on its (batch, view) slice
    (interpret mode on the CPU mesh) and matches the XLA sharded path."""
    mesh = make_mesh((2, 4), ("data", "view"))
    model = build_model(cfg)
    rng_np = np.random.default_rng(2)
    batch = make_batch(rng_np, B=4)
    params, bn_state = model.init(jax.random.PRNGKey(2))

    views = rng_np.uniform(-np.pi, np.pi, (32, 2)).astype(np.float32)
    render_ref = build_sharded_panorama(model, mesh)
    render_fused = build_sharded_panorama(
        model, mesh, use_fused=True, v_tile=8, interpret=True
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    pr = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    br = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), bn_state)
    data = jax.device_put(jnp.asarray(batch["data"]), NamedSharding(mesh, P("data")))
    it = jax.device_put(jnp.asarray(batch["input_theta"]), NamedSharding(mesh, P("data")))
    rois = jax.device_put(jnp.asarray(batch["rois"]), NamedSharding(mesh, P("data")))
    vs = jax.device_put(jnp.asarray(views), NamedSharding(mesh, P("view")))

    pano_fused = np.asarray(render_fused(pr, br, data, it, rois, vs))
    pano_ref = np.asarray(render_ref(pr, br, data, it, rois, vs))
    assert pano_fused.shape == pano_ref.shape == (4, 32, 512)
    np.testing.assert_allclose(pano_fused, pano_ref, atol=2e-5)


def test_dp_step_mixed_precision(cfg):
    """The shard_map dp step honors TPU.compute_dtype='bfloat16' with f32
    master params/BN stats (the Solver policy) and produces finite losses."""
    mcfg = cfg.clone()
    mcfg.TPU.compute_dtype = "bfloat16"
    mesh = make_mesh((8,), ("data",))
    model = build_model(mcfg)
    rng_np = np.random.default_rng(3)
    batch = make_batch(rng_np, B=16)
    params, bn_state = model.init(jax.random.PRNGKey(3))
    tx = get_optimizer(mcfg)
    opt = tx.init(params)
    step = build_dp_train_step(model, mcfg, tx, mesh)

    arrays = put_batch(
        tuple(batch[k] for k in
              ("data", "input_theta", "target_theta", "rois", "target_view", "noise")),
        mesh,
    )
    params, bn_state, opt, lvec = step(
        put_replicated(params, mesh), put_replicated(bn_state, mesh),
        put_replicated(opt, mesh), jax.random.PRNGKey(0),
        jnp.asarray(0), jnp.asarray(1), *arrays,
    )
    assert np.isfinite(np.asarray(lvec)).all()
    assert all(
        v.dtype == np.float32
        for v in jax.tree.leaves(params) if np.issubdtype(v.dtype, np.floating)
    )
    assert all(
        v.dtype == np.float32
        for v in jax.tree.leaves(bn_state) if np.issubdtype(v.dtype, np.floating)
    )


def test_lead_parallel_panorama_matches_unsharded():
    """Lead tensor parallelism (SURVEY section 2.3): encoder/z-conv weights and
    the input's lead axis sharded 4-way (12 leads -> 3 per device) on a
    (lead=4, view=2) mesh, latent formed by one psum, decode view-sharded.
    Must equal the unsharded encode+decode up to f32 reduction order (the
    lead mean becomes a psum of partial means)."""
    from jax.sharding import PartitionSpec as P

    from electrocardio_panorama_tpu.parallel import (
        build_lead_parallel_panorama,
        lead_param_specs,
    )

    model = NefNetDef(lead_num=12)
    mesh = make_mesh((4, 2), ("lead", "view"))
    params, bn_state = model.init(jax.random.PRNGKey(3))
    rng_np = np.random.default_rng(5)
    batch = make_batch(rng_np, B=2, L=12)
    views = jnp.asarray(
        rng_np.uniform(-np.pi, np.pi, (8, 2)).astype(np.float32)
    )
    data = jnp.asarray(batch["data"])
    itheta = jnp.asarray(batch["input_theta"])
    rois = jnp.asarray(batch["rois"])

    lat = model.encode(params, data, itheta, rois)
    want = model.decode_views(
        params, bn_state, lat.latent_all,
        jnp.broadcast_to(views[None], (2, 8, 2)),
    )

    render = build_lead_parallel_panorama(model, mesh, view_axis="view")
    got = render(params, bn_state, data, itheta, rois, views)
    assert got.shape == (2, 8, 512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # the spec helper shards exactly the per-lead-grouped leaves on axis 0
    specs = lead_param_specs(params, 12)
    assert specs["W_encoder.conv1.weight"] == P("lead")
    assert specs["z2_conv2.1.bias"] == P("lead")
    assert specs["decoder.4.weight"] == P()
    assert specs["mlp2.weight"] == P()


def test_lead_parallel_lead_count_must_divide():
    model = NefNetDef(lead_num=3)
    mesh = make_mesh((4, 2), ("lead", "view"))
    from electrocardio_panorama_tpu.parallel import build_lead_parallel_panorama

    with pytest.raises(ValueError, match="not divisible"):
        build_lead_parallel_panorama(model, mesh, view_axis="view")


def test_3d_mesh_train_step_parity_with_single_device(tmp_path):
    """The combined data x lead x view train step (batch sharded jointly over
    data+view, encoder weights/activations/momentum sharded over lead, latent
    + shuffle picks by psum, mlp1 grads psum'd over lead) computes the SAME
    update as the single-device Solver step on the same batch (dropout off,
    fixed shuffle picks)."""
    from jax.tree_util import DictKey
    from electrocardio_panorama_tpu.parallel import (
        build_3d_train_step, lead_param_specs, opt_state_specs)
    from electrocardio_panorama_tpu.training.solver import Solver

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 2  # divisible by the 2-way lead axis
    cfg.SOLVER.loss_factor = [0.5, 0.5, 1]
    cfg.SOLVER.lr = 0.01
    mesh = make_mesh((2, 2, 2), ("data", "lead", "view"))
    model = build_model(cfg)
    tx = get_optimizer(cfg)
    batch = make_batch(np.random.default_rng(5), B=8, L=2)
    params, bn_state = model.init(jax.random.PRNGKey(4))
    opt_state = tx.init(params)
    arrays = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["target_view"]), jnp.asarray(batch["noise"]),
    )
    i1, i2 = jnp.asarray(1), jnp.asarray(0)

    def copy(t):
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), t)

    scfg = cfg.clone()
    scfg.output_dir = str(tmp_path)
    solver = Solver(scfg, use_writer=False)
    p1, bn1, opt1, lvec1 = solver._train_step(
        copy(params), copy(bn_state), copy(opt_state), None, np.int32(0),
        i1, i2, *arrays
    )

    step = build_3d_train_step(model, cfg, tx, mesh, deterministic=True)
    p2, bn2, opt2, lvec2 = step(
        copy(params), copy(bn_state), copy(opt_state), jax.random.PRNGKey(0),
        i1, i2, *arrays,
    )

    np.testing.assert_allclose(np.asarray(lvec2), np.asarray(lvec1), rtol=0, atol=2e-6)
    # Observed agreement is ~1e-7 (reassociation only). The tolerance must
    # stay FAR below lr*grad (~1e-4 here): a mis-scaled lead collective
    # (e.g. the n_lead-replicated-loss double count this test caught, or a
    # psum-for-pmean on mlp1) shifts lead-sharded params by exactly
    # lr*grad*(factor-1), which 5e-6 rejects and 1e-4 would mask.
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p2[k]), np.asarray(p1[k]), rtol=0, atol=5e-6,
            err_msg=f"param {k} diverged between 3d-mesh and single-device step",
        )
    for k in bn1:
        np.testing.assert_allclose(
            np.asarray(bn2[k]), np.asarray(bn1[k]), rtol=0, atol=5e-6,
            err_msg=f"bn state {k} diverged",
        )
    flat1, _ = jax.tree.flatten(opt1)
    flat2, _ = jax.tree.flatten(opt2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=5e-6)

    # encoder leaves (and their momentum) really are lead-sharded on the mesh
    specs = lead_param_specs(params, 2)
    from jax.sharding import PartitionSpec as P2
    assert specs["W_encoder.conv1.weight"] == P2("lead")
    o_specs = opt_state_specs(tx, params, specs)
    leaves = jax.tree_util.tree_leaves_with_path(o_specs)
    assert any(
        any(isinstance(k, DictKey) and k.key == "W_encoder.conv1.weight" for k in path)
        and spec == P2("lead")
        for path, spec in leaves
    )
    sh = p2["W_encoder.conv1.weight"].sharding
    assert sh.spec == P2("lead")


def test_3d_mesh_train_step_mixed_precision():
    """VERDICT r4 item 9: the 3-axis data x lead x view step composes with
    the production bf16 policy — f32 master params/opt/BN, bf16 forward/
    backward with the lead-latent psums and joint-batch BN psums in bf16,
    f32 grad corrections and pmean. Checks finiteness, f32 masters, live
    lead sharding, and that the bf16 losses track the f32 3-axis step (the
    same batch) to bf16 resolution — a mis-scaled collective under the cast
    (factor n_lead) would miss by ~100x."""
    from jax.sharding import PartitionSpec as P2

    from electrocardio_panorama_tpu.parallel import build_3d_train_step

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 2
    cfg.SOLVER.loss_factor = [0.5, 0.5, 1]
    cfg.SOLVER.lr = 0.01
    mesh = make_mesh((2, 2, 2), ("data", "lead", "view"))
    model = build_model(cfg)
    tx = get_optimizer(cfg)
    batch = make_batch(np.random.default_rng(11), B=8, L=2)
    params, bn_state = model.init(jax.random.PRNGKey(6))
    opt_state = tx.init(params)
    arrays = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["target_view"]), jnp.asarray(batch["noise"]),
    )
    i1, i2 = jnp.asarray(1), jnp.asarray(0)

    def copy(t):
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), t)

    step32 = build_3d_train_step(model, cfg, tx, mesh, deterministic=True)
    _, _, _, lvec32 = step32(
        copy(params), copy(bn_state), copy(opt_state), jax.random.PRNGKey(0),
        i1, i2, *arrays,
    )

    bcfg = cfg.clone()
    bcfg.TPU.compute_dtype = "bfloat16"
    step16 = build_3d_train_step(model, bcfg, tx, mesh, deterministic=True)
    p2, bn2, opt2, lvec16 = step16(
        copy(params), copy(bn_state), copy(opt_state), jax.random.PRNGKey(0),
        i1, i2, *arrays,
    )

    assert np.isfinite(np.asarray(lvec16)).all()
    np.testing.assert_allclose(
        np.asarray(lvec16), np.asarray(lvec32), rtol=0.05, atol=5e-3)
    for t in (p2, bn2):
        assert all(
            v.dtype == np.float32
            for v in jax.tree.leaves(t) if np.issubdtype(v.dtype, np.floating)
        )
    assert p2["W_encoder.conv1.weight"].sharding.spec == P2("lead")
