"""End-to-end Nef-Net parity vs recorded reference activations.

Goldens (tests/goldens/*.npz) were produced by tools/make_goldens.py running
the actual PyTorch reference with pinned randomness. The north-star fidelity
target is waveform correlation >= 0.99 (BASELINE.md); these tests hold the far
stricter bound of elementwise atol<=2e-5 plus correlation > 0.999999.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import NefNetDef
from electrocardio_panorama_tpu.training.torch_import import split_params_state

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
ATOL = 3e-5


def load_golden(lead_num):
    path = os.path.join(GOLDEN_DIR, f"nefnet_lead{lead_num}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} missing (run tools/make_goldens.py)")
    z = np.load(path)
    named = {k[len("param::"):]: z[k] for k in z.files if k.startswith("param::")}
    params, state = split_params_state(named)
    post_state = {k[len("post_train_state::"):]: z[k] for k in z.files if k.startswith("post_train_state::")}
    return z, params, state, post_state


def corr(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return np.corrcoef(a, b)[0, 1]


@pytest.mark.parametrize("lead_num", [3, 1])
def test_eval_forward_parity(lead_num):
    g, params, state, _ = load_golden(lead_num)
    model = NefNetDef(lead_num)
    (out, sp, sl, rest), _ = model.apply(
        params, state,
        jnp.asarray(g["x"]), jnp.asarray(g["input_thetas"]), jnp.asarray(g["query_theta"]),
        jnp.asarray(g["rois"]), jnp.asarray(g["rest_theta"]),
        phase="test", shuffle_idx=tuple(g["shuffle_idx"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["eval.out"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sp), g["eval.shuffle_p"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sl), g["eval.shuffle_l"], atol=ATOL)
    # reference rest_out is [B, R, 512] (concat over channel dim of [B,1,512])
    np.testing.assert_allclose(np.asarray(rest), g["eval.rest_out"], atol=ATOL)
    assert corr(np.asarray(rest), g["eval.rest_out"]) > 0.999999


@pytest.mark.parametrize("lead_num", [3])
def test_gen_latents_and_gen_ecg_parity(lead_num):
    g, params, state, _ = load_golden(lead_num)
    model = NefNetDef(lead_num)
    (z1, z2), _ = model.apply(
        params, state,
        jnp.asarray(g["x"]), jnp.asarray(g["input_thetas"]), jnp.asarray(g["query_theta"]),
        jnp.asarray(g["rois"]), phase="gen",
    )
    np.testing.assert_allclose(np.asarray(z1), g["gen.z1"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(z2), g["gen.z2"], atol=ATOL)

    gen = model.gen_ecg(params, state, z1, z2, jnp.asarray(g["rest_theta"]), jnp.asarray(g["rois"]))
    np.testing.assert_allclose(np.asarray(gen), g["gen.ecg"], atol=ATOL)


@pytest.mark.parametrize("lead_num", [3])
def test_train_forward_parity(lead_num):
    """Train mode: decoder BN uses batch stats and updates running stats in the
    reference's three-decode order; dropout pinned off (rng=None) to match the
    golden recording."""
    g, params, state, post_state = load_golden(lead_num)
    model = NefNetDef(lead_num)
    (out, sp, sl), new_state = model.apply(
        params, state,
        jnp.asarray(g["x"]), jnp.asarray(g["input_thetas"]), jnp.asarray(g["query_theta"]),
        jnp.asarray(g["rois"]),
        phase="train", shuffle_idx=tuple(g["shuffle_idx"]), rng=None,
    )
    np.testing.assert_allclose(np.asarray(out), g["train.out"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sp), g["train.shuffle_p"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sl), g["train.shuffle_l"], atol=ATOL)
    # BN running stats after one train forward must match torch's updates.
    for k, ref in post_state.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(np.asarray(new_state[k]), ref, atol=1e-5, err_msg=k)


def test_param_key_compat():
    """Every torch state_dict key maps 1:1 onto our flat param/state dicts —
    the checkpoint importer is an identity mapping."""
    g, params, state, _ = load_golden(3)
    model = NefNetDef(3)
    ours_p, ours_s = model.init(jax.random.PRNGKey(0))
    assert set(ours_p.keys()) == set(params.keys())
    assert set(ours_s.keys()) == set(state.keys())
    for k in ours_p:
        assert ours_p[k].shape == params[k].shape, k


def test_forward_jits_and_vmaps():
    g, params, state, _ = load_golden(3)
    model = NefNetDef(3)
    f = jax.jit(
        lambda p, s, x, it, qt, r, rt: model.apply(
            p, s, x, it, qt, r, rt, phase="test", shuffle_idx=(0, 0)
        )[0][3]
    )
    rest = f(params, state, jnp.asarray(g["x"]), jnp.asarray(g["input_thetas"]),
             jnp.asarray(g["query_theta"]), jnp.asarray(g["rois"]), jnp.asarray(g["rest_theta"]))
    np.testing.assert_allclose(np.asarray(rest), g["eval.rest_out"], atol=ATOL)


@pytest.mark.parametrize("lead_num", [3])
def test_gradient_parity(lead_num):
    """Full train-mode backward vs torch autograd: every parameter gradient of
    the shipped loss recipe (0.5 sg-L1 x2 + 1.0 L1) must match — covers the
    custom ROI ops' VJPs against grid_sample/interpolate backward."""
    g, params, state, _ = load_golden(lead_num)
    if "grad_target" not in g.files:
        pytest.skip("gradient goldens missing (rerun tools/make_goldens.py)")
    model = NefNetDef(lead_num)

    def loss_fn(p):
        (out, sp, sl), _ = model.apply(
            p, state,
            jnp.asarray(g["x"]), jnp.asarray(g["input_thetas"]), jnp.asarray(g["query_theta"]),
            jnp.asarray(g["rois"]),
            phase="train", shuffle_idx=tuple(g["shuffle_idx"]), rng=None,
        )
        target = jnp.asarray(g["grad_target"])
        sg = jax.lax.stop_gradient
        l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
        return 0.5 * l1(sg(out), sp) + 0.5 * l1(sg(out), sl) + 1.0 * l1(out, target)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(g["grad_loss"]), atol=1e-5)

    checked = 0
    for k in g.files:
        if not k.startswith("grad::"):
            continue
        name = k[len("grad::"):]
        ref = g[k]
        ours = np.asarray(grads[name])
        scale = max(np.abs(ref).max(), 1e-8)
        np.testing.assert_allclose(ours, ref, atol=2e-4 * scale + 1e-7, err_msg=name)
        checked += 1
    assert checked > 30  # all conv/linear/bn weights participated


def test_theta_encoder_len_2():
    """Multi-frequency Angular Encoding generalization: theta_L=2 gives
    20-dim features and consistent mlp shapes (the reference stores theta_L
    but supports only one frequency — theta_encoder.py:11)."""
    model = NefNetDef(2, theta_encoder_len=2)
    params, state = model.init(jax.random.PRNGKey(0))
    assert params["mlp1.weight"].shape == (128, 20)
    assert params["mlp2.weight"].shape == (256, 20)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 2, 512)).astype(np.float32))
    it = jnp.asarray(rng.uniform(-1, 1, (2, 2, 2)).astype(np.float32))
    qt = jnp.asarray(rng.uniform(-1, 1, (2, 2)).astype(np.float32))
    pts = np.array([0, 64, 128, 192, 256, 320, 448, 512])
    rois = jnp.asarray(np.broadcast_to(np.stack([pts[:-1], pts[1:]], 1), (2, 7, 2)))
    rt = jnp.asarray(rng.uniform(-1, 1, (2, 5, 2)).astype(np.float32))
    (out, sp, sl, rest), _ = model.apply(params, state, x, it, qt, rois, rt,
                                         phase="test", shuffle_idx=(0, 1))
    assert rest.shape == (2, 5, 512)
    assert np.isfinite(np.asarray(rest)).all()


def test_l1_subgradient_at_zero_matches_torch():
    """d|x|/dx at exactly 0 must be 0 (torch convention), not JAX's 1.
    With lead_num=1 the standin decodes are bitwise equal to the prediction;
    JAX's convention injected a phantom full-magnitude gradient through the
    standin terms that made 1-lead recipes untrainable (could not overfit a
    single batch the torch reference fits easily)."""
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.models.losses import l1, standin_l1

    g = jax.grad(lambda x: l1(x, jnp.zeros(4)))(jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(g), np.zeros(4))

    # the L=1 standin situation: shuffled decode == prediction exactly
    x = jnp.asarray([0.3, -0.2, 0.0, 1.1])
    g2 = jax.grad(lambda v: standin_l1(v, v))(x)
    np.testing.assert_array_equal(np.asarray(g2), np.zeros(4))

    # away from zero the subgradient is unchanged
    g3 = jax.grad(lambda v: l1(v, jnp.zeros(2)))(jnp.asarray([2.0, -3.0]))
    np.testing.assert_allclose(np.asarray(g3), [0.5, -0.5])


def test_one_lead_recipe_trains():
    """A 1-lead (_1110) model must be able to descend on a fixed batch —
    the regression the phantom standin gradient caused. 30 Adam steps must
    cut the loss by >30% (the torch reference achieves ~8x in 50)."""
    import jax
    import jax.numpy as jnp
    import optax

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.losses import loss_wrapper

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 1
    cfg.DATA.super_mode = "_1110"
    cfg.SOLVER.loss_factor = [0.5, 0.5, 1]
    model = build_model(cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    rng = np.random.default_rng(0)
    B = 4
    data = jnp.asarray(rng.uniform(0, 1, (B, 1, 512)).astype(np.float32))
    it = jnp.asarray(rng.uniform(0.3, 3.0, (B, 1, 2)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0.3, 3.0, (B, 2)).astype(np.float32))
    pts = np.linspace(0, 512, 8).astype(np.int64)
    rois = jnp.asarray(np.broadcast_to(np.stack([pts[:-1], pts[1:]], 1), (B, 7, 2)))
    tv = jnp.asarray(rng.uniform(0, 1, (B, 512)).astype(np.float32))

    @jax.jit
    def step(p, bn, opt):
        def loss_fn(pp):
            (out, sp, sl), new_bn = model.apply(
                pp, bn, data, it, tt, rois, phase="train", rng=None,
                shuffle_idx=(0, 0),
            )
            loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
            return loss, new_bn

        (loss, new_bn), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, new_opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), new_bn, new_opt, loss

    params, bn, opt, loss0 = step(params, bn, opt)
    for _ in range(80):
        params, bn, opt, loss = step(params, bn, opt)
    # the random-noise target can only be memorized, so progress is slower
    # than on real beats — but the broken gradient made the loss RISE, so a
    # solid monotone decrease is the discriminating signal
    assert float(loss) < 0.8 * float(loss0), (
        f"1-lead training is stuck: loss {float(loss0):.4f} -> {float(loss):.4f}"
    )


def test_grouped_decode_matches_sequential():
    """The batched three-decode (group-BN, one launch) must reproduce the
    sequential pred/shuffle_p/shuffle_l decodes (reference
    model_nefnet.py:167-176) — outputs AND the EMA-chained BN running stats."""
    import jax
    import jax.numpy as jnp

    from electrocardio_panorama_tpu.models.nefnet import (
        _decode, encode_latents, init_nefnet, nefnet_apply, query_gates)

    L, B = 3, 4
    rng = np.random.default_rng(11)
    params, state = init_nefnet(jax.random.PRNGKey(3), lead_num=L)
    # make running stats non-trivial so EMA chaining is actually exercised
    state = {k: (v + 0.25 if v.dtype != np.int32 else v) for k, v in state.items()}
    x = jnp.asarray(rng.uniform(0, 1, (B, L, 512)).astype(np.float32))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, L, 2)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, 2)).astype(np.float32))
    rois = []
    for _ in range(B):
        cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
        pts = np.concatenate([[0], cuts, [512]])
        rois.append(np.stack([pts[:-1], pts[1:]], 1))
    rois = jnp.asarray(np.stack(rois).astype(np.int64))

    key = jax.random.PRNGKey(9)
    (out_g, sp_g, sl_g), ns_g = nefnet_apply(
        params, state, x, thetas, q, rois, lead_num=L, phase="train",
        rng=key, shuffle_idx=(1, 2),
    )

    # sequential re-computation with the same dropout keys: replicate the
    # rng split inside nefnet_apply (enc_rng for the encoder, three decodes
    # BN-order-sequential)
    enc_rng, _ = jax.random.split(key)
    lat = encode_latents(params, x, thetas, rois, lead_num=L, rng=enc_rng, train=True)
    z1_leads = lat.z1.reshape(B, L, 128, 128)
    z2_leads = lat.z2.reshape(B, L, 128, 128)
    sp_all = jnp.concatenate([jnp.take(z1_leads, 1, axis=1), lat.z2_mean], axis=1)
    sl_all = jnp.concatenate([lat.z1_mean, jnp.take(z2_leads, 2, axis=1)], axis=1)
    gate_q = query_gates(params, q)
    ns = dict(state)
    out_s, u = _decode(params, ns, lat.latent_all, gate_q, train=True)
    ns.update(u)
    sp_s, u = _decode(params, ns, sp_all, gate_q, train=True)
    ns.update(u)
    sl_s, u = _decode(params, ns, sl_all, gate_q, train=True)
    ns.update(u)

    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_s), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sp_g), np.asarray(sp_s), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sl_g), np.asarray(sl_s), atol=2e-6)
    for k in ns:
        np.testing.assert_allclose(
            np.asarray(ns_g[k]), np.asarray(ns[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
