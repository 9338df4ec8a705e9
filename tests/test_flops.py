"""The MFU constants in utils/flops.py must track the model.

Recomputes each workload's XLA cost-analysis FLOP count on the CPU backend at
the bench shapes and asserts it equals the committed constant (rtol 1e-3, so
a model change that shifts algorithmic FLOPs fails here instead of silently
skewing the published MFU numbers)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from electrocardio_panorama_tpu.config import get_cfg
from electrocardio_panorama_tpu.models import build_model
from electrocardio_panorama_tpu.models.losses import loss_wrapper
from electrocardio_panorama_tpu.training.optim import get_optimizer
from electrocardio_panorama_tpu.utils import flops as F


def _cost(compiled):
    ca = compiled.cost_analysis()
    return (ca[0] if isinstance(ca, list) else ca)["flops"]


@pytest.fixture(scope="module")
def setup():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synth_batch

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    batch = _synth_batch(np.random.default_rng(0), B=32)
    return cfg, model, params, bn_state, batch


def test_full_workload_and_decode_flops(setup):
    cfg, model, params, bn_state, batch = setup
    B, V = 32, 336
    rng = np.random.default_rng(1)
    vs = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, V, 2)).astype(np.float32))
    data = jnp.asarray(batch["data"])
    it = jnp.asarray(batch["input_theta"])
    rois = jnp.asarray(batch["rois"])

    def full(p, s, d, i, r, v):
        latent = model.encode(p, d, i, r).latent_all
        return model.decode_views(p, s, latent, v).sum()

    got = _cost(jax.jit(full).lower(params, bn_state, data, it, rois, vs).compile())
    np.testing.assert_allclose(
        got / (B * V), F.FULL_WORKLOAD_FLOPS_PER_VIEW, rtol=1e-3
    )

    def decode(p, s, latent, v):
        return model.decode_views(p, s, latent, v).sum()

    latent = model.encode(params, data, it, rois).latent_all
    got_d = _cost(jax.jit(decode).lower(params, bn_state, latent, vs).compile())
    np.testing.assert_allclose(got_d / (B * V), F.DECODE_FLOPS_PER_VIEW, rtol=1e-3)

    def encode(p, d, i, r):
        return model.encode(p, d, i, r).latent_all

    got_e = _cost(jax.jit(encode).lower(params, data, it, rois).compile())
    np.testing.assert_allclose(got_e / B, F.ENCODE_FLOPS_PER_BEAT, rtol=1e-3)


def test_train_step_flops(setup):
    cfg, model, params, bn_state, batch = setup
    tx = get_optimizer(cfg)
    opt_state = tx.init(params)

    def train_step(p, bn, opt, key, data, it, tt, rois, tv):
        def loss_fn(pp):
            (out, sp, sl), new_bn = model.apply(
                pp, bn, data, it, tt, rois, phase="train", rng=key,
                shuffle_idx=(0, 1),
            )
            loss, *_ = loss_wrapper(out, sp, sl, tv[:, None, :], cfg)
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bn, new_opt, loss

    args = (
        params, bn_state, opt_state, jax.random.PRNGKey(0),
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["target_view"]),
    )
    got = _cost(jax.jit(train_step).lower(*args).compile())
    np.testing.assert_allclose(got, F.TRAIN_STEP_FLOPS_B32, rtol=1e-3)


def test_basis_executed_flops_bounded():
    """The executed-FLOPs denominator of the streamed-basis MFU must stay
    strictly below the algorithmic count (the basis collapse REMOVES work —
    that inequality is the whole point of publishing both framings) and
    within sane bounds of it."""
    ex = F.basis_decode_executed_flops_per_view()
    assert ex < F.FULL_WORKLOAD_FLOPS_PER_VIEW
    assert ex > 0.3 * F.FULL_WORKLOAD_FLOPS_PER_VIEW
