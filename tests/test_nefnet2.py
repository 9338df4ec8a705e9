"""Nef-Net2 variant parity: the lead-into-batch fold must match the
reference's per-lead Python loop (goldens from tools/make_goldens.py)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import NefNet2Def
from electrocardio_panorama_tpu.training.torch_import import split_params_state

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "nefnet2_lead3.npz")
ATOL = 3e-5


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("nefnet2 golden missing (run tools/make_goldens.py)")
    z = np.load(GOLDEN)
    named = {k[len("param::"):]: z[k] for k in z.files if k.startswith("param::")}
    params, state = split_params_state(named)
    return z, params, state


def test_param_key_compat(golden):
    z, params, state = golden
    model = NefNet2Def(3)
    p, s = model.init(jax.random.PRNGKey(0))
    assert set(p.keys()) == set(params.keys())
    assert set(s.keys()) == set(state.keys())
    for k in p:
        assert p[k].shape == params[k].shape, k


def test_eval_parity(golden):
    z, params, state = golden
    model = NefNet2Def(3)
    (out, sp, sl, rest), _ = model.apply(
        params, state,
        jnp.asarray(z["x"]), jnp.asarray(z["input_thetas"]), jnp.asarray(z["query_theta"]),
        jnp.asarray(z["rois"]), jnp.asarray(z["rest_theta"]),
        phase="test", shuffle_idx=tuple(z["shuffle_idx"]),
    )
    np.testing.assert_allclose(np.asarray(out), z["eval.out"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sp), z["eval.shuffle_p"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(sl), z["eval.shuffle_l"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(rest), z["eval.rest_out"], atol=ATOL)


def test_gen_means_parity(golden):
    z, params, state = golden
    model = NefNet2Def(3)
    (z1m, z2m), _ = model.apply(
        params, state,
        jnp.asarray(z["x"]), jnp.asarray(z["input_thetas"]), jnp.asarray(z["query_theta"]),
        jnp.asarray(z["rois"]), phase="gen",
    )
    np.testing.assert_allclose(np.asarray(z1m), z["gen.z1_mean"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(z2m), z["gen.z2_mean"], atol=ATOL)
