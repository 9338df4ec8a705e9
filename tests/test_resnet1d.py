"""Full 1-D ResNet family: shapes, finiteness, and BN plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models.resnet1d import init_resnet1d, resnet1d_apply


@pytest.mark.parametrize("arch,blocks", [("resnet18", "basic"), ("resnet34", "basic"), ("resnet50", "bottleneck")])
def test_forward_shapes(arch, blocks, rng):
    params, state, meta = init_resnet1d(
        jax.random.PRNGKey(0), arch, in_channel=8, num_classes=55, lead_num=1, init_channels=16
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 1024)).astype(np.float32))
    probs, updates = resnet1d_apply(params, state, meta, x, train=False)
    assert probs.shape == (2, 55)
    arr = np.asarray(probs)
    assert np.isfinite(arr).all() and (arr >= 0).all() and (arr <= 1).all()
    assert updates == {}


def test_train_updates_bn_for_bottleneck(rng):
    params, state, meta = init_resnet1d(
        jax.random.PRNGKey(1), "resnet50", in_channel=4, num_classes=5, init_channels=8
    )
    x = jnp.asarray(rng.standard_normal((2, 4, 256)).astype(np.float32))
    _, updates = resnet1d_apply(params, state, meta, x, train=True, rng=jax.random.PRNGKey(2))
    assert any(k.endswith("running_mean") for k in updates)


def test_grouped_lead_towers(rng):
    params, state, meta = init_resnet1d(
        jax.random.PRNGKey(3), "resnet18", in_channel=3, num_classes=4, lead_num=3, init_channels=8
    )
    x = jnp.asarray(rng.standard_normal((2, 3, 512)).astype(np.float32))
    probs, _ = resnet1d_apply(params, state, meta, x, train=False)
    assert probs.shape == (2, 4)


def test_features_only(rng):
    params, state, meta = init_resnet1d(
        jax.random.PRNGKey(4), "resnet34", in_channel=8, num_classes=10, init_channels=8
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 512)).astype(np.float32))
    feats, _ = resnet1d_apply(params, state, meta, x, train=False, features_only=True)
    assert feats.shape == (2, meta["out_features"])
