"""Conv/pool/norm primitive parity vs PyTorch (CPU torch as the oracle)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
import jax

from electrocardio_panorama_tpu.ops import (
    batch_norm1d,
    conv1d,
    conv_transpose1d_k2s2,
    linear,
    max_pool1d,
    upsample_linear_x2,
)

ATOL = 2e-5


def test_conv1d_grouped(rng):
    # Stem conv of the encoder: k15 s2 p7 groups=3 (resnet_1d.py:102-103).
    x = rng.standard_normal((2, 3, 512)).astype(np.float32)
    w = rng.standard_normal((384, 1, 15)).astype(np.float32)
    ref = F.conv1d(torch.tensor(x), torch.tensor(w), stride=2, padding=7, groups=3)
    ours = conv1d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=7, groups=3)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


def test_conv1d_bias(rng):
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)
    w = rng.standard_normal((16, 8, 3)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    ref = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1)
    ours = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


def test_conv_transpose_k2s2_grouped(rng):
    # z2_conv2 transposed conv: in=128/group, out=64/group, groups=21 (model_nefnet.py:96-97).
    G, Cin_pg, Cout_pg, L = 21, 16, 8, 16
    x = rng.standard_normal((2, G * Cin_pg, L)).astype(np.float32)
    w = rng.standard_normal((G * Cin_pg, Cout_pg, 2)).astype(np.float32)
    b = rng.standard_normal((G * Cout_pg,)).astype(np.float32)
    ref = F.conv_transpose1d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, groups=G)
    ours = conv_transpose1d_k2s2(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups=G)
    assert ours.shape == (2, G * Cout_pg, 2 * L)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


def test_max_pool1d(rng):
    x = rng.standard_normal((2, 4, 256)).astype(np.float32)
    ref = F.max_pool1d(torch.tensor(x), kernel_size=3, stride=2, padding=1)
    ours = max_pool1d(jnp.asarray(x), kernel=3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=0)


def test_linear(rng):
    x = rng.standard_normal((4, 7, 12)).astype(np.float32)
    w = rng.standard_normal((128, 12)).astype(np.float32)
    b = rng.standard_normal((128,)).astype(np.float32)
    ref = F.linear(torch.tensor(x), torch.tensor(w), torch.tensor(b))
    ours = linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


def test_upsample_linear_x2(rng):
    x = rng.standard_normal((2, 5, 128)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), scale_factor=2, mode="linear", align_corners=False)
    ours = upsample_linear_x2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_batch_norm_train_and_eval(rng):
    x = rng.standard_normal((4, 6, 32)).astype(np.float32)
    scale = rng.standard_normal((6,)).astype(np.float32)
    offset = rng.standard_normal((6,)).astype(np.float32)
    rmean = rng.standard_normal((6,)).astype(np.float32)
    rvar = np.abs(rng.standard_normal((6,))).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm1d(6)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(offset))
        bn.running_mean.copy_(torch.tensor(rmean))
        bn.running_var.copy_(torch.tensor(rvar))

    # train mode: batch stats normalize, running stats update with unbiased var
    bn.train()
    ref_train = bn(torch.tensor(x)).detach().numpy()
    ours_train, nm, nv = batch_norm1d(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(rmean), jnp.asarray(rvar), train=True,
    )
    np.testing.assert_allclose(np.asarray(ours_train), ref_train, atol=ATOL)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(), atol=ATOL)

    # eval mode with the updated stats
    bn.eval()
    ref_eval = bn(torch.tensor(x)).detach().numpy()
    ours_eval, _, _ = batch_norm1d(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset), nm, nv, train=False,
    )
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, atol=ATOL)


def test_ops_are_jittable():
    x = jnp.ones((2, 4, 64))
    w = jnp.ones((8, 4, 3)) * 0.1
    f = jax.jit(lambda a: conv1d(a, w, padding=1))
    assert f(x).shape == (2, 8, 64)
