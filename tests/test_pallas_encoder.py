"""Fused ENCODER kernel (ops/pallas/encoder_fused.py) vs the XLA encode path:
eval-mode forward parity directly against encode_latents (dropout off), and
train-mode forward + GRADIENT parity against a mask-explicit XLA oracle fed
the identical pre-scaled dropout masks. Interpret mode on CPU; the multi-
program grid (weight-grad accumulation) is exercised with B=16, nb=8."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from electrocardio_panorama_tpu.models.nefnet import encode_latents, init_nefnet
from electrocardio_panorama_tpu.ops import (
    angular_encode,
    conv1d,
    conv_transpose1d_k2s2,
    linear,
    roi_align_1d,
    roi_reverse_1d,
)
from electrocardio_panorama_tpu.ops.pallas import encoder_fused as EF

L = 3
B = 16


@pytest.fixture(scope="module")
def setup():
    params, _ = init_nefnet(jax.random.PRNGKey(0), lead_num=L)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.6, (B, L, 512)).astype(np.float32))
    thetas = jnp.asarray(rng.uniform(-1, 1, (B, L, 2)).astype(np.float32))
    # contiguous 7-segment partition of [0, 512] like the dataset emits
    cuts = np.sort(rng.integers(16, 496, (B, 6)), axis=1)
    rois = np.zeros((B, 7, 2), np.float32)
    rois[:, 0, 0] = 0
    rois[:, :6, 1] = cuts
    rois[:, 1:, 0] = cuts
    rois[:, 6, 1] = 512
    return params, x, thetas, jnp.asarray(rois)


def _relu_t(x):
    """relu with the TORCH subgradient at 0 (d/dx = 0): the kernel backward
    uses (out > 0) masks, while jnp.maximum's JVP splits exact ties 0.5/0.5 —
    and the encoder chain produces exact zeros (relu -> dropout -> conv of
    all-zero windows), so the convention is observable in grads."""
    return jnp.where(x > 0, x, 0.0)


def _mask_oracle(p, x, thetas, rois, masks, *, lead_num):
    """XLA re-implementation of encode_latents with EXPLICIT pre-scaled
    dropout masks (model layout) — the parity oracle for the train kernel."""
    from electrocardio_panorama_tpu.ops import max_pool1d

    Lm = lead_num
    Bm = x.shape[0]
    m6, mc20, mc22 = masks
    h = conv1d(x, p["W_encoder.conv1.weight"], stride=2, padding=7, groups=Lm)
    h = _relu_t(h)
    h = max_pool1d(h, kernel=3, stride=2, padding=1)
    for b in range(3):
        r = conv1d(h, p[f"W_encoder.layer1.{b}.conv1.weight"], padding=3, groups=Lm)
        r = _relu_t(r) * m6[b]
        r = conv1d(r, p[f"W_encoder.layer1.{b}.conv2.weight"], padding=3, groups=Lm)
        h = _relu_t(r + h)
    enc = angular_encode(thetas, 1)
    gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])
    h = (h.reshape(Bm, Lm, 128, 128) * gate1[..., None]).reshape(Bm, 128 * Lm, 128)

    def block(prefix, z, groups, mask):
        r = conv1d(z, p[f"{prefix}.conv1.weight"], padding=1, groups=groups)
        r = _relu_t(r) * mask
        r = conv1d(r, p[f"{prefix}.conv2.weight"], padding=1, groups=groups)
        res = z
        if r.shape[1] != z.shape[1]:
            res = conv1d(z, p[f"{prefix}.residual_conv.weight"],
                         p[f"{prefix}.residual_conv.bias"], groups=groups)
        return _relu_t(r + res)

    h = block("w_conv.0", h, Lm, m6[3])
    h4 = h.reshape(Bm, Lm, 128, 128)
    z1 = block("z1_conv.0", h4[:, :, :64].reshape(Bm, 64 * Lm, 128), Lm, m6[4])
    z2 = block("z2_conv1.0", h4[:, :, 64:].reshape(Bm, 64 * Lm, 128), Lm, m6[5])
    a = roi_align_1d(z2, rois).reshape(Bm, 128 * Lm * 7, 16)
    G7 = 7 * Lm
    a = block("z2_conv2.0", a, G7, mc20)
    a = conv_transpose1d_k2s2(a, p["z2_conv2.1.weight"], p["z2_conv2.1.bias"], groups=G7)
    a = block("z2_conv2.2", a, G7, mc22)
    z2g = a.reshape(Bm, 128 * Lm, 7, 32)
    z2r = roi_reverse_1d(z2g, rois)
    z1m = z1.reshape(Bm, Lm, 128, 128).mean(axis=1)
    z2m = z2r.reshape(Bm, Lm, 128, 128).mean(axis=1)
    return z1, z2r, jnp.concatenate([z1m, z2m], axis=1)


def _masks_model_layout(m6, mc20, mc22):
    """Kernel-layout masks -> model layout for the oracle."""
    Bm = m6.shape[-1] // 128
    out6 = m6.reshape(6, L, 128, Bm, 128).transpose(0, 3, 1, 2, 4).reshape(
        6, Bm, 128 * L, 128)
    o20 = mc20.reshape(7 * L, 128, Bm, 16).transpose(2, 0, 1, 3).reshape(
        Bm, 128 * L * 7, 16)
    o22 = mc22.reshape(7 * L, 128, Bm, 32).transpose(2, 0, 1, 3).reshape(
        Bm, 128 * L * 7, 32)
    return out6, o20, o22


def test_eval_forward_matches_encode_latents(setup):
    params, x, thetas, rois = setup
    ref = encode_latents(params, x, thetas, rois, lead_num=L, train=False)
    fn = EF.make_fused_encode_fn(L, interpret=True)
    lat = fn(params, x, thetas, rois, train=False)
    np.testing.assert_allclose(np.asarray(lat.z1), np.asarray(ref.z1),
                               rtol=1e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(lat.z2), np.asarray(ref.z2),
                               rtol=1e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(lat.latent_all),
                               np.asarray(ref.latent_all), rtol=1e-5, atol=3e-5)


def test_train_forward_and_grads_match_mask_oracle(setup):
    params, x, thetas, rois = setup
    m6, mc20, mc22 = EF.draw_masks(jax.random.PRNGKey(3), B, L, jnp.float32)
    om6, o20, o22 = _masks_model_layout(m6, mc20, mc22)
    t1 = jnp.asarray(np.random.default_rng(11).normal(0, 1, (B, 256, 128)),
                     jnp.float32)

    def run_kernel(p):
        from electrocardio_panorama_tpu.ops.roi import roi_align_ramp

        enc = angular_encode(thetas, 1)
        gate1 = linear(enc, p["mlp1.weight"], p["mlp1.bias"])
        xph, gexp, ramp = EF.prep_encoder_inputs(x, gate1, roi_align_ramp(rois))
        w = EF.pack_encoder_weights(p, L, jnp.float32)
        z1k, z2gk = EF.encode_fused_train((L, 8, True), w, xph, gexp, ramp,
                                          m6, mc20, mc22)
        z1, z2g = EF.unpack_outputs(z1k, z2gk, L)
        z2 = roi_reverse_1d(z2g, rois)
        z1m = z1.reshape(B, L, 128, 128).mean(axis=1)
        z2m = z2.reshape(B, L, 128, 128).mean(axis=1)
        return z1, z2, jnp.concatenate([z1m, z2m], axis=1)

    def run_oracle(p):
        return _mask_oracle(p, x, thetas, rois, (om6, o20, o22), lead_num=L)

    ker = run_kernel(params)
    ref = run_oracle(params)
    for a, b, nm in zip(ker, ref, ("z1", "z2", "latent_all")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=3e-5, err_msg=nm)

    def loss_of(run):
        def f(p):
            z1, z2, lat = run(p)
            return (jnp.sum(jnp.abs(lat * t1)) + jnp.sum(jnp.abs(z1))
                    + jnp.sum(z2 * z2))
        return f

    gk = jax.grad(loss_of(run_kernel))(params)
    gr = jax.grad(loss_of(run_oracle))(params)
    keys = [k for k in params
            if k.split(".")[0] in ("W_encoder", "w_conv", "z1_conv",
                                   "z2_conv1", "z2_conv2", "mlp1")]
    assert keys
    for k in keys:
        a, b = np.asarray(gk[k]), np.asarray(gr[k])
        if k.startswith(("w_conv.0.residual", "z2_conv2.0.residual")):
            # unused residual params (equal channel counts): zero both paths
            assert np.all(a == 0) and np.all(b == 0), k
            continue
        # Grads match at ~1e-7 relative except where a pre-activation sits
        # within f32 rounding of 0 and the relu mask flips between the two
        # (equally valid) implementations — irreducible float sensitivity,
        # observed as ~0.1% of one tensor at ~1e-4. Assert both the bulk
        # (99.5% of elements at 2e-4) and the energy (L2 rel <= 5e-4).
        denom = np.maximum(np.abs(b).max(), 1e-3)
        d = np.abs(a - b) / denom
        assert (d > 2e-4).mean() <= 5e-3, f"{k}: {(d > 2e-4).mean():.2e} over tol"
        l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        assert l2 <= 5e-4, f"{k}: grad L2 rel err {l2:.2e}"


@pytest.mark.parametrize("mode", ["tower", "full"])
def test_ckpt_backward_is_bitwise_recompute(setup, mode):
    """The checkpoint backwards (TPU.encoder_ckpt='tower'/'full') must
    produce BITWISE the recompute backward's grads: the checkpoints store
    exactly the values the recompute would rebuild (same kernel code), so
    any difference is a wiring bug, not float noise."""
    from electrocardio_panorama_tpu.ops.roi import roi_align_ramp

    params, x, thetas, rois = setup
    m6, mc20, mc22 = EF.draw_masks(jax.random.PRNGKey(3), B, L, jnp.float32)
    enc = angular_encode(thetas, 1)
    gate1 = linear(enc, params["mlp1.weight"], params["mlp1.bias"])
    xph, gexp, ramp = EF.prep_encoder_inputs(x, gate1, roi_align_ramp(rois))
    w = EF.pack_encoder_weights(params, L, jnp.float32)

    def loss(ckpt):
        def f(wa, g):
            z1, z2g = EF.encode_fused_train((L, 8, True, ckpt), wa, xph, g,
                                            ramp, m6, mc20, mc22)
            return jnp.sum(z1 * 1.3) + jnp.sum(z2g * z2g)

        return jax.value_and_grad(f, argnums=(0, 1))(w, gexp)

    v0, (gw0, gg0) = loss(False)
    v1, (gw1, gg1) = loss(mode)
    assert float(v0) == float(v1)
    assert float(jnp.max(jnp.abs(gg0 - gg1))) == 0.0
    for k in gw0:
        assert float(jnp.max(jnp.abs(gw0[k] - gw1[k]))) == 0.0, k


def test_partial_batch_falls_back_to_xla_on_hardware_path(setup):
    """VERDICT r4 item 8: a batch not divisible by the tile (e.g. a final
    partial eval batch, B=12 with nb=8) must complete under the HARDWARE
    branch (interpret=False) by falling back to the XLA encode — the
    fallback fires before any Pallas call, so it is platform-independent
    and exact vs encode_latents."""
    params, x, thetas, rois = setup
    Bp = 12  # 12 % 8 != 0
    xs, ts, rs = x[:Bp], thetas[:Bp], rois[:Bp]
    fn = EF.make_fused_encode_fn(L, interpret=False)  # hardware branch
    lat = fn(params, xs, ts, rs, train=False)
    ref = encode_latents(params, xs, ts, rs, lead_num=L, train=False)
    np.testing.assert_array_equal(np.asarray(lat.z1), np.asarray(ref.z1))
    np.testing.assert_array_equal(np.asarray(lat.latent_all),
                                  np.asarray(ref.latent_all))
    # train-mode partial batch with dropout rng also completes
    lat_t = fn(params, xs, ts, rs, rng=jax.random.PRNGKey(5), train=True)
    assert lat_t.latent_all.shape == ref.latent_all.shape
