"""Angular-encoding parity vs the reference math (theta_encoder.py:13-29)."""

import numpy as np
import jax.numpy as jnp

from electrocardio_panorama_tpu.ops import angular_encode, theta_feature_dim


def _reference_numpy(theta):
    """Straight numpy transcription of the documented reference behavior."""
    t, p = theta[..., 0:1], theta[..., 1:2]
    before = np.concatenate([t, p, t + p, t - p], axis=-1)
    out = np.stack([before, np.sin(before), np.cos(before)], axis=-1)
    return out.reshape(*theta.shape[:-1], -1)


def test_shape_and_dim():
    theta = jnp.zeros((4, 3, 2))
    out = angular_encode(theta, encoder_len=1)
    assert out.shape == (4, 3, 12)
    assert theta_feature_dim(1) == 12
    assert theta_feature_dim(2) == 20


def test_values_match_reference(rng):
    theta = rng.uniform(-np.pi, np.pi, size=(5, 12, 2)).astype(np.float32)
    ours = np.asarray(angular_encode(jnp.asarray(theta)))
    ref = _reference_numpy(theta)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_values_match_torch():
    torch = __import__("torch")
    # Literal angles from the reference's own smoke test (theta_encoder.py:33).
    x = np.array([[[np.pi / 2, np.pi / 3], [np.pi / 4, np.pi / 6]]], dtype=np.float32)
    t, p = torch.tensor(x[..., 0:1]), torch.tensor(x[..., 1:2])
    before = torch.cat([torch.tensor(x), t + p, t - p], dim=-1)
    ref = torch.stack([before, torch.sin(before), torch.cos(before)], dim=-1).reshape(1, 2, -1)
    ours = np.asarray(angular_encode(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_query_theta_rank2():
    """query_theta enters as [B, 2]; the reference reshapes through [B, 2, 6]
    then flattens to [B, 12] (model_nefnet.py:163-164). Flattened values must
    equal the rank-3 [B, 1, 2] encoding reordered consistently."""
    theta = np.array([[0.3, -0.7]], dtype=np.float32)
    # rank-2 path used by the model: encode [B, 2]-shaped angles pairwise.
    enc3 = np.asarray(angular_encode(jnp.asarray(theta[:, None, :]))).reshape(1, -1)
    assert enc3.shape == (1, 12)
