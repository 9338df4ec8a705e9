"""Angular Encoding of ECG viewpoint angles.

The paper's viewpoint-conditioning op (reference
codes/network/utils/theta_encoder.py:13-29): an input of spherical angles
(theta, phi) per lead is expanded to the feature tuple
[theta, phi, theta+phi, theta-phi] and each feature f is interleaved as
[f, sin(omega*f), cos(omega*f)].

Pure trigonometry — jit/vmap-friendly, no parameters. Output feature order is
interleaved per feature (stack on a new trailing axis, then flatten), matching
the reference's `torch.stack(out_all, dim=-1).view(b, lead, -1)`.
"""

from __future__ import annotations

import jax.numpy as jnp


def angular_encode(theta: jnp.ndarray, encoder_len: int = 1, omega: float = 1.0) -> jnp.ndarray:
    """Encode viewpoint angles.

    Args:
      theta: [..., 2] array of (theta, phi) spherical angles. Any number of
        leading batch/lead/view axes.
      encoder_len: number of frequency bands. The reference supports only one
        frequency in practice (omega=1, theta_encoder.py:11); values > 1 add
        sin/cos at omega*(k+1) for k in range(encoder_len), giving
        (2*encoder_len+1)*4 output features.
      omega: base frequency.

    Returns:
      [..., (2*encoder_len+1)*4] encoded features. For encoder_len=1 the
      12 features are, in order:
        [t, sin t, cos t, p, sin p, cos p, t+p, sin(t+p), cos(t+p),
         t-p, sin(t-p), cos(t-p)].
    """
    t = theta[..., 0:1]
    p = theta[..., 1:2]
    feats = jnp.concatenate([t, p, t + p, t - p], axis=-1)  # [..., 4]
    bands = [feats]
    for k in range(encoder_len):
        w = omega * (k + 1)
        bands.append(jnp.sin(feats * w))
        bands.append(jnp.cos(feats * w))
    out = jnp.stack(bands, axis=-1)  # [..., 4, 2*encoder_len+1]
    return out.reshape(*theta.shape[:-1], -1)


def theta_feature_dim(encoder_len: int = 1) -> int:
    return (2 * encoder_len + 1) * 4
