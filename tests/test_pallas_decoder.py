"""Fused Pallas decoder: interpret-mode parity with the XLA decoder (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import NefNetDef
from electrocardio_panorama_tpu.models.nefnet import decode_views, query_gates
from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
    fold_decoder_bn,
    fused_decode_views,
    upsample_matrix,
)
from electrocardio_panorama_tpu.ops import upsample_linear_x2


def test_upsample_matrix_parity(rng):
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    u = upsample_matrix(128)
    np.testing.assert_allclose(
        np.asarray(x @ u), np.asarray(upsample_linear_x2(x)), atol=1e-6
    )


def test_fused_decoder_matches_xla(rng):
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(0))
    latent = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.3)
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 16, 2)).astype(np.float32))

    ref = decode_views(params, state, latent, views)
    gates = query_gates(params, views)
    folded = fold_decoder_bn(params, state)
    ours = fused_decode_views(folded, latent, gates, v_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-6)


def test_fused_decoder_bf16_storage(rng):
    """bf16 activations/weights with f32 accumulation, gate stage, and tail:
    correlation vs the f32 XLA decoder must stay > 0.999 on REALISTIC
    latents (actual encoder output — random latents understate bf16 error)."""
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(2))
    data = jnp.asarray(rng.uniform(0, 1, (2, 3, 512)).astype(np.float32))
    it = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 3, 2)).astype(np.float32))
    cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
    pts = np.concatenate([[0], cuts, [512]])
    rois = jnp.asarray(np.broadcast_to(np.stack([pts[:-1], pts[1:]], 1), (2, 7, 2)))
    latent = model.encode(params, data, it, rois).latent_all
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 16, 2)).astype(np.float32))

    ref = np.asarray(decode_views(params, state, latent, views))
    gates = query_gates(params, views)
    folded = fold_decoder_bn(params, state, dtype=jnp.bfloat16)
    ours = fused_decode_views(folded, latent, gates, v_tile=16, interpret=True)
    ours = np.asarray(ours)
    assert ours.dtype == np.float32
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"bf16/f32 correlation {corr}"
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_v_tile_validation():
    """Bad view tiles must raise a clear error instead of crashing the TPU
    worker (sublane misalignment / VMEM blowout)."""
    import pytest
    from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
        validate_v_tile, vmem_bytes_estimate, VMEM_LIMIT_BYTES,
    )

    validate_v_tile(24, jnp.float32)
    validate_v_tile(16, jnp.bfloat16)
    with pytest.raises(ValueError, match="multiple of 8"):
        validate_v_tile(12, jnp.float32)
    with pytest.raises(ValueError, match="multiple of 16"):
        validate_v_tile(24, jnp.bfloat16)
    with pytest.raises(ValueError, match="VMEM"):
        validate_v_tile(48, jnp.float32)  # the round-1 worker-crash tile
    assert vmem_bytes_estimate(48, jnp.float32) > VMEM_LIMIT_BYTES
    assert vmem_bytes_estimate(24, jnp.float32) < VMEM_LIMIT_BYTES


def test_basis_decode_matches_xla(rng):
    """The production BASIS path (rank-J mix of the pre-ReLU head outside the
    kernel, conv2-onward kernel) is value-equal to the XLA decoder: the basis
    identity gate[v] = A @ [enc_v; 1] is exact, and basis_y1 only reorders the
    head's linear algebra. Non-trivial BN stats so folded['A']/b1 interplay is
    exercised; views NOT a v_tile multiple so the enc padding path runs."""
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(0))
    state = {
        k: (jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
            if k.endswith("running_var")
            else jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) * 0.1
            if k.endswith("running_mean") else v)
        for k, v in state.items()
    }
    latent = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.3)
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 11, 2)).astype(np.float32))

    from electrocardio_panorama_tpu.ops.theta import angular_encode

    ref = decode_views(params, state, latent, views)
    folded = fold_decoder_bn(params, state)
    ours = fused_decode_views(
        folded, latent, enc=angular_encode(views, 1), v_tile=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_basis_decode_bf16(rng):
    """bf16 basis path on realistic latents: corr > 0.999 and atol 1e-4 vs
    the f32 XLA decoder (same bar as the legacy gate-kernel bf16 test)."""
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(2))
    data = jnp.asarray(rng.uniform(0, 1, (2, 3, 512)).astype(np.float32))
    it = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 3, 2)).astype(np.float32))
    cuts = np.sort(rng.choice(np.arange(8, 504, 4), size=6, replace=False))
    pts = np.concatenate([[0], cuts, [512]])
    rois = jnp.asarray(np.broadcast_to(np.stack([pts[:-1], pts[1:]], 1), (2, 7, 2)))
    latent = model.encode(params, data, it, rois).latent_all
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 16, 2)).astype(np.float32))

    from electrocardio_panorama_tpu.ops.theta import angular_encode

    ref = np.asarray(decode_views(params, state, latent, views))
    folded = fold_decoder_bn(params, state, dtype=jnp.bfloat16)
    ours = np.asarray(fused_decode_views(
        folded, latent, enc=angular_encode(views, 1), v_tile=16, interpret=True
    ))
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"bf16 basis/f32 correlation {corr}"
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_basis_decode_arg_validation(rng):
    import pytest

    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(0))
    latent = jnp.zeros((1, 256, 128), jnp.float32)
    views = jnp.zeros((1, 8, 2), jnp.float32)
    folded = fold_decoder_bn(params, state)
    gates = query_gates(params, views)
    with pytest.raises(ValueError, match="exactly one"):
        fused_decode_views(folded, latent, gates, enc=views, interpret=True)
    with pytest.raises(ValueError, match="exactly one"):
        fused_decode_views(folded, latent, interpret=True)
    stripped = {k: v for k, v in folded.items() if k != "A"}
    from electrocardio_panorama_tpu.ops.theta import angular_encode

    with pytest.raises(ValueError, match="mlp2"):
        fused_decode_views(stripped, latent, enc=angular_encode(views, 1),
                           v_tile=8, interpret=True)


def test_fused_decoder_nonuniform_bn_state(rng):
    """BN folding must use the actual running stats, not the initial 0/1."""
    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(1))
    state = {
        k: (jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
            if k.endswith("running_var")
            else jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) * 0.1
            if k.endswith("running_mean") else v)
        for k, v in state.items()
    }
    latent = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32) * 0.3)
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 8, 2)).astype(np.float32))
    ref = decode_views(params, state, latent, views)
    folded = fold_decoder_bn(params, state)
    ours = fused_decode_views(folded, latent, query_gates(params, views), v_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_basis_heads_agree(rng):
    """The three basis head forms — streamed MXU fdot mix (bf16 production),
    streamed VPU scalar mix (f32 production), materialized y1 (audit) —
    compute the same algebra. 'stream' matched 'y1' BITWISE on v5e
    (tools/bench_kernel_basis_stream.py) and at float noise under the CPU
    interpreter (different contraction lowering); 'stream_scalar' reorders
    the j-sum so it agrees at accumulation noise. Views NOT a v_tile
    multiple so the padded coefficient rows run through the streamed mix."""
    from electrocardio_panorama_tpu.ops.theta import angular_encode

    model = NefNetDef(3)
    params, state = model.init(jax.random.PRNGKey(3))
    latent = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.3)
    views = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 11, 2)).astype(np.float32))
    enc = angular_encode(views, 1)
    for dtype, vt, tol in [(jnp.float32, 8, 5e-7), (jnp.bfloat16, 16, 5e-5)]:
        folded = fold_decoder_bn(params, state, dtype=dtype)
        outs = {
            h: np.asarray(fused_decode_views(
                folded, latent, enc=enc, v_tile=vt, interpret=True, head=h))
            for h in ("y1", "stream", "stream_scalar")
        }
        np.testing.assert_allclose(outs["stream"], outs["y1"], atol=tol)
        np.testing.assert_allclose(outs["stream_scalar"], outs["y1"], atol=tol)
