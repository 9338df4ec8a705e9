"""Model registry (reference codes/network/__init__.py:7-24)."""

from functools import partial

import jax.numpy as jnp

from electrocardio_panorama_tpu.models.losses import l1, loss_wrapper, mse, mse_per_lead  # noqa: F401 — public API re-exports
from electrocardio_panorama_tpu.models.nefnet import (
    NefNetLatents,
    decode_views,
    encode_latents,
    gen_ecg,
    init_nefnet,
    nefnet_apply,
    query_gates,
)

__all__ = [
    "build_model",
    "build_loss",
    "init_nefnet",
    "nefnet_apply",
    "encode_latents",
    "decode_views",
    "query_gates",
    "gen_ecg",
    "NefNetLatents",
    "loss_wrapper",
]


class NefNetDef:
    """Bound model definition: init/apply closures over static config."""

    def __init__(self, lead_num: int, theta_encoder_len: int = 1, dtype=jnp.float32):
        self.lead_num = lead_num
        self.theta_encoder_len = theta_encoder_len
        self.dtype = dtype
        self.init = partial(
            init_nefnet, lead_num=lead_num, theta_encoder_len=theta_encoder_len, dtype=dtype
        )
        self.apply = partial(
            nefnet_apply, lead_num=lead_num, theta_encoder_len=theta_encoder_len
        )
        self.encode = partial(
            encode_latents, lead_num=lead_num, theta_encoder_len=theta_encoder_len
        )
        self.decode_views = partial(decode_views, theta_encoder_len=theta_encoder_len)
        self.gen_ecg = partial(
            gen_ecg, lead_num=lead_num, theta_encoder_len=theta_encoder_len
        )


class NefNet2Def:
    """Bound Nef-Net2 definition (shared single-lead tower)."""

    def __init__(self, lead_num: int, theta_encoder_len: int = 1, dtype=jnp.float32):
        from electrocardio_panorama_tpu.models.nefnet2 import init_nefnet2, nefnet2_apply

        self.lead_num = lead_num
        self.theta_encoder_len = theta_encoder_len
        self.dtype = dtype
        self.init = partial(
            init_nefnet2, lead_num=lead_num, theta_encoder_len=theta_encoder_len, dtype=dtype
        )
        self.apply = partial(
            nefnet2_apply, lead_num=lead_num, theta_encoder_len=theta_encoder_len
        )
        self.decode_views = partial(decode_views, theta_encoder_len=theta_encoder_len)

    def encode(self, params, x, input_thetas, rois, *, rng=None, train=False,
               stop_before_reverse=False):
        """NefNetLatents-compatible encode so the panorama/render paths work
        with Nef-Net2. Pre-reverse latent export is unsupported: the reference
        Nef-Net2's own gen/gen_ecg pair is shape-inconsistent dead code
        (model_nefnet2.py:159-160 vs 205-218)."""
        if stop_before_reverse:
            raise NotImplementedError(
                "Nef-Net2 has no pre-reverse latent export (the reference's "
                "phase='gen' returns post-reverse lead means); use "
                "model_nefnet for the latent-prior/synthesis workflow"
            )
        from electrocardio_panorama_tpu.models.nefnet2 import encode_latents2

        z1_leads, z2_leads = encode_latents2(
            params, x, input_thetas, rois, lead_num=self.lead_num,
            theta_encoder_len=self.theta_encoder_len, rng=rng, train=train,
        )
        B = x.shape[0]
        z1_mean = z1_leads.mean(axis=1)
        z2_mean = z2_leads.mean(axis=1)
        return NefNetLatents(
            z1=z1_leads.reshape(B, -1, z1_leads.shape[-1]),
            z2=z2_leads.reshape(B, -1, z2_leads.shape[-1]),
            z1_mean=z1_mean, z2_mean=z2_mean,
            latent_all=jnp.concatenate([z1_mean, z2_mean], axis=1),
        )

    def gen_ecg(self, *args, **kwargs):
        raise NotImplementedError(
            "Nef-Net2's gen_ecg is inconsistent dead code in the reference "
            "(model_nefnet2.py:205-218 expects pre-reverse grids that its own "
            "gen phase never produces); use model_nefnet for synthesis"
        )


def build_model(cfg):
    """Registry: 'model_nefnet' matches the reference registry
    (network/__init__.py:7-12); 'model_nefnet2' is additionally registered
    here (the reference defines Model_nefnet2 but never registers it —
    a deliberate extension)."""
    dtype = jnp.dtype(cfg.TPU.param_dtype) if "TPU" in cfg else jnp.float32
    if cfg.MODEL.model == "model_nefnet":
        return NefNetDef(cfg.DATA.lead_num, cfg.MODEL.theta_L, dtype)
    if cfg.MODEL.model == "model_nefnet2":
        return NefNet2Def(cfg.DATA.lead_num, cfg.MODEL.theta_L, dtype)
    raise ValueError(
        "build model: model name error "
        f"(MODEL.model={cfg.MODEL.model!r}; registered: 'model_nefnet', "
        "'model_nefnet2' — the default config ships with the reference's "
        "unregistered 'modelv2', so set MODEL.model in your yml or overrides)"
    )


def build_loss(cfg):
    """Loss registry parity (reference network/__init__.py:15-24)."""
    if cfg.MODEL.loss == "v1":
        return loss_wrapper
    if cfg.MODEL.loss == "mse":
        return lambda pred, target, *a, **k: mse(pred, target)
    raise ValueError("build loss: loss name error")
