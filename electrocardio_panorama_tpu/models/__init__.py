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
