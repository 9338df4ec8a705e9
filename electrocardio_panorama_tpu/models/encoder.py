"""Grouped 1-D ResNet encoder (the W-encoder of Nef-Net).

The reference builds a full resnet34 and keeps only conv1/relu/maxpool/layer1
(codes/network/encoder/encoder.py:19-26); layers 2-4 are discarded. Here the
encoder is constructed directly as that truncated tower:

  conv1 k15 s2 p7 grouped-by-lead (resnet_1d.py:102-103)
  -> relu -> maxpool k3 s2 p1
  -> layer1: 3 BasicBlocks (k7, NO BatchNorm, dropout 0.2; resnet_1d.py:27-53)

[B, lead_num, 512] -> [B, 128*lead_num, 128] with init_channels=128
(invoked at model_nefnet.py:72-73). Each lead owns a private 128-channel tower
via feature_group_count — embarrassingly parallel across leads, a natural
channel-shard axis on a TPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from electrocardio_panorama_tpu.models import init as inits
from electrocardio_panorama_tpu.models.blocks import init_resnet_block, resnet_block
from electrocardio_panorama_tpu.ops import conv1d, max_pool1d

NUM_LAYER1_BLOCKS = 3  # resnet34 layers[0] == 3 (resnet_1d.py:180)


def init_encoder(rng, prefix: str, lead_num: int, init_channels: int = 128, dtype=jnp.float32) -> dict:
    ch = init_channels * lead_num
    keys = jax.random.split(rng, 1 + NUM_LAYER1_BLOCKS)
    params = {
        f"{prefix}.conv1.weight": inits.conv_resnet(keys[0], ch, 1, 15, dtype),
    }
    for i in range(NUM_LAYER1_BLOCKS):
        params.update(
            init_resnet_block(keys[1 + i], f"{prefix}.layer1.{i}", ch, ch, lead_num, dtype)
        )
    return params


def encoder_apply(p: dict, prefix: str, x, *, lead_num: int, rng, train: bool):
    """x: [B, lead_num, 512] -> [B, 128*lead_num, 128]."""
    rngs = jax.random.split(rng, NUM_LAYER1_BLOCKS) if rng is not None else [None] * NUM_LAYER1_BLOCKS
    h = conv1d(x, p[f"{prefix}.conv1.weight"], stride=2, padding=7, groups=lead_num)
    h = jnp.maximum(h, 0)
    h = max_pool1d(h, kernel=3, stride=2, padding=1)
    for i in range(NUM_LAYER1_BLOCKS):
        h = resnet_block(p, f"{prefix}.layer1.{i}", h, groups=lead_num, rng=rngs[i], train=train)
    return h
