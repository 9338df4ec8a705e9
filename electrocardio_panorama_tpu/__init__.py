"""Electrocardio-Panorama TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
Nef-Net — "Electrocardio Panorama: Synthesizing New ECG Views with Self-supervision"
(IJCAI 2021, arXiv:2105.06293).

Ground-up rebuild of the capabilities of the PyTorch reference
(WhatAShot/Electrocardio-Panorama): few-view ECG encoding, Angular Encoding of
viewpoints, ROI-segmented morphology latents, Standin-Learning self-supervision,
panorama synthesis at arbitrary viewpoints, and from-scratch ECG generation —
redesigned for TPU: static shapes, batched multi-view decoding (vmap over the
view axis instead of the reference's per-view Python loop,
reference model_nefnet.py:185-190), grouped convs on the MXU, and
`jax.sharding.Mesh` data/view parallelism instead of `torch.nn.DataParallel`.
"""

__version__ = "0.1.0"

from electrocardio_panorama_tpu.config import get_cfg, load_cfg  # noqa: F401
