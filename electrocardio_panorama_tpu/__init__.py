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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the grouped-conv graphs compile in tens of
# seconds; caching makes every subsequent process (train resume, val, render,
# bench) start hot. Opt out with ECGPAN_NO_COMPILE_CACHE=1.
if not _os.environ.get("ECGPAN_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "ECGPAN_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "ecgpan_xla_cache"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

from electrocardio_panorama_tpu.config import get_cfg, load_cfg  # noqa: F401
