"""Shared per-heartbeat example assembly.

The normalize / noise / jitter / lead-partition / pad-to-512 logic duplicated
across the reference's two datasets (tianchi.py:109-225 == ptbv2.py:44-157)
lives here once. Input: a 12-lead beat slice + its 7 contiguous ROIs; output:
the fixed-shape `meta` dict the solver consumes (tianchi.py:212-225).
"""

from __future__ import annotations

import numpy as np

from electrocardio_panorama_tpu.data.leads import (
    LEAD_THETA,
    REST_EQUALS_SUPERVISION,
    lead_partition,
)

SEQ_LEN = 512
N_SEGMENTS = 7


def beat_rois(breakpoints: dict, beat_index: int, record_len: int) -> np.ndarray:
    """7 contiguous segments from the 6 breakpoint arrays, offset to beat start
    (tianchi.py:99-106): [P, P-R gap, QRS, R-T gap, T, T->next-P, tail-to-512].
    """
    p_on = breakpoints["P on"][beat_index]
    p_off = breakpoints["P off"][beat_index]
    r_on = breakpoints["R on"][beat_index]
    r_off = breakpoints["R off"][beat_index]
    t_on = breakpoints["T on"][beat_index]
    t_off = breakpoints["T off"][beat_index]
    n = len(breakpoints["P on"])
    end_point = breakpoints["P on"][beat_index + 1] if beat_index + 1 < n else record_len
    rois = np.array(
        [
            [p_on, p_off], [p_off, r_on], [r_on, r_off],
            [r_off, t_on], [t_on, t_off], [t_off, end_point],
            [end_point, SEQ_LEN + p_on],
        ]
    )
    return rois - p_on, p_on, end_point


def _pad_to(x: np.ndarray, length: int = SEQ_LEN) -> np.ndarray:
    if x.shape[-1] < length:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, length - x.shape[-1])]
        return np.pad(x, pad, mode="constant")
    return x[..., :length]


def build_meta(
    beat12: np.ndarray,
    rois: np.ndarray,
    *,
    cfg,
    phase: str,
    rng: np.random.Generator,
    record_id: str = "",
) -> dict:
    """beat12: [12, T] raw beat slice (T = beat length); rois: [7, 2] offset to 0."""
    # joint min-max normalization across leads (tianchi.py:109-111)
    mx, mn = beat12.max(), beat12.min()
    data12 = (beat12 - mn) / (mx - mn)

    # per-lead noise sigma from the 2nd half of the T->P segment (tianchi.py:113-116)
    lo = (rois[5][0] + rois[5][1]) // 2
    noise_region = data12[:, lo: rois[5][1]]
    noise_std = np.std(noise_region, axis=1)
    return assemble_meta(
        data12, noise_std, data12.shape[-1], rois,
        cfg=cfg, phase=phase, rng=rng, record_id=record_id,
    )


def assemble_meta(
    data12: np.ndarray,
    noise_std: np.ndarray,
    beat_len: int,
    rois: np.ndarray,
    *,
    cfg,
    phase: str,
    rng: np.random.Generator,
    record_id: str = "",
) -> dict:
    """Second stage shared by the numpy and native (C++) preprocessing paths:
    data12 is already normalized (padded or unpadded); noise_std is the
    per-lead sigma; beat_len the true (unpadded) beat length."""
    noise = rng.normal(loc=0.0, scale=noise_std, size=(beat_len, 12))

    # viewpoint-angle jitter, train only (tianchi.py:77-82,119-121)
    theta = LEAD_THETA
    if cfg.MODEL.jitter_factor > 0 and phase == "train":
        jitter = rng.normal(scale=cfg.MODEL.jitter_factor / 180 * np.pi, size=theta.shape)
        theta = theta + jitter

    select, supervision, unsup = lead_partition(
        cfg.DATA.lead_num, cfg.DATA.super_mode, cfg.DATA.train_data_mode, rng
    )
    if cfg.DATA.super_mode in REST_EQUALS_SUPERVISION:
        rest = list(supervision)
    else:
        rest = [x for x in supervision if x not in select]
    target_index = int(rng.choice(rest))
    rest = rest + unsup  # unsupervised leads appended at the END (tianchi.py:194)

    meta = {
        "data": _pad_to(data12[select]).astype(np.float32),
        "rois": rois.astype(np.int64),
        "input_theta": theta[select].astype(np.float32),
        "target_view": _pad_to(data12[target_index]).astype(np.float32),
        "target_theta": theta[target_index].astype(np.float32),
        "id": record_id,
        "ori_data": _pad_to(data12).astype(np.float32),
        "rest_view": _pad_to(data12[rest]).astype(np.float32),
        "rest_theta": theta[rest].astype(np.float32),
        "noise": _pad_to(noise[:, target_index]).astype(np.float32),
        "unsupervision_lead_name": list(unsup),
    }
    return meta
