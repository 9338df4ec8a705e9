"""Tianchi single-beat dataset (reference EcgTianChiInterval, tianchi.py:46-228).

Records are 8-lead, 5000-sample int `.npy` files plus breakpoint JSONs with
keys "P on"/"P off"/"R on"/"R off"/"T on"/"T off" (the annotation tool's output
schema, AnnotationTools/window.py:221-233). Each __getitem__ picks one random
heartbeat, derives the 4 augmented leads, builds the 7 contiguous ROIs, and
assembles the fixed-shape meta dict.

TPU-relevant differences from the reference:
  * randomness flows through a numpy Generator seeded per (epoch, index) so
    examples are reproducible and epoch-reshuffles are deterministic;
  * an offline beat index (record -> number of beats) is built once so the
    pipeline can also iterate *all* beats of a record (the dense-panorama
    multi-beat workload) instead of one random beat.
"""

from __future__ import annotations

import json
import os

import numpy as np

from electrocardio_panorama_tpu.data.beats import beat_rois, build_meta
from electrocardio_panorama_tpu.data.leads import derive_augmented_leads


class TianchiBeatDataset:
    def __init__(self, cfg, phase: str):
        self.cfg = cfg
        self.phase = phase
        label_path = (
            cfg.DATA.train_label_path if phase == "train" else cfg.DATA.test_label_path
        )
        with open(label_path) as f:
            self.records = [ln for ln in f.read().splitlines() if ln.strip()]
        self.data_root = cfg.DATA.train_data_root
        self.label_root = cfg.DATA.train_label_root
        self._label_cache: dict[str, dict] = {}

    def __len__(self) -> int:
        return len(self.records)

    def _load(self, name: str):
        data = np.load(
            os.path.join(self.data_root, name.replace(".json", ".npy"))
        ).astype(np.float64)
        if name not in self._label_cache:
            with open(os.path.join(self.label_root, name)) as f:
                self._label_cache[name] = json.loads(f.read())
        return data, self._label_cache[name]

    def num_beats(self, index: int) -> int:
        _, label = self._load(self.records[index])
        return len(label["P on"]) - 1

    def get_beat(self, index: int, beat_index: int, rng: np.random.Generator) -> dict:
        name = self.records[index]
        data8, label = self._load(name)
        data12 = derive_augmented_leads(data8)
        rois, p_on, end_point = beat_rois(label, beat_index, data12.shape[-1])
        beat = data12[:, p_on:end_point]
        return build_meta(
            beat, rois, cfg=self.cfg, phase=self.phase, rng=rng, record_id=name
        )

    def __getitem__(self, index: int, rng: np.random.Generator | None = None) -> dict:
        rng = rng or np.random.default_rng()
        n = self.num_beats(index)
        beat_index = int(rng.integers(0, n))  # random.sample(range(n), 1) parity
        return self.get_beat(index, beat_index, rng)
