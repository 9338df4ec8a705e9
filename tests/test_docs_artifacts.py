"""Integrity checks for the committed training-artifact scalars.

Guards a real failure mode hit during round 3: re-running a recipe into an
existing output_dir auto-resumes from the stale checkpoint and APPENDS to its
tf_logs/scalars.jsonl, silently producing a mixed-provenance curve with
duplicate epochs. The committed docs artifacts must always be one clean run.
"""

import json
import pathlib

import pytest

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"

SCALAR_FILES = [
    ("convergence_scalars.jsonl", 150),
    ("ptb_convergence_scalars.jsonl", 90),
]


@pytest.mark.parametrize("name,n_epochs", SCALAR_FILES)
def test_committed_scalars_are_one_clean_run(name, n_epochs):
    rows = [json.loads(l) for l in (DOCS / name).read_text().splitlines() if l.strip()]
    steps = [r["step"] for r in rows]
    assert len(rows) == n_epochs, f"{name}: {len(rows)} rows, expected {n_epochs}"
    assert sorted(steps) == list(range(n_epochs)), (
        f"{name}: steps are not the contiguous 0..{n_epochs - 1} range "
        "(duplicate epochs mean a stale run was appended to)"
    )
    required = {"train_loss_all", "test_loss_all", "psnr_gen", "psnr_reg",
                "ssim_gen", "ssim_reg"}
    for r in rows:
        missing = required - r.keys()
        assert not missing, f"{name} step {r['step']}: missing {missing}"
