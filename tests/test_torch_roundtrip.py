"""Round-trip with a reference-TRAINED checkpoint: train the PyTorch
reference on CPU (a few steps on synthetic beats), save through the
reference's CheckPointer, import the .pkl via training/torch_import, and
assert the JAX evaluation matches the torch evaluation — parity on trained
weights (SGD+momentum + dropout + BN running-stat dynamics), not just init.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/codes"),
    reason="reference checkout not available",
)


def test_trained_checkpoint_roundtrip(tmp_path):
    from tools.torch_roundtrip import (
        eval_imported,
        eval_reference,
        make_synth_batches,
        train_reference,
    )

    batches = make_synth_batches(batch=4, n_batches=4, seed=0)
    pkl, curve = train_reference(batches, str(tmp_path), epochs=2)
    assert curve[-1] < curve[0], f"reference training did not learn: {curve}"
    assert os.path.exists(pkl)
    # the reference CheckPointer also writes the last_checkpoint pointer
    assert open(tmp_path / "last_checkpoint").read().strip().endswith("roundtrip.pkl")

    eval_b = make_synth_batches(batch=4, n_batches=1, seed=99)[0]
    rest_t, psnr_t = eval_reference(pkl, eval_b)
    rest_j, psnr_j, extras = eval_imported(pkl, eval_b)

    corr = float(np.corrcoef(rest_t.ravel(), rest_j.ravel())[0, 1])
    assert corr > 0.999999, f"trained-weights correlation {corr}"
    np.testing.assert_allclose(rest_j, rest_t, atol=5e-5)
    assert abs(psnr_t - psnr_j) < 0.01, (psnr_t, psnr_j)
    assert extras.get("epoch") == 1
