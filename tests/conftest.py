"""Test harness: force an 8-device virtual CPU platform before JAX initializes.

Emulates a v5e-8 slice for sharding tests without TPU hardware, per the
framework's multi-chip test strategy (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
# CPU AOT cache entries are machine-feature specific (SIGILL risk across
# hosts); the suite recompiles instead of touching the persistent cache.
os.environ["ECGPAN_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize pre-registers the TPU backend and pins
# jax_platforms="axon,cpu" regardless of the env var; force CPU before any
# backend initializes so the suite runs on the 8-device virtual mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --------------------------------------------------------------- test lanes
# Two lanes (README "Running the tests"): the fast lane
# `pytest -m "not slow"` verifies the core in <2 min on a 1-core host; the
# full lane (no -m) adds the jit-heavy parity/training tests (~20 min) and
# the 2-process multihost subprocess tests (up to 30 min).
#
# Kept as one central list (measured with --durations on this host, threshold
# ~4 s/test) rather than 40 scattered decorators so re-measuring is one edit.
# Matching is by test name (parametrized variants share their base name
# unless the id is listed explicitly).
_SLOW = {
    # test_resnet1d.py
    "test_forward_shapes[resnet50-bottleneck]",
    "test_forward_shapes[resnet101-bottleneck]",
    "test_forward_shapes[resnet152-bottleneck]",
    "test_forward_shapes[resnet18-basic]",
    "test_train_updates_bn_for_bottleneck",
    "test_grouped_lead_towers",
    "test_features_only",
    # test_model_parity.py
    "test_one_lead_recipe_trains",
    "test_theta_encoder_len_2",
    "test_gradient_parity[3]",
    "test_param_key_compat",
    "test_eval_forward_parity[3]",
    "test_grouped_decode_matches_sequential",
    # test_pallas_train_decoder.py
    "test_dp_shard_map_rides_fused_train_decoder",
    "test_solver_train_step_fused_matches_xla",
    "test_gradients_match_xla_grouped",
    # test_training.py
    "test_rng_impl_train_determinism",
    "test_train_two_epochs_and_resume",
    "test_train_step_fused_encoder",
    "test_mixed_precision_train_step",
    "test_solver_with_mesh_dp",
    "test_solver_orbax_backend_train_and_val",
    "test_eval_step_fused_decoder_matches_xla",
    "test_solver_paint_side_by_side",
    "test_eval_whole_sequence_metric_branch",
    # test_pallas_encoder.py
    "test_train_forward_and_grads_match_mask_oracle",
    "test_eval_forward_matches_encode_latents",
    # test_sharding.py
    "test_lead_parallel_panorama_matches_unsharded",
    "test_dp_train_step_exact_parity_with_single_device",
    "test_dp_step_mixed_precision",
    "test_dense_sweep_full_record_sharded",
    "test_dp_train_step_runs_and_matches_replicas",
    "test_view_sharded_panorama_matches_single_device",
    "test_view_sharded_panorama_fused_kernel",
    # test_pallas_decoder.py
    "test_fused_decoder_bf16_storage",
    "test_fused_decoder_matches_xla",
    "test_fused_decoder_nonuniform_bn_state",
    # misc
    "test_trained_checkpoint_roundtrip",      # test_torch_roundtrip.py
    "test_eval_parity",                       # test_nefnet2.py
    "test_prior_samples_roundtrip_close_to_dataset_anchor",  # test_synthesis.py
    "test_annotation_corpus_edge_beats_through_pipeline",    # test_real_data.py
    "test_real_records_train_eval_render_end_to_end",        # test_real_data.py
    "test_export_latents_and_prior_and_generate",            # test_synth_cli.py
    "test_full_workload_and_decode_flops",    # test_flops.py
    "test_train_step_flops",                  # test_flops.py
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW or item.originalname in _SLOW:
            item.add_marker(pytest.mark.slow)
        if item.module.__name__ == "tests.test_multihost" or \
                item.nodeid.startswith("tests/test_multihost.py"):
            item.add_marker(pytest.mark.slow)
            item.add_marker(pytest.mark.multihost)


@pytest.fixture
def rng():
    return np.random.default_rng(123)
