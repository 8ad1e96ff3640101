"""Test configuration: run everything on a fake 8-device CPU mesh.

SURVEY.md §4: multi-device behavior is validated without a TPU pod by
forcing the host platform to expose 8 virtual devices. These env vars must
be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU suite (VERDICT r4 item 6): the
# big mesh compiles (multi_step/eval_step/grad-of-shard_map, 15-50 s
# EACH) are identical across runs — cached, a full-suite rerun drops
# them to ~2 s loads. Keyed on HLO, so code changes invalidate exactly
# the programs they change. Separate dir from the TPU cache
# (/root/.cache/jax_fpsg). The "machine feature +prefer-no-scatter"
# load warnings are XLA preference pseudo-flags, not real ISA features
# — benign (verified same-machine round-trip, round 5).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fpsg_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Fast per-subsystem gate: `pytest -m core` (<5 min total on this host).
#
# One or two representative tests per subsystem, picked from the full
# suite's measured durations (VERDICT r3 item 8). The full suite stays
# the pre-commit bar; this tier is the cheap green gate for iteration.
# Durations (2026-08-20 full-suite run): each pick <=20 s, sum ~2.5 min.
# ---------------------------------------------------------------------------

CORE_TESTS = {
    # ops: kernels against oracles
    "test_ops_chamfer.py::test_grad_matches_autodiff_of_oracle[oracle]",
    "test_ops_emd.py::test_fixed_point_matches_numpy_oracle",
    "test_ops_knn.py::test_matches_bruteforce",
    "test_ops_conv3x3.py::test_fused_conv_bn_matches_unfused_exactly[True-True]",
    "test_ops_moments.py::test_vmap_matches_oracle",
    "test_ops_edgeconv.py::test_knn_aggregate_matches_oracle",
    "test_ops_scatter.py::test_collisions_and_empty_segments",
    # nn: BN semantics, backbones, decoder
    "test_nn_batchnorm.py::test_train_output_and_running_stats_match_torch",
    "test_nn_backbones.py::test_dgcnn_shape",
    "test_nn_backbones.py::test_decoder_shape_and_bounds",
    # models
    "test_model.py::test_loss_keys_and_finiteness",
    "test_model.py::test_dgcnn_backbone",
    # train: step + optimizer
    "test_train_step.py::test_eval_step",
    "test_optim.py::test_f32_compact_matches_optax_adam_exactly",
    "test_transient_retry.py::test_deterministic_errors_fail_fast",
    # parallel: one leg per axis family
    "test_shard_map_step.py::test_shard_map_grads_are_synced",
    "test_sp_sharding.py::test_values_match_oracle",
    "test_pp_pipeline.py::test_repeated_forward_matches_sequential",
    # data + io
    "test_data.py::test_eligibility_mask",
    "test_io_torch.py::test_golden_pointnet_feature_parity",
    "test_native_io.py::test_ply_parse_matches_python",
    # serving
    "test_serve.py::test_generate_keyed_batching_invariant",
    "test_serve_http.py::test_key_data_matches_prngkey",
    # cli + parity oracles
    "test_cli_end_to_end.py::test_random_init_vgg_warns_loudly",
    "test_reference_source_parity.py::test_stn3d_matches_reference_source",
    "test_reference_source_parity.py::test_dgcnn_matches_reference_source",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid is "tests/test_x.py::test_y"; match on the tail
        tail = item.nodeid.split("/")[-1]
        if tail in CORE_TESTS:
            item.add_marker(pytest.mark.core)
