"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's tests were CUDA-only scripts (SURVEY.md §4); here every test
is CPU-runnable, and multi-device sharding tests use XLA's host-platform
device-count override.

NOTE: the environment's sitecustomize registers the axon TPU plugin and sets
``jax_platforms="axon,cpu"`` programmatically at interpreter startup, which
overrides the JAX_PLATFORMS env var — so the platform must be forced back to
CPU via jax.config here, before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


# ---------------------------------------------------------------------------
# Quick-smoke tier (`pytest -m smoke`, target <5 min): one representative
# test per subsystem — config/arch, one interpret-mode test per kernel
# family, model forward+grad, one golden-parity smoke, loss/optim/scheduler,
# data, sharding. The full suite stays the merge gate; this tier is the
# fast signal for kernel iterations.
# ---------------------------------------------------------------------------
SMOKE_TESTS = {
    # config + arch DSL
    "test_config.py::test_defaults_schema",
    "test_config.py::test_merge_from_file_reference_yaml",
    "test_config.py::test_parse_arch_zoo",
    # sliding-chunk core vs dense oracle (fwd, modes, grads)
    "test_sliding_chunk.py::test_forward_matches_dense",
    "test_sliding_chunk.py::test_modes_match_dense",
    "test_sliding_chunk.py::test_gradients_match_dense",
    # one interpret-mode test per Pallas kernel family
    "test_pallas_kernel.py::test_pallas_mh_matches_xla",
    "test_pallas_kernel.py::test_fused_mh_custom_vjp_grads",
    "test_mode_kernel.py::test_mode_fused_matches_xla_tier",
    "test_vil_block.py::test_block_forward_matches_oracle",
    "test_layer_norm.py::test_layer_norm_matches_flax",
    "test_pallas_kernel.py::test_fused_full_attention_matches_xla",
    # model (one sparse + one kernel-approximation attention family; the
    # other types are covered by the full suite)
    "test_msvit.py::test_forward_all_attention_types[performer]",
    "test_msvit.py::test_grad_flows",
    "test_msvit.py::test_build_model_from_cfg",
    # golden parity smoke (small 64px model vs the real torch reference,
    # flagship attention family only — all 5 types in the full suite)
    "test_torch_parity.py::test_logits_match_reference[longformerhand]",
    # train stack
    "test_train_stack.py::test_cross_entropy_matches_torch",
    "test_train_stack.py::test_qhm_matches_reference",
    "test_train_stack.py::test_schedulers_match_reference",
    # data + utils
    "test_data.py::test_tsv_roundtrip",
    "test_data.py::test_mixup",
    "test_utils.py::test_checkpointer_save_load_cycle",
    # sharding
    "test_distributed.py::test_mesh_creation",
    "test_graft_entry.py::test_entry_compiles",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("/")[-1]  # file.py::test[param]
        base = name.split("[", 1)[0]
        # an entry WITH a [param] selects that variant only; an entry
        # without selects every parametrization of the test
        if name in SMOKE_TESTS or base in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
