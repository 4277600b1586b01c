"""Test environment: force CPU for the main suite (fast single-device
compiles). Mesh/sharding tests (test_parallel.py) re-exec in a
subprocess with ``--xla_force_host_platform_device_count=8`` so the
pjit code paths run on an 8-virtual-device mesh without TPU hardware
(SURVEY.md §4: multi-host-without-a-cluster strategy)."""

import os

# NOTE: some environments (e.g. the axon TPU tunnel) export
# JAX_PLATFORMS and a sitecustomize hook that override the env var, so
# the platform must be forced through jax.config, not the environment.
# Set RAT_TPU_TEST_PLATFORM=tpu to run the hardware-marked tests
# (tests/test_pallas.py etc.) on a real chip instead.
_test_platform = os.environ.get("RAT_TPU_TEST_PLATFORM", "cpu")
if _test_platform == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if _test_platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: trainer-step compiles dominate suite time on
# small CPU hosts, and they are identical across tests and runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture()
def tiny_feature_map(tmp_path):
    """3 categorical fields, tiny vocabs."""
    from rat_tpu.features import FeatureMap
    fm = FeatureMap("tiny", str(tmp_path))
    fm.feature_specs = {
        "user_id": {"source": "", "type": "categorical", "vocab_size": 20, "index": 0},
        "item_id": {"source": "", "type": "categorical", "vocab_size": 15, "index": 1},
        "tag_id": {"source": "", "type": "categorical", "vocab_size": 10, "index": 2},
    }
    fm.num_fields = 3
    fm.num_features = 45
    fm.input_length = 3
    return fm


@pytest.fixture()
def demo_params():
    return {
        "model": "RAT_m2",
        "model_id": "RAT_m2_test",
        "model_root": None,  # filled by tests with tmp dirs
        "embedding_dim": 8,
        "dnn_hidden_units": [16, 16],
        "dnn_activations": "relu",
        "num_heads": 2,
        "dim_head": 8,
        "depth": 1,
        "scale_dim": 2,
        "dropout": 0.0,
        "emb_dropout": 0.0,
        "net_dropout": 0.0,
        "batch_norm": False,
        "use_wide": True,
        "embedding_regularizer": 0.001,
        "net_regularizer": 0,
        "learning_rate": 1e-3,
        "optimizer": "adam",
        "metrics": ["AUC", "logloss"],
        "monitor": "AUC",
        "monitor_mode": "max",
        "patience": 2,
        "every_x_epochs": 1,
        "seed": 42,
    }
