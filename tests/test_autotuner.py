"""Autotuner: tuner_space expansion into hashed expids + config files."""

import os

import pytest
import yaml

from rat_tpu.autotuner import enumerate_params, load_experiment_ids


def test_enumerate_params_expands_grid(tmp_path):
    tuner_cfg = {
        "base_expid": "RAT_m2_base",
        "model_config": {
            "Base": {"model_root": "./exps/", "debug": False},
            "RAT_m2_base": {
                "model": "RAT_m2", "dataset_id": "ds1",
                "learning_rate": 1e-3, "embedding_dim": 10,
            },
        },
        "dataset_config": {
            "ds1": {"data_format": "csv", "data_root": "./data/",
                    "min_categr_count": 1},
        },
        "tuner_space": {
            "learning_rate": [1e-3, 1e-4],
            "embedding_dim": [8, 16, 32],
        },
    }
    cfg_file = tmp_path / "tuner.yaml"
    cfg_file.write_text(yaml.dump(tuner_cfg))
    out_dir = enumerate_params(str(cfg_file))
    assert os.path.isdir(out_dir)
    with open(os.path.join(out_dir, "model_config.yaml")) as f:
        combos = yaml.safe_load(f)
    # 2 lrs x 3 dims = 6 expids, hashed and numbered
    assert len(combos) == 6
    lrs = sorted({c["learning_rate"] for c in combos.values()})
    dims = sorted({c["embedding_dim"] for c in combos.values()})
    assert lrs == [1e-4, 1e-3] and dims == [8, 16, 32]
    ids = load_experiment_ids(out_dir)
    assert len(ids) == 6
    assert all(i.startswith("RAT_m2_base_") for i in ids)


def test_enumerate_params_rejects_unknown_keys(tmp_path):
    tuner_cfg = {
        "base_expid": "e1",
        "model_config": {"e1": {"model": "RAT_m2", "dataset_id": "ds1",
                                "debug": False}},
        "dataset_config": {"ds1": {"data_format": "csv"}},
        "tuner_space": {"not_a_real_param": [1, 2]},
    }
    cfg_file = tmp_path / "tuner.yaml"
    cfg_file.write_text(yaml.dump(tuner_cfg))
    with pytest.raises(RuntimeError):
        enumerate_params(str(cfg_file))


def test_enumerate_params_expands_dataset_params(tmp_path):
    tuner_cfg = {
        "base_expid": "e1",
        "model_config": {"e1": {"model": "RAT_m2", "dataset_id": "ds1",
                                "debug": False}},
        "dataset_config": {"ds1": {"data_format": "csv",
                                   "min_categr_count": 1}},
        "tuner_space": {"min_categr_count": [1, 5]},
    }
    cfg_file = tmp_path / "tuner.yaml"
    cfg_file.write_text(yaml.dump(tuner_cfg))
    out_dir = enumerate_params(str(cfg_file))
    with open(os.path.join(out_dir, "dataset_config.yaml")) as f:
        ds = yaml.safe_load(f)
    assert len(ds) == 2  # one hashed dataset id per combination


def test_grid_search_slot_env(tmp_path):
    """Slots carry environment overrides (chip sets / mesh topologies /
    platform pins) into each run_expid subprocess."""
    from rat_tpu.autotuner import grid_search

    tuner_cfg = {
        "base_expid": "RAT_m2_base",
        "model_config": {
            "Base": {"model_root": "./exps/"},
            "RAT_m2_base": {"model": "RAT_m2", "dataset_id": "ds1",
                            "learning_rate": 1e-3},
        },
        "dataset_config": {"ds1": {"data_format": "csv"}},
        "tuner_space": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    }
    cfg_file = tmp_path / "tuner.yaml"
    cfg_file.write_text(yaml.dump(tuner_cfg))
    out_dir = enumerate_params(str(cfg_file))

    outdir = tmp_path / "marks"
    outdir.mkdir()
    (tmp_path / "dummy_runner.py").write_text(
        "import argparse, os\n"
        "p = argparse.ArgumentParser()\n"
        "for a in ('--version', '--config', '--expid'):\n"
        "    p.add_argument(a)\n"
        "args = p.parse_args()\n"
        "open(os.path.join(os.environ['MARK_DIR'],\n"
        "     args.expid), 'w').write(os.environ['SLOT_MARK'])\n")
    slots = [{"PYTHONPATH": str(tmp_path), "MARK_DIR": str(outdir),
              "SLOT_MARK": m} for m in ("chips:0,1", "chips:2,3")]
    grid_search("tpu", out_dir, slots, runner="dummy_runner")
    marks = {f.name: f.read_text() for f in outdir.iterdir()}
    assert len(marks) == 3
    assert set(marks.values()) <= {"chips:0,1", "chips:2,3"}


@pytest.mark.slow
def test_grid_search_end_to_end_cpu_sweep(tmp_path, monkeypatch):
    """The real scheduling loop (slot reuse, poll, drain) drives actual
    run_expid subprocesses: a 2-slot CPU sweep over 3 tiny expids, one
    slot pinning a 2x1 mesh, must produce a results CSV per expid
    (VERDICT r2 item 8). Slots pin the platform via RAT_TPU_PLATFORM
    (an in-process jax.config update — site hooks may override the
    JAX_PLATFORMS env var itself)."""
    import pathlib

    import rat_tpu
    from rat_tpu.autotuner import grid_search
    from rat_tpu.cli.run_expid import run_experiment
    from rat_tpu.data.synthetic import make_mltag_like

    repo_root = str(pathlib.Path(rat_tpu.__file__).parents[1])
    monkeypatch.chdir(tmp_path)
    make_mltag_like("./data/sweep", n_train=1200, n_valid=300, n_test=300,
                    n_users=40, n_items=30, n_tags=10, seed=4)

    tuner_cfg = {
        "base_expid": "RAT_m2_sweep",
        "model_config": {
            "Base": {
                "model_root": "./exps/", "batch_size": 512,
                "embedding_dim": 8, "dnn_hidden_units": [16],
                "dnn_activations": "relu", "embedding_regularizer": 0,
                "net_regularizer": 0, "net_dropout": 0, "batch_norm": False,
                "epochs": 1, "num_heads": 2, "depth": 1, "dim_head": 8,
                "dropout": 0.0, "emb_dropout": 0.0, "scale_dim": 2,
                "use_wide": False, "retrieval_augmented": True,
                "metrics": ["AUC", "logloss"], "monitor": "AUC",
                "monitor_mode": "max", "patience": 2, "every_x_epochs": 1,
                "seed": 7, "shuffle": False, "verbose": 0,
                "loss": "binary_crossentropy", "optimizer": "adam",
                "task": "binary_classification", "save_best_only": True,
            },
            "RAT_m2_sweep": {"model": "RAT_m2", "dataset_id": "sweep",
                             "learning_rate": 1e-3},
        },
        "dataset_config": {
            "sweep": {
                "data_format": "csv", "data_root": "./data/",
                "feature_cols": [{"active": True, "dtype": "float",
                                  "name": ["user_id", "item_id", "tag_id"],
                                  "type": "categorical"}],
                "label_col": {"dtype": "float", "name": "label"},
                "min_categr_count": 1,
                "train_data": "./data/sweep/train.csv",
                "valid_data": "./data/sweep/valid.csv",
                "test_data": "./data/sweep/test.csv",
                "retrieval_configs": {
                    "used_cols": ["user_id", "item_id", "tag_id"],
                    "exact_match_cols": [], "split_type": "2-fold",
                    "label_wise": False, "pool_ratio": 0.2,
                    "pre_retrieval": True, "enable_clean": False,
                    "qry_batch_size": 2000, "db_chunk_size": 5000,
                    "topK": 2,
                },
            },
        },
        "tuner_space": {"learning_rate": [1e-3, 5e-4, 1e-4]},
    }
    cfg_file = tmp_path / "tuner.yaml"
    cfg_file.write_text(yaml.dump(tuner_cfg))
    out_dir = enumerate_params(str(cfg_file))
    expids = load_experiment_ids(out_dir)
    assert len(expids) == 3

    # prebuild the shared dataset artifacts once in-process so the
    # concurrent subprocesses only ever READ the h5/retrieval caches
    run_experiment(out_dir, expids[0], platform="cpu")

    slots = [
        {"RAT_TPU_PLATFORM": "cpu", "PYTHONPATH": repo_root},
        {"RAT_TPU_PLATFORM": "cpu", "PYTHONPATH": repo_root,
         "RAT_TPU_MESH": "2x1",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    ]
    grid_search("tpu", out_dir, slots)

    with open(os.path.join(out_dir, "dataset_config.yaml")) as f:
        ds_ids = list(yaml.safe_load(f))
    assert len(ds_ids) == 1
    for expid in expids:
        csv = os.path.join("./exps", ds_ids[0], expid + ".csv")
        assert os.path.exists(csv), "missing results CSV for " + expid
        assert "[exp_id] " + expid in open(csv).read()
