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
