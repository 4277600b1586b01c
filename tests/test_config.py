"""Config system tests: Base/expid/dataset merge precedence."""

import pytest
import yaml

from rat_tpu.utils import Monitor, load_config, print_to_list


def _write_configs(tmp_path, model, dataset):
    (tmp_path / "model_config.yaml").write_text(yaml.dump(model))
    (tmp_path / "dataset_config.yaml").write_text(yaml.dump(dataset))
    return str(tmp_path)


def test_expid_overrides_base(tmp_path):
    cfg = _write_configs(
        tmp_path,
        {"Base": {"batch_size": 32, "seed": 1},
         "exp1": {"dataset_id": "ds1", "batch_size": 64}},
        {"ds1": {"data_root": "./data/"}})
    params = load_config(cfg, "exp1")
    assert params["batch_size"] == 64       # expid wins
    assert params["seed"] == 1              # base inherited
    assert params["data_root"] == "./data/"  # dataset merged
    assert params["model_id"] == "exp1"


def test_missing_expid_raises(tmp_path):
    cfg = _write_configs(tmp_path, {"Base": {}}, {"ds1": {}})
    with pytest.raises(ValueError):
        load_config(cfg, "nope")


def test_missing_dataset_raises(tmp_path):
    cfg = _write_configs(tmp_path, {"exp1": {"dataset_id": "missing"}}, {"ds1": {}})
    with pytest.raises(RuntimeError):
        load_config(cfg, "exp1")


def test_monitor_weighted():
    m = Monitor({"AUC": 2, "logloss": -1})
    assert m.get_value({"AUC": 0.8, "logloss": 0.4}) == pytest.approx(1.2)
    m2 = Monitor("AUC")
    assert m2.get_value({"AUC": 0.7}) == pytest.approx(0.7)


def test_print_to_list():
    assert print_to_list({"AUC": 0.5}) == "AUC: 0.500000"


def test_multishard_base_overwrite_matches_reference(tmp_path):
    """Reference scan semantics (utils.py:34-41): a later shard's Base
    overwrites an earlier one's, and the shard that completes the set
    supplies both sections."""
    mc = tmp_path / "model_config"
    mc.mkdir()
    (mc / "a.yaml").write_text(yaml.dump({"Base": {"batch_size": 32,
                                                   "seed": 1}}))
    (mc / "b.yaml").write_text(yaml.dump({"other_exp": {"dataset_id": "ds1"}}))
    (mc / "c.yaml").write_text(yaml.dump(
        {"Base": {"batch_size": 128},
         "exp1": {"dataset_id": "ds1"}}))
    (tmp_path / "dataset_config.yaml").write_text(
        yaml.dump({"ds1": {"data_root": "./data/"}}))
    params = load_config(str(tmp_path), "exp1")
    assert params["batch_size"] == 128   # c.yaml's Base, not a.yaml's
    assert "seed" not in params          # a.yaml's Base fully replaced
