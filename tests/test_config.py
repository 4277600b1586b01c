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


def test_shipped_variant_configs_load_and_build():
    """Every shipped experiment config must parse and build its model
    (BASELINE configs list includes the m0/m1/m3 ablation heads)."""
    import glob
    import os

    import numpy as np

    from rat_tpu.features import FeatureMap
    from rat_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fm = FeatureMap("cfg_check", ".")
    fm.feature_specs = {
        "user_id": {"source": "", "type": "categorical", "vocab_size": 16,
                    "index": 0},
        "item_id": {"source": "", "type": "categorical", "vocab_size": 16,
                    "index": 1},
        "tag_id": {"source": "", "type": "categorical", "vocab_size": 16,
                   "index": 2},
    }
    fm.num_fields, fm.num_features, fm.input_length = 3, 48, 3

    checked = 0
    for cfg_dir in sorted(glob.glob(os.path.join(repo, "configs", "RAT_m*",
                                                 "movielenslatest_x1"))):
        variant = cfg_dir.split(os.sep)[-2]
        expid = f"{variant}_movielenslatest_x1_10fold_retrieval"
        params = load_config(cfg_dir, expid)
        assert params["model"] == variant
        model = build_model(fm, params)
        import jax
        import jax.numpy as jnp
        X = jnp.zeros((2, 6, 3), jnp.int32)
        y = jnp.zeros((2, 6), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
        out = model.apply(variables, X, y, train=False)
        assert np.isfinite(np.asarray(out["y_pred"])).all()
        checked += 1
    assert checked == 4  # m0, m1, m2, m3
