"""End-to-end CLI run with data_block_size > 0: CSV -> blocked h5 ->
streaming per-block retrieval -> training -> eval."""

import glob
import os

import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_blocked_pipeline_end_to_end(tmp_path, monkeypatch):
    from rat_tpu.cli.run_expid import run_experiment
    from rat_tpu.data.synthetic import make_mltag_like
    monkeypatch.chdir(tmp_path)
    make_mltag_like("./data/blk", n_train=4000, n_valid=800, n_test=800,
                    n_users=60, n_items=40, n_tags=15, seed=5)
    cfg = tmp_path / "configs"
    cfg.mkdir()
    model_cfg = {
        "RAT_m2_blk": {
            "dataset_id": "blk_retrieval", "model": "RAT_m2",
            "model_id": "RAT_m2_blk", "model_root": "./exps/",
            "batch_size": 256, "embedding_dim": 8,
            "dnn_hidden_units": [16], "dnn_activations": "relu",
            "embedding_regularizer": 0.01, "net_regularizer": 0,
            "net_dropout": 0, "batch_norm": False, "learning_rate": 2e-3,
            "epochs": 3, "num_heads": 2, "depth": 1, "dim_head": 8,
            "dropout": 0.0, "emb_dropout": 0.0, "scale_dim": 2,
            "use_wide": False, "retrieval_augmented": True,
            "metrics": ["AUC", "logloss"], "monitor": "AUC",
            "monitor_mode": "max", "patience": 5, "every_x_epochs": 1,
            "seed": 11, "shuffle": True, "verbose": 0,
            "loss": "binary_crossentropy", "optimizer": "adam",
            "task": "binary_classification", "save_best_only": True,
            "data_block_size": 1500,  # -> 3 train blocks
        }
    }
    dataset_cfg = {
        "blk_retrieval": {
            "data_format": "csv", "data_root": "./data/",
            "feature_cols": [{"active": True, "dtype": "float",
                              "name": ["user_id", "item_id", "tag_id"],
                              "type": "categorical"}],
            "label_col": {"dtype": "float", "name": "label"},
            "min_categr_count": 1,
            "train_data": "./data/blk/train.csv",
            "valid_data": "./data/blk/valid.csv",
            "test_data": "./data/blk/test.csv",
            "retrieval_configs": {
                "used_cols": ["user_id", "item_id", "tag_id"],
                "exact_match_cols": [], "split_type": "4-fold",
                "label_wise": False, "pool_ratio": 0.2,
                "pre_retrieval": True, "enable_clean": False,
                "qry_batch_size": 2000, "db_chunk_size": 4000, "topK": 3,
            },
        }
    }
    (cfg / "model_config.yaml").write_text(yaml.dump(model_cfg))
    (cfg / "dataset_config.yaml").write_text(yaml.dump(dataset_cfg))

    valid, test = run_experiment(str(cfg), "RAT_m2_blk")
    # blocked artifacts exist and retrieval was cached per block
    blocks = sorted(glob.glob("./data/blk_retrieval/train_part_*.h5"))
    assert len(blocks) == 3, blocks
    caches = glob.glob("./data/blk_retrieval/retrieval_3_train_part_*.h5")
    assert len(caches) == 3, caches
    assert valid["AUC"] > 0.55, valid
    assert np.isfinite(test["logloss"])
