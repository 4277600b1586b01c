"""Scientific check of the RAT mechanism: retrieval-augmented training
must beat the same model without neighbors on data where co-occurring
(user, item) rows carry label information — the signal the BM25
neighbors surface (the RAT paper's premise)."""

import numpy as np
import pandas as pd
import pytest
import yaml


@pytest.mark.slow
def test_retrieval_augmentation_improves_auc(tmp_path, monkeypatch):
    from rat_tpu.cli.run_expid import run_experiment
    monkeypatch.chdir(tmp_path)

    # dense repeat structure: ~4 rows per (user, item) pair, label driven
    # mostly by a latent pair affinity -> neighbors with the same pair
    # are strongly predictive
    rng = np.random.RandomState(3)
    n_users, n_items, n = 60, 40, 10000
    pair_logit = rng.normal(0, 2.0, (n_users, n_items))
    user = rng.randint(0, n_users, n)
    item = rng.randint(0, n_items, n)
    tag = rng.randint(0, 10, n)
    prob = 1 / (1 + np.exp(-pair_logit[user, item]))
    label = (rng.uniform(size=n) < prob).astype(np.float64)
    df = pd.DataFrame({"user_id": user.astype(np.float64),
                       "item_id": item.astype(np.float64),
                       "tag_id": tag.astype(np.float64), "label": label})
    (tmp_path / "data" / "rq").mkdir(parents=True)
    df.iloc[:8000].to_csv("./data/rq/train.csv", index=False)
    df.iloc[8000:9000].to_csv("./data/rq/valid.csv", index=False)
    df.iloc[9000:].to_csv("./data/rq/test.csv", index=False)

    base_model = {
        "model": "RAT_m2", "model_root": "./exps/", "batch_size": 512,
        "embedding_dim": 8, "dnn_hidden_units": [32], "dnn_activations": "relu",
        "embedding_regularizer": 0.005, "net_regularizer": 0, "net_dropout": 0,
        "batch_norm": False, "learning_rate": 2e-3, "epochs": 8,
        "num_heads": 2, "depth": 1, "dim_head": 8, "dropout": 0.0,
        "emb_dropout": 0.0, "scale_dim": 2, "use_wide": False,
        "metrics": ["AUC", "logloss"], "monitor": "AUC", "monitor_mode": "max",
        "patience": 3, "every_x_epochs": 1, "seed": 9, "shuffle": True,
        "verbose": 0, "loss": "binary_crossentropy", "optimizer": "adam",
        "task": "binary_classification", "save_best_only": True,
    }
    dataset = {
        "data_format": "csv", "data_root": "./data/",
        "feature_cols": [{"active": True, "dtype": "float",
                          "name": ["user_id", "item_id", "tag_id"],
                          "type": "categorical"}],
        "label_col": {"dtype": "float", "name": "label"},
        "min_categr_count": 1,
        "train_data": "./data/rq/train.csv",
        "valid_data": "./data/rq/valid.csv",
        "test_data": "./data/rq/test.csv",
    }
    retrieval = {
        "used_cols": ["user_id", "item_id", "tag_id"],
        "exact_match_cols": [], "split_type": "4-fold", "label_wise": False,
        "pool_ratio": 0.2, "pre_retrieval": True, "enable_clean": False,
        "qry_batch_size": 4000, "db_chunk_size": 8000, "topK": 5,
    }
    cfg = tmp_path / "configs"
    cfg.mkdir()
    (cfg / "model_config.yaml").write_text(yaml.dump({
        "rat_with_retrieval": dict(base_model, dataset_id="rq_retrieval",
                                   model_id="with_r", retrieval_augmented=True),
        "rat_no_retrieval": dict(base_model, dataset_id="rq_retrieval",
                                 model_id="no_r", retrieval_augmented=False),
    }))
    (cfg / "dataset_config.yaml").write_text(yaml.dump({
        "rq_retrieval": dict(dataset, retrieval_configs=retrieval),
    }))

    _, test_with = run_experiment(str(cfg), "rat_with_retrieval")
    _, test_without = run_experiment(str(cfg), "rat_no_retrieval")
    # neighbors carry the pair-affinity labels the model cannot infer
    # from 8k rows of embeddings alone
    assert test_with["AUC"] > test_without["AUC"] + 0.01, \
        (test_with, test_without)
    assert test_with["AUC"] > 0.73, test_with
