"""bf16 matmul-precision quality gate (VERDICT r2 item 4 / ROADMAP).

Policy: rat_tpu defaults to strict float32 matmuls for quality parity
with the reference (torch fp32, AMP disabled — rat_tpu/__init__.py).
``RAT_TPU_MATMUL_PRECISION=bfloat16`` trades accuracy for MXU speed and
is allowed when the measured AUC delta stays under the gate below.

This test trains the SAME experiment twice — fp32 vs bfloat16 matmul
precision — at a KKBox-like shape (d=40, 8 heads, batch_norm on, the
regime where reduced precision could plausibly move quality) and
asserts the AUC/logloss deltas stay inside the gate. It needs real MXU
hardware: on the CPU backend the precision setting is a no-op, so the
measurement would be vacuous — run with RAT_TPU_TEST_PLATFORM=tpu.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="bf16 vs fp32 only differs on the MXU; run with "
           "RAT_TPU_TEST_PLATFORM=tpu")

AUC_GATE = 0.005
LOGLOSS_GATE = 0.01

K = 3
VOCABS = {"user_id": 300, "item_id": 200, "tag_id": 50}


def _synth_rows(n, rng):
    u = rng.randint(0, VOCABS["user_id"], n)
    i = rng.randint(0, VOCABS["item_id"], n)
    t = rng.randint(0, VOCABS["tag_id"], n)
    logit = 1.1 * (u % 3 == 0) + 0.8 * (i % 2 == 0) + 0.5 * (t % 4 == 0) - 1.2
    y = (rng.rand(n) < 1.0 / (1.0 + np.exp(-2.5 * logit))).astype(np.float64)
    return np.stack([u, i, t, y], axis=1).astype(np.float64)


def _train_once(tmp_path, tag):
    from rat_tpu.data.io import save_hdf5
    from rat_tpu.data.loader import DataGenerator
    from rat_tpu.engine import Trainer
    from rat_tpu.features import FeatureMap

    rng = np.random.RandomState(11)
    d = tmp_path / tag
    d.mkdir()
    train_h5, valid_h5 = str(d / "train.h5"), str(d / "valid.h5")
    save_hdf5(_synth_rows(8192, rng), train_h5)
    save_hdf5(_synth_rows(2048, rng), valid_h5)

    fm = FeatureMap("bf16_" + tag, ".")
    fm.feature_specs.update(
        {name: {"source": "", "type": "categorical", "vocab_size": v,
                "index": idx}
         for idx, (name, v) in enumerate(VOCABS.items())})
    fm.num_fields = 3
    fm.num_features = sum(VOCABS.values())
    fm.input_length = 3

    rc = {"used_col_indices": [0, 1, 2], "exact_match_col_indices": None,
          "split_type": "2-fold", "label_wise": False, "pre_retrieval": True,
          "topK": K, "qry_batch_size": 2048, "db_chunk_size": 4096}
    train_gen = DataGenerator(data_path=train_h5, batch_size=1024,
                              shuffle=False, feature_map=fm,
                              retrieval_configs=rc,
                              retrieval_pool_fname="self",
                              retrieval_augmented=True)
    valid_gen = DataGenerator(data_path=valid_h5, batch_size=1024,
                              shuffle=False, feature_map=fm,
                              retrieval_configs=rc,
                              retrieval_pool_fname=train_h5,
                              retrieval_augmented=True)

    # KKBox-like shape: d=40, 8 heads, batch_norm on
    params = dict(model="RAT_m2", model_id="RAT_m2_bf16_" + tag,
                  model_root=str(tmp_path / ("exps_" + tag)),
                  batch_size=1024, learning_rate=1e-3, epochs=4,
                  embedding_dim=40, dnn_hidden_units=[64, 32],
                  dnn_activations="relu", num_heads=8, dim_head=10,
                  depth=2, scale_dim=4, dropout=0.0, emb_dropout=0.0,
                  net_dropout=0.0, batch_norm=True, use_wide=True,
                  embedding_regularizer="l2(1.e-5)", net_regularizer=0,
                  metrics=["AUC", "logloss"], monitor="AUC",
                  monitor_mode="max", patience=4, every_x_epochs=1,
                  save_best_only=True, reduce_lr_on_plateau=True,
                  shuffle=False, verbose=0, seed=5,
                  loss="binary_crossentropy", optimizer="adam",
                  task="binary_classification")
    trainer = Trainer(fm, params)
    import os
    os.makedirs(trainer.model_dir, exist_ok=True)
    trainer.init_state(np.zeros((2, 1 + K, 3), np.int32),
                       np.zeros((2, 1 + K), np.float32))
    trainer.fit(train_gen, validation_data=valid_gen, epochs=4)
    return trainer.evaluate(valid_gen)


@pytest.mark.slow
def test_bf16_matmul_auc_delta_inside_gate(tmp_path):
    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "float32")
        fp32 = _train_once(tmp_path, "fp32")
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        bf16 = _train_once(tmp_path, "bf16")
    finally:
        jax.config.update("jax_default_matmul_precision", prev)

    d_auc = abs(fp32["AUC"] - bf16["AUC"])
    d_ll = abs(fp32["logloss"] - bf16["logloss"])
    print("\n[bf16 gate] fp32 AUC {:.6f} logloss {:.6f} | bf16 AUC {:.6f} "
          "logloss {:.6f} | delta AUC {:.2e} logloss {:.2e}".format(
              fp32["AUC"], fp32["logloss"], bf16["AUC"], bf16["logloss"],
              d_auc, d_ll))
    assert d_auc < AUC_GATE, (fp32, bf16)
    assert d_ll < LOGLOSS_GATE, (fp32, bf16)
