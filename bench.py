"""Benchmark: RAT_m2 (default RAT) training throughput, ML-Tag shaped.

Workload mirrors the reference's headline ML-Tag configuration
(configs/RAT_m2/movielenslatest_x1/model_config.yaml + SURVEY.md §6):
3 categorical fields (~90k rows total vocab), K=5 retrieved neighbors,
embedding_dim 10, 2 heads, depth 4, DNN 400x400x400, wide tower,
batch 4096, full train step (forward + BCE + L2-embedding reg + global
-norm clip + Adam) on synthetic data resident in device memory.

Baseline: the reference's single-GPU ML-Tag train throughput derived
from its committed logs: ~5.4e4 examples/s (SURVEY.md §6 / BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC = 5.4e4


def main():
    use_pallas = os.environ.get("RAT_TPU_BENCH_PALLAS", "0") == "1"
    import jax
    import jax.numpy as jnp
    from rat_tpu.engine import Trainer
    from rat_tpu.features import FeatureMap

    fm = FeatureMap("bench_mltag", ".")
    fm.feature_specs = {
        "user_id": {"source": "", "type": "categorical", "vocab_size": 61000, "index": 0},
        "item_id": {"source": "", "type": "categorical", "vocab_size": 17000, "index": 1},
        "tag_id": {"source": "", "type": "categorical", "vocab_size": 12000, "index": 2},
    }
    fm.num_fields = 3
    fm.num_features = 90000
    fm.input_length = 3

    params = {
        "model": "RAT_m2", "model_id": "bench", "model_root": "/tmp/bench_exps/",
        "embedding_dim": 10, "dnn_hidden_units": [400, 400, 400],
        "dnn_activations": "relu", "num_heads": 2, "dim_head": 10,
        "depth": 4, "scale_dim": 4, "dropout": 0.0, "emb_dropout": 0.0,
        "net_dropout": 0.0, "batch_norm": False, "use_wide": True,
        "embedding_regularizer": 0.03, "net_regularizer": 0,
        "learning_rate": 1e-3, "optimizer": "adam", "seed": 2021,
        "metrics": ["AUC", "logloss"], "use_pallas": use_pallas,
    }

    B, K, F, N = 4096, 5, 3, 200_000
    rng = np.random.RandomState(0)
    trainer = Trainer(fm, params)
    trainer.init_state(np.zeros((B, 1 + K, F), np.int32),
                       np.zeros((B, 1 + K), np.float32))
    trainer._build_steps()

    tokens = np.stack([rng.randint(0, 61000, N), rng.randint(0, 17000, N),
                       rng.randint(0, 12000, N)], axis=1).astype(np.int32)
    labels = rng.randint(0, 2, N).astype(np.float32)
    data = {
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(labels),
        "pool_tokens": jnp.asarray(tokens),
        "pool_labels": jnp.asarray(labels),
        "nbr": jnp.asarray(rng.randint(0, N, (N, K)).astype(np.int32)),
    }
    step_rng = jax.random.PRNGKey(0)
    idx_batches = [jnp.asarray(rng.randint(0, N, B).astype(np.int32))
                   for _ in range(16)]

    # warmup / compile
    for i in range(3):
        trainer.state, loss = trainer._jit_train_step(
            trainer.state, data, idx_batches[i % 16], jnp.float32(B), step_rng)
    jax.block_until_ready(loss)

    n_steps = 100
    tic = time.perf_counter()
    for i in range(n_steps):
        trainer.state, loss = trainer._jit_train_step(
            trainer.state, data, idx_batches[i % 16], jnp.float32(B), step_rng)
    jax.block_until_ready(loss)
    secs = time.perf_counter() - tic

    examples_per_sec = n_steps * B / secs
    print(json.dumps({
        "metric": "rat_m2_mltag_train_throughput",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
