"""Data loader tests: fold-driver correctness, cache format, the -1
neighbor-index wrap, and batch padding."""

import os

import numpy as np
import pytest

from rat_tpu.data import load_hdf5, save_hdf5
from rat_tpu.data.loader import DataGenerator, _fold_self_retrieval


def _write_split(path, n=60, F=3, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randint(1, 6, (n, F))
    y = rng.randint(0, 2, n)
    arr = np.concatenate([X, y[:, None]], axis=1).astype(np.float64)
    save_hdf5(arr, path)
    return arr


RC = {"used_col_indices": [0, 1, 2], "exact_match_col_indices": None,
      "split_type": "3-fold", "label_wise": False, "pre_retrieval": True,
      "qry_batch_size": None, "db_chunk_size": None, "topK": 4}


def test_fold_retrieval_excludes_own_fold(tmp_path):
    arr = _write_split(str(tmp_path / "train.h5"))
    idx, vals, lens = _fold_self_retrieval(arr, dict(RC))
    n = len(arr)
    fold_size = int(np.ceil(n / 3))
    for i in range(n):
        fold = i // fold_size
        lo, hi = fold * fold_size, (fold + 1) * fold_size
        for j in idx[i][idx[i] >= 0]:
            assert not (lo <= j < hi), "neighbor retrieved from the query's own fold"
    assert idx.shape == (n, 4) and lens.shape == (n,)


def test_fold_retrieval_global_indices_score(tmp_path):
    """Returned global indices must point at rows equal enough to score > 0."""
    arr = _write_split(str(tmp_path / "t.h5"), seed=3)
    idx, vals, lens = _fold_self_retrieval(arr, dict(RC))
    X = arr[:, :3].astype(int)
    for i in range(len(arr)):
        for k, j in enumerate(idx[i]):
            if j >= 0:
                assert (X[i] == X[j]).any(), (i, j)


def test_generator_caches_retrieval(tmp_path):
    path = str(tmp_path / "train.h5")
    _write_split(path)
    gen = DataGenerator(path, batch_size=16, retrieval_configs=dict(RC),
                        retrieval_pool_fname="self", retrieval_augmented=True)
    cache = str(tmp_path / "retrieval_4_train.h5")
    assert os.path.exists(cache)
    cached_idx = load_hdf5(cache, "indices")
    np.testing.assert_array_equal(cached_idx, gen.retr_indices)
    # second construction loads the cache (results identical)
    gen2 = DataGenerator(path, batch_size=16, retrieval_configs=dict(RC),
                         retrieval_pool_fname="self", retrieval_augmented=True)
    np.testing.assert_array_equal(gen.retr_indices, gen2.retr_indices)


def test_negative_one_wraps_to_last_row(tmp_path):
    """Reference parity: padded index -1 gathers the pool's LAST row
    (data_generator.py:69)."""
    path = str(tmp_path / "train.h5")
    _write_split(path)
    gen = DataGenerator(path, batch_size=16, retrieval_configs=dict(RC),
                        retrieval_pool_fname="self", retrieval_augmented=True)
    gen.retr_indices[0, 0] = -1
    gathered = gen.neighbor_gather_indices()
    assert gathered[0, 0] == len(gen.pool_darray) - 1


def test_epoch_batches_pad_final(tmp_path):
    path = str(tmp_path / "train.h5")
    _write_split(path, n=50)
    gen = DataGenerator(path, batch_size=16)
    batches = list(gen.epoch_index_batches())
    assert len(batches) == 4
    assert all(len(b[0]) == 16 for b in batches)
    assert batches[-1][1] == 2  # 50 = 3*16 + 2
    assert gen.num_batches == 4


def test_counters(tmp_path):
    path = str(tmp_path / "train.h5")
    arr = _write_split(path, n=50)
    gen = DataGenerator(path, batch_size=16)
    assert gen.num_samples == 50
    assert gen.num_positives == arr[:, -1].sum()
    assert gen.num_negatives == 50 - arr[:, -1].sum()


def test_external_pool_retrieval(tmp_path):
    split = str(tmp_path / "valid.h5")
    pool = str(tmp_path / "pool.h5")
    _write_split(split, n=30, seed=1)
    pool_arr = _write_split(pool, n=80, seed=2)
    rc = dict(RC, split_type="sequential")
    gen = DataGenerator(split, batch_size=8, retrieval_configs=rc,
                        retrieval_pool_fname=pool, retrieval_augmented=True)
    assert gen.retr_indices.shape == (30, 4)
    assert len(gen.pool_darray) == len(pool_arr)
    valid = gen.retr_indices[gen.retr_indices >= 0]
    assert valid.max() < 80


def test_labelwise_retrieval_shapes(tmp_path):
    split = str(tmp_path / "train.h5")
    _write_split(split, n=40, seed=4)
    rc = dict(RC, label_wise=True)
    gen = DataGenerator(split, batch_size=8, retrieval_configs=rc,
                        retrieval_pool_fname="self", retrieval_augmented=True)
    assert gen.retr_indices.shape == (40, 8)   # 2K
    assert gen.retr_lens.shape == (40, 2)
