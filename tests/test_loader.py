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


def test_mid_scan_resume_produces_identical_cache(tmp_path, monkeypatch):
    """VERDICT r3 item 3: a retrieval precompute killed mid-scan must
    resume from its last completed slice and end with a cache
    byte-identical to an uninterrupted run — not restart from zero
    (two 3-hour Tmall scans died exactly this way in r3)."""
    import rat_tpu.data.loader as L

    n = 120
    rc = dict(RC, split_type="2-fold", resume_slice_rows=20)

    # ground truth: uninterrupted run in its own directory
    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    arr = _write_split(os.path.join(clean, "train.h5"), n=n, seed=9)
    DataGenerator(os.path.join(clean, "train.h5"), batch_size=16,
                  retrieval_configs=dict(rc), retrieval_pool_fname="self",
                  retrieval_augmented=True)

    # crashing run: the engine dies on its 3rd slice call
    crash = str(tmp_path / "crash")
    os.makedirs(crash)
    _write_split(os.path.join(crash, "train.h5"), n=n, seed=9)
    real_engine = L.bm25_topk_retrieval
    calls = {"n": 0}

    def dying_engine(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated remote-worker crash")
        return real_engine(*a, **k)

    monkeypatch.setattr(L, "bm25_topk_retrieval", dying_engine)
    with pytest.raises(RuntimeError, match="simulated"):
        DataGenerator(os.path.join(crash, "train.h5"), batch_size=16,
                      retrieval_configs=dict(rc),
                      retrieval_pool_fname="self", retrieval_augmented=True)
    partials = [p for p in os.listdir(crash) if p.endswith(".partial.h5")]
    assert partials, "crash must leave a resumable partial"
    import h5py
    with h5py.File(os.path.join(crash, partials[0])) as hf:
        assert int(hf["done_rows"][()]) > 0

    # resume: only the remaining slices are scanned
    monkeypatch.setattr(L, "bm25_topk_retrieval", real_engine)
    calls_before_resume = calls["n"]
    spy = {"n": 0, "rows": 0}

    def counting_engine(*a, **k):
        spy["n"] += 1
        spy["rows"] += len(k.get("qry_np_data", a[1] if len(a) > 1 else []))
        return real_engine(*a, **k)

    monkeypatch.setattr(L, "bm25_topk_retrieval", counting_engine)
    gen = DataGenerator(os.path.join(crash, "train.h5"), batch_size=16,
                        retrieval_configs=dict(rc),
                        retrieval_pool_fname="self",
                        retrieval_augmented=True)
    # 2 folds x 60 queries / 20-row slices = 6 total slice calls; 2
    # completed before the crash -> at most 4 remain
    assert spy["n"] <= 6 - 2, (spy, calls_before_resume)
    assert spy["rows"] < 2 * 60, spy

    # the resumed cache is identical to the uninterrupted one, and the
    # partials are gone after the final cache write
    for key in ("indices", "values", "lens"):
        np.testing.assert_array_equal(
            load_hdf5(os.path.join(clean, "retrieval_4_train.h5"), key),
            load_hdf5(os.path.join(crash, "retrieval_4_train.h5"), key),
            err_msg=key)
    assert not [p for p in os.listdir(crash) if p.endswith(".partial.h5")]


def test_mid_scan_resume_survives_slice_size_change(tmp_path, monkeypatch):
    """done_rows is a row cursor, not a slice index: a partial written
    under one resume_slice_rows must resume under another (r4: an env
    override of the slice size silently threw away a 16M-query scan
    because the old fingerprint included it)."""
    import h5py

    import rat_tpu.data.loader as L

    n = 120
    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    _write_split(os.path.join(clean, "train.h5"), n=n, seed=9)
    DataGenerator(os.path.join(clean, "train.h5"), batch_size=16,
                  retrieval_configs=dict(RC, split_type="2-fold",
                                         resume_slice_rows=20),
                  retrieval_pool_fname="self", retrieval_augmented=True)

    crash = str(tmp_path / "crash")
    os.makedirs(crash)
    _write_split(os.path.join(crash, "train.h5"), n=n, seed=9)
    real_engine = L.bm25_topk_retrieval
    calls = {"n": 0}

    def dying_engine(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated remote-worker crash")
        return real_engine(*a, **k)

    monkeypatch.setattr(L, "bm25_topk_retrieval", dying_engine)
    with pytest.raises(RuntimeError, match="simulated"):
        DataGenerator(os.path.join(crash, "train.h5"), batch_size=16,
                      retrieval_configs=dict(RC, split_type="2-fold",
                                             resume_slice_rows=20),
                      retrieval_pool_fname="self", retrieval_augmented=True)
    partial = [p for p in os.listdir(crash) if p.endswith(".partial.h5")][0]
    with h5py.File(os.path.join(crash, partial)) as hf:
        done_before = int(hf["done_rows"][()])
    assert done_before > 0

    # resume with a DIFFERENT slice size: cursor must be honored
    monkeypatch.setattr(L, "bm25_topk_retrieval", real_engine)
    resumed = {"rows": 0}

    def counting_engine(*a, **k):
        q = k.get("qry_np_data", a[1] if len(a) > 1 else [])
        resumed["rows"] += len(q)
        return real_engine(*a, **k)

    monkeypatch.setattr(L, "bm25_topk_retrieval", counting_engine)
    DataGenerator(os.path.join(crash, "train.h5"), batch_size=16,
                  retrieval_configs=dict(RC, split_type="2-fold",
                                         resume_slice_rows=10),
                  retrieval_pool_fname="self", retrieval_augmented=True)
    # the fold that crashed rescans only past its cursor; the other
    # fold rescans fully — strictly fewer rows than a from-zero rerun
    assert resumed["rows"] < 2 * 60, resumed
    for key in ("indices", "values", "lens"):
        np.testing.assert_array_equal(
            load_hdf5(os.path.join(clean, "retrieval_4_train.h5"), key),
            load_hdf5(os.path.join(crash, "retrieval_4_train.h5"), key),
            err_msg=key)
