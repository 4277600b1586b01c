"""BM25 retrieval engine tests.

Includes the reference's exact-match invariant property test
(data_utils.py:1287-1325) and a brute-force IDF-score oracle."""

import numpy as np
import pandas as pd
import pytest

from rat_tpu.retrieval import bm25_topk_retrieval


def _oracle_scores(db, q_row):
    """Brute-force v4 score: sum of 1[q==db] * log(N/count)."""
    N = len(db)
    scores = np.zeros(N)
    for c in range(db.shape[1]):
        counts = pd.Series(db[:, c]).value_counts()
        idf = dict(zip(counts.index, np.log(N / counts.to_numpy())))
        w = idf.get(q_row[c], 0.0)
        scores += (db[:, c] == q_row[c]) * w
    return scores


def test_exact_match_invariant(rng):
    db = rng.randint(0, 4, (200, 4))
    q = rng.randint(0, 4, (24, 4))
    exm = [0, 3]
    res = bm25_topk_retrieval(db, q, exact_match_col_indices=exm,
                              qry_batch_size=16, db_chunk_size=64, topK=8)
    for i in range(len(q)):
        idx = res.indices[i][res.indices[i] >= 0]
        assert len(idx) == res.lens[i]
        if len(idx):
            assert (db[idx][:, exm] == q[i][exm]).all()


def test_scores_match_oracle(rng):
    db = rng.randint(0, 7, (300, 4))
    q = rng.randint(0, 7, (20, 4))
    res = bm25_topk_retrieval(db, q, qry_batch_size=8, db_chunk_size=50, topK=6)
    for i in range(len(q)):
        oracle = np.sort(_oracle_scores(db, q[i]))[::-1][:6]
        np.testing.assert_allclose(np.sort(res.values[i])[::-1], oracle,
                                   rtol=1e-5)


def test_returned_indices_score_correctly(rng):
    db = rng.randint(0, 7, (200, 4))
    q = rng.randint(0, 7, (10, 4))
    res = bm25_topk_retrieval(db, q, db_chunk_size=33, topK=5)
    for i in range(len(q)):
        oracle = _oracle_scores(db, q[i])
        for j in range(5):
            if res.indices[i, j] >= 0:
                np.testing.assert_allclose(res.values[i, j],
                                           oracle[res.indices[i, j]], rtol=1e-5)


def test_zero_scores_dropped():
    db = np.array([[1, 1], [2, 2], [3, 3]])
    q = np.array([[9, 9]])  # matches nothing
    res = bm25_topk_retrieval(db, q, topK=2)
    assert (res.indices[0] == -1).all()
    assert res.lens[0] == 0
    assert (res.values[0] == 0).all()


def test_topk_larger_than_pool():
    # values that appear in EVERY pool row have IDF log(N/N)=0 and score
    # nothing, so use per-row-unique values to keep both rows retrievable
    db = np.array([[1, 9], [8, 5]])
    q = np.array([[1, 5]])  # matches row0 on col0, row1 on col1
    res = bm25_topk_retrieval(db, q, topK=5)
    assert res.lens[0] == 2
    assert set(res.indices[0][res.indices[0] >= 0]) == {0, 1}


def test_batching_invariance(rng):
    """qry_batch_size / db_chunk_size must not change results."""
    db = rng.randint(0, 6, (150, 3))
    q = rng.randint(0, 6, (40, 3))
    r1 = bm25_topk_retrieval(db, q, topK=4)
    r2 = bm25_topk_retrieval(db, q, qry_batch_size=7, db_chunk_size=11, topK=4)
    np.testing.assert_allclose(r1.values, r2.values, rtol=1e-5)
    np.testing.assert_array_equal(r1.lens, r2.lens)


def test_exact_match_scores_match_oracle(rng):
    """Scored exact-match path: value = 1 + bm25 over the REST columns
    (IDF over the full pool's rest columns), candidates only
    (data_utils.py:946)."""
    db = rng.randint(0, 3, (400, 5))
    q = rng.randint(0, 3, (30, 5))
    exm = [1, 3]
    rest = [0, 2, 4]
    res = bm25_topk_retrieval(db, q, exact_match_col_indices=exm,
                              qry_batch_size=8, topK=6)
    for i in range(len(q)):
        cands = np.nonzero((db[:, exm] == q[i][exm]).all(-1))[0]
        if len(cands) == 0:
            assert res.lens[i] == 0
            continue
        oracle = _oracle_scores(db[:, rest], q[i][rest])[cands] + 1.0
        want = np.sort(oracle)[::-1][:6]
        got = np.sort(res.values[i][res.indices[i] >= 0])[::-1]
        np.testing.assert_allclose(got, want[:len(got)], rtol=1e-5)
        # every returned index is a true candidate
        idx = res.indices[i][res.indices[i] >= 0]
        assert set(idx) <= set(cands)


def test_exact_match_scale_100k(rng):
    """VERDICT r1 item 7: the device-batched exact-match path must clear
    100k queries in seconds, not minutes, and keep the reference's
    invariant (data_utils.py:1287-1325)."""
    import time
    Q = 100_000
    db = rng.randint(0, 50, (200_000, 5)).astype(np.int64)
    # a low-cardinality exact column creates LARGE groups -> the scored
    # (non-flat) branch is exercised at scale
    db[:, 0] = rng.randint(0, 8, 200_000)
    q = rng.randint(0, 50, (Q, 5)).astype(np.int64)
    q[:, 0] = rng.randint(0, 8, Q)
    t0 = time.time()
    res = bm25_topk_retrieval(db, q, exact_match_col_indices=[0],
                              qry_batch_size=4096, topK=5)
    dt = time.time() - t0
    assert dt < 120, f"exact-match at 100k queries took {dt:.0f}s"
    check = rng.choice(Q, 200, replace=False)
    for i in check:
        idx = res.indices[i][res.indices[i] >= 0]
        assert len(idx) == res.lens[i]
        if len(idx):
            assert (db[idx][:, 0] == q[i][0]).all()


def test_negative_values_fall_back_from_dense_idf(rng):
    """Negative IDs must not corrupt the dense IDF pack
    (_pack_idf_dense returns None for negative pool keys) and negative
    query values score 0."""
    db = rng.randint(-5, 5, (120, 3))
    q = rng.randint(-5, 5, (25, 3))
    res = bm25_topk_retrieval(db, q, topK=4)
    for i in range(len(q)):
        oracle = np.sort(_oracle_scores(db, q[i]))[::-1][:4]
        np.testing.assert_allclose(np.sort(res.values[i])[::-1], oracle,
                                   rtol=1e-5)


def test_exact_match_only_no_rest_columns(rng):
    db = rng.randint(0, 3, (50, 2))
    q = rng.randint(0, 3, (10, 2))
    res = bm25_topk_retrieval(db, q, exact_match_col_indices=[0, 1], topK=4)
    for i in range(len(q)):
        expect = np.nonzero((db == q[i]).all(-1))[0]
        got = res.indices[i][res.indices[i] >= 0]
        assert res.lens[i] == min(len(expect), 4)
        assert set(got) <= set(expect)


def test_exact_match_empty_pool(rng):
    """A label-wise sub-pool can be empty; exact-match retrieval must
    return no neighbors rather than crash."""
    q = rng.randint(0, 4, (4, 3))
    res = bm25_topk_retrieval(np.zeros((0, 3), dtype=np.int64), q,
                              exact_match_col_indices=[0], topK=3)
    assert (res.lens == 0).all()
    assert (res.indices == -1).all()


def test_value_counts_matches_unique():
    """The bincount fast path must be np.unique(return_counts=True)
    exactly, and negative/huge values must take the sort fallback."""
    from rat_tpu.retrieval.bm25 import _value_counts

    rng = np.random.RandomState(3)
    for col in (rng.randint(0, 50, 5000),            # bincount path
                rng.randint(-5, 50, 5000),           # negative -> fallback
                np.array([2 ** 26, 0, 2 ** 26]),     # huge -> fallback
                np.array([], dtype=np.int64)):       # empty
        k1, c1 = _value_counts(col)
        k2, c2 = np.unique(col, return_counts=True)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(c1, c2)


def test_dispatch_work_cap_preserves_results():
    """max_scores_per_dispatch only re-chunks the mega-dispatches (a
    remote-runtime watchdog guard); results must be identical."""
    from rat_tpu.retrieval import bm25_topk_retrieval

    rng = np.random.RandomState(9)
    db = rng.randint(0, 8, (600, 4))
    q = rng.randint(0, 8, (256, 4))
    base = bm25_topk_retrieval(db, q, qry_batch_size=32, db_chunk_size=128,
                               topK=5)
    capped = bm25_topk_retrieval(db, q, qry_batch_size=32, db_chunk_size=128,
                                 topK=5,
                                 max_scores_per_dispatch=32 * 600 + 1)
    np.testing.assert_array_equal(base.values, capped.values)
    np.testing.assert_array_equal(base.indices, capped.indices)
    np.testing.assert_array_equal(base.lens, capped.lens)
