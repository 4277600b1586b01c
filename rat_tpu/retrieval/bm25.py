"""Batched BM25-style top-K neighbor retrieval over categorical ID rows.

TPU-native re-design of the reference v4 engine
(fuxictr/datasets/data_utils.py:772-1064). Semantics preserved:

- per-column IDF over the pool: ``log(N / count)`` (data_utils.py:885);
- query/db score = sum over fields of ``1[q_f == db_f] * IDF(q_f)``
  where IDF of values unseen in the db is 0 (data_utils.py:847-851,951);
- optional exact-match pre-filter on selected columns: queries only
  match pool rows equal on those columns; surviving candidates are
  scored as ``(bm25 + 1) * match`` over the remaining columns
  (data_utils.py:862-876,946);
- zero-score results are dropped: index -> -1, ``lens`` counts valid
  neighbors (data_utils.py:787-798).

The implementation differs from the reference by design: instead of a
Python loop that streams torch tensors chunk-by-chunk to one GPU, the
whole pool scan is a single jitted ``lax.scan`` over statically-shaped
db chunks with per-chunk ``lax.top_k`` and an on-device merge, so XLA
pipelines the compare/reduce onto the VPU and keeps the merge on-chip.
Ties are broken by lower pool index on both sides.
"""

import logging
from collections import namedtuple
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

RetrievalResults = namedtuple("RetrievalResults", ["values", "indices", "lens"])


def _compute_idf_tables(db_np_data):
    """Per-column (sorted_keys, idf_values) over the pool — sorted ONCE
    so every query batch is a plain searchsorted."""
    N = len(db_np_data)
    idf_tables = []
    for col in range(db_np_data.shape[1]):
        keys, counts = np.unique(db_np_data[:, col], return_counts=True)
        idf = np.log(N / counts).astype(np.float32)
        idf_tables.append((keys.astype(np.int64), idf))
    return idf_tables


def _map_to_idf(np_data, idf_tables):
    """IDF value per query cell; 0 for values unseen in the pool."""
    idf_data = np.zeros_like(np_data, dtype=np.float32)
    for col, (keys, vals) in enumerate(idf_tables):
        if len(keys) == 0:
            continue
        pos = np.searchsorted(keys, np_data[:, col])
        pos_clip = np.clip(pos, 0, len(keys) - 1)
        hit = keys[pos_clip] == np_data[:, col]
        idf_data[:, col] = np.where(hit, vals[pos_clip], 0.0)
    return idf_data


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("topk", "chunk_size"))
def _scan_topk(db_padded, qry, qry_idf, db_valid_len, topk, chunk_size):
    """Score all pool chunks against a query batch and merge top-K.

    db_padded: [n_chunks*chunk_size, F] int32 (padded rows score 0)
    qry:       [B, F] int32,  qry_idf: [B, F] float32
    Returns (values [B, K] f32, indices [B, K] i32 into the padded pool).
    """
    n_chunks = db_padded.shape[0] // chunk_size
    db_chunks = db_padded.reshape(n_chunks, chunk_size, db_padded.shape[1])
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    local_ids = jnp.arange(chunk_size, dtype=jnp.int32)

    def body(carry, inputs):
        db_chunk, chunk_start = inputs
        # [B,1,F] == [1,C,F] -> [B,C,F] weighted by query IDF -> [B,C]
        scores = jnp.sum(
            (qry[:, None, :] == db_chunk[None, :, :]) * qry_idf[:, None, :],
            axis=-1)
        row_ids = chunk_start + local_ids
        scores = jnp.where(row_ids[None, :] < db_valid_len, scores, 0.0)
        v, i = jax.lax.top_k(scores, topk)
        return carry, (v, i.astype(jnp.int32) + chunk_start)

    _, (vals, idxs) = jax.lax.scan(body, None, (db_chunks, chunk_starts))
    # [n_chunks, B, K] -> [B, n_chunks*K], chunk-major so ties keep the
    # earliest-chunk (lowest-index) winner, like the reference merge
    # (data_utils.py:1019-1025).
    B = qry.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, -1)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(B, -1)
    v, sel = jax.lax.top_k(vals, topk)
    i = jnp.take_along_axis(idxs, sel, axis=-1)
    return v, i


@partial(jax.jit, static_argnames=("topk",))
def _masked_topk(scores, cand_mask, topk):
    """Top-K over candidate-masked scores: (bm25 + 1) * mask."""
    scores = (scores + 1.0) * cand_mask
    v, i = jax.lax.top_k(scores, topk)
    return v, i


@jax.jit
def _pairwise_scores(qry, qry_idf, db):
    return jnp.sum((qry[:, None, :] == db[None, :, :]) * qry_idf[:, None, :], axis=-1)


def _finalize(values, indices):
    """Drop zero-score hits (index -> -1) and count valid neighbors
    (reference sort_results, data_utils.py:787-798). Inputs already
    sorted descending by score."""
    values = np.asarray(values, dtype=np.float64)
    indices = np.asarray(indices, dtype=np.int64)
    drop = values == 0
    indices[drop] = -1
    lens = drop.shape[-1] - drop.sum(-1)
    return values, indices, lens


def bm25_topk_retrieval(db_np_data, qry_np_data,
                        exact_match_col_indices=None,
                        qry_batch_size=None,
                        db_chunk_size=None,
                        topK=10,
                        **kwargs):
    """Retrieve the topK most similar pool rows for each query row.

    Returns RetrievalResults(values [Q,K] f64, indices [Q,K] i64 with -1
    padding, lens [Q] i64).
    """
    db_np_data = np.ascontiguousarray(db_np_data, dtype=np.int64)
    qry_np_data = np.ascontiguousarray(qry_np_data, dtype=np.int64)
    Q = len(qry_np_data)
    topK_values = np.zeros((Q, topK), dtype=np.float64)
    topK_indices = np.full((Q, topK), -1, dtype=np.int64)
    topK_lens = np.zeros(Q, dtype=np.int64)

    if exact_match_col_indices:
        _exact_match_retrieval(db_np_data, qry_np_data, exact_match_col_indices,
                               qry_batch_size, topK,
                               topK_values, topK_indices, topK_lens)
        return RetrievalResults(topK_values, topK_indices, topK_lens)

    N = len(db_np_data)
    idf_tables = _compute_idf_tables(db_np_data)
    qry_batch_size = Q if qry_batch_size is None else qry_batch_size
    chunk_size = N if db_chunk_size is None else min(db_chunk_size, max(N, 1))
    # chunks must hold at least topK rows for the per-chunk top_k; when
    # K >= pool size the padded zero-score rows take the surplus slots
    # and are dropped to -1, matching the reference's padded_topk
    # (data_utils.py:800-819)
    chunk_size = max(chunk_size, topK, 1)

    db_padded = np.zeros((_round_up(max(N, chunk_size), chunk_size),
                          db_np_data.shape[1]), dtype=np.int32)
    db_padded[:N] = db_np_data
    db_dev = jnp.asarray(db_padded)
    db_valid_len = jnp.int32(N)

    for qry_idx in range(0, Q, qry_batch_size):
        qry_batch = qry_np_data[qry_idx: qry_idx + qry_batch_size]
        qry_idf = _map_to_idf(qry_batch, idf_tables)
        b = len(qry_batch)
        # pad the final partial batch so every call hits the same XLA program
        if b < qry_batch_size:
            pad = qry_batch_size - b
            qry_batch = np.concatenate([qry_batch, np.zeros((pad, qry_batch.shape[1]),
                                                            dtype=qry_batch.dtype)])
            qry_idf = np.concatenate([qry_idf, np.zeros((pad, qry_idf.shape[1]),
                                                        dtype=qry_idf.dtype)])
        v, i = _scan_topk(db_dev, jnp.asarray(qry_batch, dtype=jnp.int32),
                          jnp.asarray(qry_idf), db_valid_len,
                          topk=topK, chunk_size=chunk_size)
        v, i, lens = _finalize(jax.device_get(v)[:b], jax.device_get(i)[:b])
        topK_values[qry_idx: qry_idx + b] = v
        topK_indices[qry_idx: qry_idx + b] = i
        topK_lens[qry_idx: qry_idx + b] = lens
    return RetrievalResults(topK_values, topK_indices, topK_lens)


def _exact_match_retrieval(db_np_data, qry_np_data, exact_match_col_indices,
                           qry_batch_size, topK,
                           topK_values, topK_indices, topK_lens):
    """Exact-match pre-filter path (data_utils.py:862-876,897-1044).

    Pool rows are grouped by the exact-match columns on the host; each
    query batch scores only the union of its groups' rows on device.
    """
    Q = len(qry_np_data)
    exm_mask = np.zeros(db_np_data.shape[1], dtype=bool)
    exm_mask[exact_match_col_indices] = True
    rest_mask = ~exm_mask

    db_groups = {}
    for i, row in enumerate(db_np_data[:, exm_mask]):
        db_groups.setdefault(tuple(row), []).append(i)

    db_rest = db_np_data[:, rest_mask]
    qry_rest = qry_np_data[:, rest_mask]
    qry_keys = [tuple(row) for row in qry_np_data[:, exm_mask]]

    has_rest = db_rest.shape[1] > 0
    idf_tables = _compute_idf_tables(db_rest) if has_rest else None
    qry_batch_size = Q if qry_batch_size is None else qry_batch_size

    for qry_idx in range(0, Q, qry_batch_size):
        batch_keys = qry_keys[qry_idx: qry_idx + qry_batch_size]
        cand_lists = [np.asarray(db_groups[k], dtype=np.int64)
                      if k in db_groups else None for k in batch_keys]
        matched = [(bi, c) for bi, c in enumerate(cand_lists) if c is not None]
        if not matched:
            continue
        # the reference branches at BATCH level on the largest matched
        # group (exm_max_size_batch, data_utils.py:906,911): a batch
        # whose biggest group fits in topK takes the flat path for ALL
        # its queries; otherwise every matched query is BM25-scored
        exm_max_size = max(len(c) for _, c in matched)
        if not has_rest or exm_max_size <= topK:
            for bi, cands in matched:
                gi = qry_idx + bi
                take = cands[:topK]  # truncation only bites when no rest cols
                topK_indices[gi, :len(take)] = take
                topK_values[gi, :len(take)] = 1.0
                topK_lens[gi] = len(take)
        else:
            for bi, cands in matched:
                gi = qry_idx + bi
                qrow = qry_rest[gi:gi + 1]
                qidf = _map_to_idf(qrow, idf_tables)
                scores = np.asarray(_pairwise_scores(
                    jnp.asarray(qrow, dtype=jnp.int32), jnp.asarray(qidf),
                    jnp.asarray(db_rest[cands], dtype=jnp.int32)))[0]
                scores = scores + 1.0  # every candidate is an exact match
                order = np.argsort(-scores, kind="stable")[:topK]
                take = cands[order]
                topK_indices[gi, :len(take)] = take
                topK_values[gi, :len(take)] = scores[order]
                topK_lens[gi] = len(take)
    logging.debug("exact-match retrieval done for %d queries", Q)
