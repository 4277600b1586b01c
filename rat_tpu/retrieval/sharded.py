"""Mesh-sharded BM25 pool scan.

The true "long context" of this workload is the retrieval pool size
(up to ~20M rows for Tmall, SURVEY.md §5/§6). This scan shards the POOL
rows across the mesh's ``data`` axis: every chip scores its shard
against the (replicated) query batch with the same chunked
score+top-k as the single-chip engine, then the per-shard top-K
winners are all-gathered over ICI and merged on every chip — a
K-sized collective instead of an N-sized one.

Built with ``shard_map`` so the collective structure is explicit;
numerics are identical to the single-device engine (tested on the
8-virtual-device CPU mesh).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .bm25 import (RetrievalResults, _compute_idf_tables, _finalize,
                   _map_to_idf, _round_up)


def _local_scan_topk(db_local, qry, qry_idf, first_row, n_db, topk, chunk_size):
    """Chunked score+top-k over this shard's rows; returns GLOBAL indices."""
    n_chunks = db_local.shape[0] // chunk_size
    db_chunks = db_local.reshape(n_chunks, chunk_size, db_local.shape[1])
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    local_ids = jnp.arange(chunk_size, dtype=jnp.int32)

    def body(carry, inputs):
        db_chunk, chunk_start = inputs
        scores = jnp.sum(
            (qry[:, None, :] == db_chunk[None, :, :]) * qry_idf[:, None, :],
            axis=-1)
        row_ids = first_row + chunk_start + local_ids
        scores = jnp.where(row_ids[None, :] < n_db, scores, 0.0)
        v, i = jax.lax.top_k(scores, topk)
        return carry, (v, i.astype(jnp.int32) + chunk_start + first_row)

    _, (vals, idxs) = jax.lax.scan(body, None, (db_chunks, chunk_starts))
    B = qry.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, -1)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(B, -1)
    v, sel = jax.lax.top_k(vals, topk)
    return v, jnp.take_along_axis(idxs, sel, axis=-1)


@partial(jax.jit, static_argnames=("topk", "chunk_size", "mesh", "axis"))
def _sharded_scan(db_padded, qry, qry_idf, n_db, topk, chunk_size, mesh,
                  axis="data"):
    n_shards = mesh.shape[axis]
    shard_rows = db_padded.shape[0] // n_shards

    def shard_fn(db_local, qry, qry_idf):
        first_row = jax.lax.axis_index(axis).astype(jnp.int32) * shard_rows
        v, i = _local_scan_topk(db_local, qry, qry_idf, first_row, n_db,
                                topk, chunk_size)
        # ICI collective: gather every shard's K winners, merge locally
        vs = jax.lax.all_gather(v, axis)            # [n_shards, B, K]
        is_ = jax.lax.all_gather(i, axis)
        B = qry.shape[0]
        vs = jnp.moveaxis(vs, 0, 1).reshape(B, -1)
        is_ = jnp.moveaxis(is_, 0, 1).reshape(B, -1)
        mv, sel = jax.lax.top_k(vs, topk)
        mi = jnp.take_along_axis(is_, sel, axis=-1)
        return mv, mi

    spec_db = P(axis, None)
    spec_rep = P(None, None)
    # outputs are replicated by construction (every shard merges the
    # same all-gathered winners) but the replication checker cannot
    # infer that through top_k -> disable the static check
    try:
        smap = shard_map(shard_fn, mesh=mesh,
                         in_specs=(spec_db, spec_rep, spec_rep),
                         out_specs=(spec_rep, spec_rep), check_vma=False)
    except TypeError:
        smap = shard_map(shard_fn, mesh=mesh,
                         in_specs=(spec_db, spec_rep, spec_rep),
                         out_specs=(spec_rep, spec_rep), check_rep=False)
    return smap(db_padded, qry, qry_idf)


def sharded_bm25_topk_retrieval(db_np_data, qry_np_data, mesh,
                                qry_batch_size=None, db_chunk_size=None,
                                topK=10, axis="data", **kwargs):
    """Drop-in variant of bm25_topk_retrieval with the pool scan sharded
    over ``mesh`` axis ``axis``. Exact-match prefilter is not supported
    on this path (none of the RAT configs use it)."""
    assert not kwargs.get("exact_match_col_indices"), \
        "sharded scan does not implement the exact-match prefilter"
    db_np_data = np.ascontiguousarray(db_np_data, dtype=np.int64)
    qry_np_data = np.ascontiguousarray(qry_np_data, dtype=np.int64)
    Q, N = len(qry_np_data), len(db_np_data)
    n_shards = mesh.shape[axis]
    idf_tables = _compute_idf_tables(db_np_data)
    qry_batch_size = Q if qry_batch_size is None else qry_batch_size
    chunk_size = N if db_chunk_size is None else min(db_chunk_size, max(N, 1))
    chunk_size = max(chunk_size, topK, 1)
    rows = _round_up(max(N, chunk_size * n_shards), chunk_size * n_shards)
    db_padded = np.zeros((rows, db_np_data.shape[1]), dtype=np.int32)
    db_padded[:N] = db_np_data
    db_dev = jax.device_put(
        jnp.asarray(db_padded), NamedSharding(mesh, P(axis, None)))

    topK_values = np.zeros((Q, topK), dtype=np.float64)
    topK_indices = np.full((Q, topK), -1, dtype=np.int64)
    topK_lens = np.zeros(Q, dtype=np.int64)
    for qry_idx in range(0, Q, qry_batch_size):
        qry_batch = qry_np_data[qry_idx: qry_idx + qry_batch_size]
        qry_idf = _map_to_idf(qry_batch, idf_tables)
        b = len(qry_batch)
        if b < qry_batch_size:
            pad = qry_batch_size - b
            qry_batch = np.concatenate(
                [qry_batch, np.zeros((pad, qry_batch.shape[1]), qry_batch.dtype)])
            qry_idf = np.concatenate(
                [qry_idf, np.zeros((pad, qry_idf.shape[1]), qry_idf.dtype)])
        v, i = _sharded_scan(db_dev, jnp.asarray(qry_batch, jnp.int32),
                             jnp.asarray(qry_idf), jnp.int32(N),
                             topk=topK, chunk_size=chunk_size, mesh=mesh,
                             axis=axis)
        v, i, lens = _finalize(jax.device_get(v)[:b], jax.device_get(i)[:b])
        topK_values[qry_idx: qry_idx + b] = v
        topK_indices[qry_idx: qry_idx + b] = i
        topK_lens[qry_idx: qry_idx + b] = lens
    return RetrievalResults(topK_values, topK_indices, topK_lens)
