"""Mesh-sharded BM25 pool scan.

The true "long context" of this workload is the retrieval pool size
(up to ~20M rows for Tmall, SURVEY.md §5/§6). This scan shards the POOL
rows across the mesh's ``data`` axis: every chip scores its shard
against the (replicated) query batch with the same chunked
score+top-k as the single-chip engine, then the per-shard top-K
winners are all-gathered over ICI and merged on every chip — a
K-sized collective instead of an N-sized one.

Like the single-device driver (bm25.py), the whole retrieval runs as
one jitted program per mega-batch: the scan over query batches, the
device-side IDF lookup, and the zero-score finalize all happen on
device, so there is a single host↔device round-trip per mega-batch
regardless of the query count.

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

from .bm25 import (RetrievalResults, _compute_idf_tables, _idf_lookup,
                   _idf_lookup_dense, _pack_idf_dense, _pack_idf_tables,
                   _round_up)


def _local_scan_topk(db_local, qry, qry_idf, first_row, n_db, topk,
                     chunk_size, neg_pad=False, rest_cols=None,
                     exm_cols=None):
    """Chunked score+top-k over this shard's rows; returns GLOBAL indices.

    With ``exm_cols`` set, the score is the single-device engine's
    exact-match semantics: BM25 over ``rest_cols`` only, then
    ``(score + 1) * 1[all exact-match columns equal]`` — a dense mask
    instead of the host-side candidate windows, which parallelizes
    trivially across pool shards. ``qry_idf`` is then [B, len(rest)].
    """
    n_chunks = db_local.shape[0] // chunk_size
    db_chunks = db_local.reshape(n_chunks, chunk_size, db_local.shape[1])
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    local_ids = jnp.arange(chunk_size, dtype=jnp.int32)
    pad_score = -jnp.inf if neg_pad else 0.0

    def body(carry, inputs):
        db_chunk, chunk_start = inputs
        if exm_cols is None:
            scores = jnp.sum(
                (qry[:, None, :] == db_chunk[None, :, :])
                * qry_idf[:, None, :], axis=-1)
        else:
            rest = list(rest_cols)
            scores = jnp.sum(
                (qry[:, None, rest] == db_chunk[None, :, rest])
                * qry_idf[:, None, :], axis=-1)
            cand = jnp.all(qry[:, None, list(exm_cols)]
                           == db_chunk[None, :, list(exm_cols)], axis=-1)
            scores = (scores + 1.0) * cand
        row_ids = first_row + chunk_start + local_ids
        scores = jnp.where(row_ids[None, :] < n_db, scores, pad_score)
        v, i = jax.lax.top_k(scores, topk)
        return carry, (v, i.astype(jnp.int32) + chunk_start + first_row)

    _, (vals, idxs) = jax.lax.scan(body, None, (db_chunks, chunk_starts))
    B = qry.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, -1)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(B, -1)
    v, sel = jax.lax.top_k(vals, topk)
    return v, jnp.take_along_axis(idxs, sel, axis=-1)


@partial(jax.jit, static_argnames=("topk", "chunk_size", "mesh", "axis",
                                   "dense_idf", "neg_pad", "rest_cols",
                                   "exm_cols"))
def _sharded_scan_batched(db_padded, qry_batches, idf_pack, n_db, topk,
                          chunk_size, mesh, axis="data", dense_idf=True,
                          neg_pad=False, rest_cols=None, exm_cols=None):
    """One device program: scan over query batches, each batch scoring
    every pool shard in parallel and merging the all-gathered winners.

    qry_batches: [nb, B, F] int32 (replicated).
    Returns (values [nb, B, K] f32, indices [nb, B, K] i32 with -1 for
    dropped zero-score hits, lens [nb, B] i32) — replicated.
    """
    n_shards = mesh.shape[axis]
    shard_rows = db_padded.shape[0] // n_shards

    def shard_fn(db_local, qry_batches, n_db, *idf_pack):
        first_row = jax.lax.axis_index(axis).astype(jnp.int32) * shard_rows

        def body(carry, qry):
            qry_rest = qry if exm_cols is None else qry[:, list(rest_cols)]
            if dense_idf:
                qry_idf = _idf_lookup_dense(qry_rest, *idf_pack)
            else:
                qry_idf = _idf_lookup(qry_rest, *idf_pack)
            v, i = _local_scan_topk(db_local, qry, qry_idf, first_row,
                                    n_db[0], topk, chunk_size,
                                    neg_pad=neg_pad, rest_cols=rest_cols,
                                    exm_cols=exm_cols)
            # ICI collective: gather every shard's K winners, merge
            # locally; shard-major concat keeps the lowest-index winner
            # on score ties
            vs = jax.lax.all_gather(v, axis)        # [n_shards, B, K]
            is_ = jax.lax.all_gather(i, axis)
            B = qry.shape[0]
            vs = jnp.moveaxis(vs, 0, 1).reshape(B, -1)
            is_ = jnp.moveaxis(is_, 0, 1).reshape(B, -1)
            mv, sel = jax.lax.top_k(vs, topk)
            mi = jnp.take_along_axis(is_, sel, axis=-1)
            if neg_pad:
                pad_hit = jnp.isneginf(mv)
                mv = jnp.where(pad_hit, 0.0, mv)
                drop = (mv == 0) | pad_hit
            else:
                drop = mv == 0
            mi = jnp.where(drop, -1, mi)
            lens = jnp.sum(~drop, axis=-1).astype(jnp.int32)
            return carry, (mv, mi, lens)

        _, out = jax.lax.scan(body, None, qry_batches)
        return out

    rep = P(*((None,) * 2))
    idf_specs = tuple(P(*((None,) * a.ndim)) for a in idf_pack)
    kwargs = dict(mesh=mesh,
                  in_specs=(P(axis, None), P(None, None, None), P(None))
                  + idf_specs,
                  out_specs=(P(None, None, None),) * 2 + (rep,))
    # outputs are replicated by construction (every shard merges the
    # same all-gathered winners) but the replication checker cannot
    # infer that through top_k -> disable the static check
    try:
        smap = shard_map(shard_fn, check_vma=False, **kwargs)
    except TypeError:
        smap = shard_map(shard_fn, check_rep=False, **kwargs)
    return smap(db_padded, qry_batches, n_db.reshape(1), *idf_pack)


def sharded_bm25_topk_retrieval(db_np_data, qry_np_data, mesh,
                                qry_batch_size=None, db_chunk_size=None,
                                topK=10, axis="data", mega_batches=128,
                                generation=4, idf_weighting=None,
                                idf_tables=None, **kwargs):
    """Drop-in variant of bm25_topk_retrieval with the pool scan sharded
    over ``mesh`` axis ``axis``. ``generation`` / ``idf_weighting``
    follow bm25_topk_retrieval (generation 1 = Robertson IDF with
    negative-score semantics); ``idf_tables`` overrides the per-column
    pool statistics like the single-device engine's (used by the
    resumable slice driver so a 20M-row pool is counted once, not once
    per slice). The exact-match prefilter (``exact_match_col_indices``)
    runs as a dense candidate mask inside each shard's scan — identical
    output to the single-device windowed path, tested on the 8-device
    CPU mesh."""
    assert generation in (1, 2, 3, 4), generation
    if idf_weighting is None:
        idf_weighting = "robertson" if generation == 1 else "lucene"
    robertson = idf_weighting == "robertson"
    exm = kwargs.get("exact_match_col_indices") or None
    if exm:
        assert not robertson, \
            "exact-match requires the lucene IDF (generations 2-4)"
        assert idf_tables is None, \
            "idf_tables override is not supported with exact_match_cols"
        exm = tuple(int(c) for c in exm)
    db_np_data = np.ascontiguousarray(db_np_data, dtype=np.int64)
    qry_np_data = np.ascontiguousarray(qry_np_data, dtype=np.int64)
    Q, N = len(qry_np_data), len(db_np_data)
    n_shards = mesh.shape[axis]
    rest_cols = None
    if exm:
        rest_cols = tuple(c for c in range(db_np_data.shape[1])
                          if c not in exm)
        idf_tables = _compute_idf_tables(db_np_data[:, list(rest_cols)],
                                         idf_weighting)
    elif idf_tables is None:
        idf_tables = _compute_idf_tables(db_np_data, idf_weighting)
    idf_pack = _pack_idf_dense(idf_tables)
    dense_idf = idf_pack is not None
    if not dense_idf:
        idf_pack = _pack_idf_tables(idf_tables)
    qry_batch_size = Q if qry_batch_size is None else min(qry_batch_size,
                                                          max(Q, 1))
    qry_batch_size = max(qry_batch_size, 1)
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

    # bound device work per dispatch (see bm25.py: multi-minute single
    # XLA executions trip remote-runtime watchdogs); per-shard work is
    # N / n_shards rows per query
    max_scores = float(kwargs.get("max_scores_per_dispatch", 5e11))
    per_batch = max(float(qry_batch_size) * max(N, 1) / n_shards, 1.0)
    mega_batches = max(1, min(mega_batches, int(max_scores / per_batch)))

    n_batches = _round_up(Q, qry_batch_size) // qry_batch_size
    qry_padded = np.zeros((n_batches * qry_batch_size, qry_np_data.shape[1]),
                          dtype=np.int32)
    qry_padded[:Q] = qry_np_data
    qry_batches = qry_padded.reshape(n_batches, qry_batch_size, -1)

    def collect(pending):
        (V, I, L), lo, hi = pending
        V, I, L = jax.device_get((V, I, L))
        n = hi - lo
        topK_values[lo:hi] = V.reshape(-1, topK)[:n].astype(np.float64)
        topK_indices[lo:hi] = I.reshape(-1, topK)[:n].astype(np.int64)
        topK_lens[lo:hi] = L.reshape(-1)[:n].astype(np.int64)

    pending = None
    for mb_start in range(0, n_batches, mega_batches):
        mb = qry_batches[mb_start: mb_start + mega_batches]
        nb = len(mb)
        if nb < mega_batches and mb_start > 0:
            pad = np.zeros((mega_batches - nb,) + mb.shape[1:], dtype=mb.dtype)
            mb = np.concatenate([mb, pad])
        out = _sharded_scan_batched(db_dev, jnp.asarray(mb), idf_pack,
                                    jnp.int32(N), topk=topK,
                                    chunk_size=chunk_size, mesh=mesh,
                                    axis=axis, dense_idf=dense_idf,
                                    neg_pad=robertson, rest_cols=rest_cols,
                                    exm_cols=exm)
        lo = mb_start * qry_batch_size
        hi = min(lo + nb * qry_batch_size, Q)
        if pending is not None:
            collect(pending)
        pending = (out, lo, hi)
    if pending is not None:
        collect(pending)

    if exm:
        # the reference's BATCH-LEVEL branch (data_utils.py:906-918,
        # preserved by the single-device engine): a query batch whose
        # largest matched group fits in topK takes the flat path — all
        # candidates in GROUP order with value 1.0 — instead of scored
        # order. Overwrite those batches' scan results so sharded output
        # is identical to the single-device engine batch for batch.
        from .bm25 import _exm_flat_fill, _exm_group_windows
        perm, q_matched, q_starts, q_lens = _exm_group_windows(
            db_np_data, qry_np_data, list(exm))
        has_rest = len(rest_cols) > 0
        for qs in range(0, Q, qry_batch_size):
            sl = slice(qs, min(qs + qry_batch_size, Q))
            m = q_matched[sl]
            if not m.any():
                continue
            b_lens = q_lens[sl][m]
            if has_rest and int(b_lens.max()) > topK:
                continue  # scored branch: the dense-mask scan stands
            idx, vals, lens = _exm_flat_fill(q_starts[sl][m], b_lens,
                                             perm, N, topK)
            rows = np.nonzero(m)[0] + qs
            topK_indices[rows] = idx
            topK_values[rows] = vals
            topK_lens[rows] = lens
    return RetrievalResults(topK_values, topK_indices, topK_lens)
