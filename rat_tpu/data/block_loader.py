"""Streaming multi-block data runtime.

Re-design of the reference DataBlockGenerator
(fuxictr/pytorch/data_generator.py:257-476): datasets written with
``data_block_size > 0`` produce ``<split>_part_<i>.h5`` files that are
iterated block by block (optionally shuffling block order and
intra-block row order), with the same per-block self/X-fold/pool
retrieval + ``retrieval_{K}_<block>`` caching as the single-block path.

TPU shape: each block is uploaded to device memory once and stepped by
index batches, exactly like DataGenerator, so the jitted train step is
shared; only the outer iteration differs. Blocks of equal size reuse
the same compiled executable (the builder emits fixed-size blocks, so
only the final block recompiles once).
"""

import logging
import os
import re

import numpy as np

import h5py

from .io import load_hdf5, save_hdf5_atomic
from .loader import _fold_self_retrieval, _pool_retrieval


def _union_idf_tables(block_arrays, used_cols, idf_weighting="lucene"):
    """Per-column IDF over the union of blocks, accumulated streaming
    (one block in memory at a time). ``idf_weighting`` follows
    retrieval.bm25._compute_idf_tables."""
    from collections import Counter
    counters = [Counter() for _ in used_cols]
    N = 0
    for arr in block_arrays():
        data = arr[:, used_cols].astype(np.int64)
        N += len(data)
        for c in range(data.shape[1]):
            keys, counts = np.unique(data[:, c], return_counts=True)
            counters[c].update(dict(zip(keys.tolist(), counts.tolist())))
    tables = []
    for c in range(len(used_cols)):
        keys = np.array(sorted(counters[c]), dtype=np.int64)
        counts = np.array([counters[c][k] for k in keys], dtype=np.float64)
        if idf_weighting == "robertson":
            idf = np.log((N - counts + 0.5) / (counts + 0.5)).astype(np.float32)
            idf[keys == -1] = 0.0
        else:
            assert idf_weighting == "lucene", idf_weighting
            idf = np.log(N / counts).astype(np.float32)
        tables.append((keys, idf))
    return tables, N


def _inter_block_retrieval(block_paths, qry_block_index, qry_darray,
                           retrieval_configs):
    """Retrieve block ``qry_block_index``'s rows against the union of all
    OTHER blocks — the streaming-mode retrieval the reference leaves as a
    TODO (data_generator.py:298, intra-block only).

    Design: one db block is resident at a time. IDF statistics come from
    the union pool (first streaming pass); each db block is then scored
    with those shared tables and its top-K merged into the running best
    on host with the engine's (score desc, global index asc) tie-break.
    Because the training pool for a block view would otherwise be the
    whole dataset, the selected neighbor ROWS are materialized into the
    per-block cache (``neighbor_rows`` [N, K, F+1]) so neither training
    nor eval ever needs more than one block in memory.

    Global indices refer to the concatenation of ALL blocks in file
    order (the query block's own rows are never selected). Dropped
    neighbors (score 0 -> index -1) materialize the union pool's last
    row, mirroring the single-block path's -1 gather wrap.

    Returns (indices [N, K] i64, values [N, K] f64, lens [N] i64,
    neighbor_rows [N, K, F+1]).
    """
    from ..retrieval import bm25_topk_retrieval
    rc = retrieval_configs
    assert not rc.get("label_wise", False), \
        "inter_block_retrieval does not support label_wise"
    assert not rc.get("exact_match_col_indices"), \
        "inter_block_retrieval does not support exact_match_cols"
    # the host-side running-top-K merge below uses non-negative-score
    # sentinels (-1.0 = dropped), which Robertson's negative scores
    # would break — reject rather than silently mis-rank. Resolve the
    # effective weighting exactly as bm25_topk_retrieval does: explicit
    # idf_weighting wins, else generation==1 implies Robertson.
    effective_idf = rc.get("idf_weighting") or \
        ("robertson" if rc.get("generation", 4) == 1 else "lucene")
    assert effective_idf != "robertson", \
        "inter_block_retrieval supports only the lucene IDF (non-negative scores)"
    used_cols = rc["used_col_indices"]
    topK = rc["topK"]

    others = [(j, p) for j, p in enumerate(block_paths)
              if j != qry_block_index]

    def other_arrays():
        for _, p in others:
            yield load_hdf5(p, verbose=False)

    idf_tables, _ = _union_idf_tables(other_arrays, used_cols)

    block_rows = []
    offsets = np.zeros(len(block_paths), dtype=np.int64)
    # offsets into the all-blocks concatenation (query block included)
    n_prev = 0
    for j, p in enumerate(block_paths):
        if j == qry_block_index:
            n = len(qry_darray)
        else:
            with h5py.File(p, "r") as hf:
                n = hf[list(hf.keys())[0]].shape[0]
        offsets[j] = n_prev
        block_rows.append(n)
        n_prev += n

    qry = qry_darray[:, used_cols].astype(int)
    N = len(qry)
    Fp1 = qry_darray.shape[1]
    best_v = np.zeros((N, 0), dtype=np.float64)
    best_i = np.zeros((N, 0), dtype=np.int64)
    best_rows = np.zeros((N, 0, Fp1), dtype=qry_darray.dtype)
    last_row = None
    for j, p in others:
        db_arr = load_hdf5(p, verbose=False)
        last_row = db_arr[-1]
        res = bm25_topk_retrieval(db_np_data=db_arr[:, used_cols].astype(int),
                                  qry_np_data=qry, idf_tables=idf_tables,
                                  **{k: v for k, v in rc.items()
                                     if k != "exact_match_col_indices"})
        keep = res.values > 0
        loc = np.where(keep, res.indices, 0)
        rows = db_arr[loc]                       # [N, K, F+1]
        gidx = np.where(keep, res.indices + offsets[j], 2**62)
        vals = np.where(keep, res.values, -1.0)  # dropped always lose
        best_v = np.concatenate([best_v, vals], axis=1)
        best_i = np.concatenate([best_i, gidx], axis=1)
        best_rows = np.concatenate([best_rows, rows], axis=1)
        # keep only the running top-K: sort by (score desc, index asc)
        order = np.lexsort((best_i, -best_v))[:, :topK]
        best_v = np.take_along_axis(best_v, order, axis=1)
        best_i = np.take_along_axis(best_i, order, axis=1)
        best_rows = np.take_along_axis(best_rows, order[..., None], axis=1)
    drop = best_v <= 0
    values = np.where(drop, 0.0, best_v)
    indices = np.where(drop, -1, best_i)
    lens = (~drop).sum(-1).astype(np.int64)
    neighbor_rows = np.where(drop[..., None], last_row[None, None, :],
                             best_rows)
    return indices, values, lens, neighbor_rows


class DataBlockGenerator(object):
    def __init__(self, data_block_list, batch_size=32, shuffle=False,
                 feature_map=None, retrieval_configs=None,
                 retrieval_pool_fname=None, retrieval_augmented=False,
                 **kwargs):
        self.data_blocks = list(data_block_list)
        self.shuffle = shuffle
        self.batch_size = batch_size
        self.feature_map = feature_map
        self.retrieval_configs = retrieval_configs
        self.retrieval_pool_fname = retrieval_pool_fname
        self.retrieval_augmented = retrieval_augmented
        self.num_blocks = len(self.data_blocks)
        self._pool_cache = None  # external pool h5 loaded at most once
        (self.num_batches, self.num_samples,
         self.num_positives, self.num_negatives) = self._count()

    @property
    def topk(self):
        """Neighbor count per sample, without touching any block."""
        if not self.retrieval_augmented or self.retrieval_configs is None:
            return 0
        k = self.retrieval_configs["topK"]
        return 2 * k if self.retrieval_configs.get("label_wise") else k

    def _pool_array(self):
        if self._pool_cache is None:
            self._pool_cache = load_hdf5(self.retrieval_pool_fname,
                                         verbose=False)
        return self._pool_cache

    def _count(self):
        num_samples = num_positives = num_batches = 0
        for block_path in self.data_blocks:
            with h5py.File(block_path, "r") as hf:
                arr = hf[list(hf.keys())[0]]
                n = arr.shape[0]
                num_samples += n
                if arr.ndim == 2:
                    num_positives += arr[:, -1][()].sum()
                elif arr.ndim == 3:
                    num_positives += arr[:, 0, -1][()].sum()
                else:
                    raise RuntimeError(
                        "data_array must be [Nx(F+1)] or [Nx(K+1)x(F+1)]")
                num_batches += int(np.ceil(n * 1.0 / self.batch_size))
        return num_batches, num_samples, num_positives, num_samples - num_positives

    def _block_set_digest(self):
        """Short digest of the full block list (paths + row counts).

        Inter-block retrieval depends on ALL blocks (union-pool IDF,
        global indices over the all-blocks concatenation), so its cache
        must be invalidated when any block is added, removed, reordered,
        or resized — filename-only keys are only safe for the
        intra-block modes whose result depends on the block alone.
        """
        if getattr(self, "_digest", None) is not None:
            return self._digest
        import hashlib
        h = hashlib.sha256()
        for p in self.data_blocks:
            with h5py.File(p, "r") as hf:
                n = hf[list(hf.keys())[0]].shape[0]
            h.update(("%s:%d;" % (os.path.basename(p), n)).encode())
        # the block list is fixed at construction, so memoize: this is
        # called once per block per epoch and would otherwise re-open
        # every block file each time (O(blocks^2) opens per epoch)
        self._digest = h.hexdigest()[:10]
        return self._digest

    def _block_retrieval(self, block_path, darray):
        """Returns (indices, values, lens, neighbor_rows-or-None)."""
        rc = self.retrieval_configs
        assert rc.get("pre_retrieval", True), \
            "only the pre-retrieval strategy is implemented"
        inter_block = (self.retrieval_pool_fname == "self"
                       and rc.get("inter_block_retrieval", False)
                       and self.num_blocks > 1)
        data_root, data_fname = os.path.split(block_path)
        tag = "inter_%s_" % self._block_set_digest() if inter_block else ""
        cache = os.path.join(data_root,
                             f'retrieval_{tag}{rc["topK"]}_' + data_fname)
        if os.path.exists(cache):
            with h5py.File(cache, "r") as hf:
                has_rows = "neighbor_rows" in hf
            return (load_hdf5(cache, "indices"), load_hdf5(cache, "values"),
                    load_hdf5(cache, "lens"),
                    load_hdf5(cache, "neighbor_rows") if has_rows else None)
        rows = None
        if inter_block:
            bi = self.data_blocks.index(block_path)
            idx, vals, lens, rows = _inter_block_retrieval(
                self.data_blocks, bi, darray, rc)
        elif self.retrieval_pool_fname == "self":
            # intra-block X-fold retrieval (reference behavior; see
            # _inter_block_retrieval for the cross-block mode the
            # reference TODOs at data_generator.py:298)
            idx, vals, lens = _fold_self_retrieval(darray, rc)
        else:
            idx, vals, lens = _pool_retrieval(darray, self._pool_array(), rc)
        payload = {"indices": idx, "values": vals, "lens": lens}
        if rows is not None:
            payload["neighbor_rows"] = rows
        save_hdf5_atomic(payload, cache)
        return idx, vals, lens, rows

    def iter_block_views(self, rng=None):
        """Yield one DataGenerator-shaped view per block, ready for
        Trainer.device_split + epoch_index_batches."""
        blocks = list(self.data_blocks)
        if self.shuffle:
            (rng or np.random).shuffle(blocks)
        for block_path in blocks:
            darray = load_hdf5(block_path, verbose=False)
            view = _BlockView(darray, self.batch_size, self.shuffle)
            if self.retrieval_configs is not None:
                idx, vals, lens, rows = self._block_retrieval(block_path, darray)
                if self.retrieval_augmented:
                    if rows is not None:
                        # inter-block mode: neighbors were materialized at
                        # retrieval time, so the "pool" is just the flat
                        # row store and the gather is the identity layout
                        n, k = rows.shape[:2]
                        pool = rows.reshape(n * k, -1)
                        gather_idx = np.arange(n * k,
                                               dtype=np.int64).reshape(n, k)
                        view.attach_retrieval(pool, gather_idx, vals, lens)
                    else:
                        pool = darray if self.retrieval_pool_fname == "self" \
                            else self._pool_array()
                        view.attach_retrieval(pool, idx, vals, lens)
                else:
                    logging.info("[[WARNING]] dataloader provided retrieved "
                                 "samples but the model doesn't enable "
                                 "retrieval-augmented mode.")
            yield view

    def __len__(self):
        return self.num_batches


class _BlockView(object):
    """DataGenerator-compatible view over one loaded block."""

    def __init__(self, darray, batch_size, shuffle):
        self.darray = darray
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.retrieval_augmented = False
        self.pool_darray = None
        self.retr_indices = None
        self.retr_values = None
        self.retr_lens = None
        self.num_samples = len(darray)
        self.num_batches = int(np.ceil(self.num_samples / batch_size))

    def attach_retrieval(self, pool, idx, vals, lens):
        assert len(self.darray) == len(idx) == len(vals) == len(lens), \
            "retrieval cache length mismatch for this block " \
            f"(block={len(self.darray)}, cache={len(idx)})"
        self.retrieval_augmented = True
        self.pool_darray = pool
        self.retr_indices = idx.astype(np.int64)
        self.retr_values = vals
        self.retr_lens = lens

    @property
    def topk(self):
        return 0 if self.retr_indices is None else self.retr_indices.shape[-1]

    def neighbor_gather_indices(self):
        n_pool = len(self.pool_darray)
        return np.where(self.retr_indices < 0, self.retr_indices + n_pool,
                        self.retr_indices).astype(np.int32)

    def neighbor_valid_mask(self):
        """See DataGenerator.neighbor_valid_mask (neighbor_padding="mask")."""
        return (self.retr_indices >= 0).astype(np.float32)

    def epoch_index_batches(self, rng=None):
        order = np.arange(self.num_samples)
        if self.shuffle:
            (rng or np.random).shuffle(order)
        for start in range(0, self.num_samples, self.batch_size):
            batch = order[start:start + self.batch_size]
            valid = len(batch)
            if valid < self.batch_size:
                batch = np.concatenate(
                    [batch, np.zeros(self.batch_size - valid, dtype=batch.dtype)])
            yield batch.astype(np.int32), valid

    def __len__(self):
        return self.num_batches
