"""Data loading runtime: splits + retrieval precompute + device batching.

Re-design of the reference DataLoader stack
(fuxictr/pytorch/data_generator.py:33-508). The reference gathers each
sample's neighbors on the host in DataLoader workers and ships a
(B,1+K,F+1) float batch to the device per step. On TPU the entire split
(IDs + labels + neighbor indices) lives in HBM once, and the per-batch
neighbor gather happens *inside* the jitted train step — the host only
feeds row indices, eliminating the host->device input bottleneck.

Retrieval precompute keeps the reference's driver semantics
(data_generator.py:100-232):

- X-fold self-retrieval: split the split's own rows into contiguous
  folds; queries = fold i, db = all other folds; map local -> global;
- label_wise: separate pos-pool and neg-pool retrievals concatenated to
  2K neighbors;
- results cached to ``retrieval_{topK}_<fname>.h5`` with keys
  indices/values/lens (same artifact format as the reference).
"""

import glob
import logging
import os
import re

import numpy as np

from ..retrieval.bm25 import bm25_topk_retrieval
from .io import load_hdf5, save_hdf5_atomic

# pools below this size fit one chip's scan comfortably; above it the
# precompute shards the pool over the mesh 'data' axis (SURVEY §5
# long-context row: Tmall's pool is ~20M rows)
_SHARDED_POOL_MIN_ROWS = 2_000_000

# queries per checkpointed slice of a resumable precompute (VERDICT r3
# item 3): ~9 min of scan at Tmall's measured ~3.8k q/s — a crash costs
# one slice, not the 3-hour scan the reference's split-level cache
# granularity (data_generator.py:213-215) would lose
_RESUME_SLICE_ROWS = 2_000_000

# driver-side knobs that are not engine kwargs
_DRIVER_KEYS = ("mesh", "sharded_pool_min_rows", "resume_base",
                "resume_slice_rows")


class _PartialRetrievalStore:
    """Crash-resumable store for a long retrieval precompute: one
    preallocated h5 file holding indices/values/lens plus a monotone
    ``done_rows`` cursor. A slice's arrays are flushed BEFORE the
    cursor advances, so a crash at any point costs at most the
    in-flight slice (the cursor then understates and that slice is
    idempotently re-scanned). A fingerprint attribute invalidates
    partials left by a different configuration."""

    def __init__(self, path, n_rows, topk, fingerprint):
        import h5py
        self.path = path
        fresh = not os.path.exists(path)
        self.hf = h5py.File(path, "a")
        stored = self.hf.attrs.get("fingerprint") if not fresh else None
        if stored is not None and stored != fingerprint:
            # legacy 5-field format carried resume_slice_rows as a 5th
            # field; the cursor is slice-size-agnostic, so those
            # partials stay valid — normalize the attr in place
            if str(stored).split(":")[:4] == fingerprint.split(":"):
                self.hf.attrs["fingerprint"] = fingerprint
                stored = fingerprint
        if not fresh and stored != fingerprint:
            logging.info("Discarding stale retrieval partial %s", path)
            self.hf.close()
            os.remove(path)
            fresh = True
            self.hf = h5py.File(path, "a")
        if fresh:
            self.hf.create_dataset("indices", shape=(n_rows, topk),
                                   dtype="i8", fillvalue=-1)
            self.hf.create_dataset("values", shape=(n_rows, topk), dtype="f8")
            self.hf.create_dataset("lens", shape=(n_rows,), dtype="i8")
            self.hf.create_dataset("done_rows", shape=(), dtype="i8")
            self.hf.attrs["fingerprint"] = fingerprint
            self.hf.flush()

    @property
    def done_rows(self):
        return int(self.hf["done_rows"][()])

    def append(self, lo, res):
        hi = lo + len(res.lens)
        self.hf["indices"][lo:hi] = res.indices
        self.hf["values"][lo:hi] = res.values
        self.hf["lens"][lo:hi] = res.lens
        self.hf.flush()                  # data durable before the cursor
        self.hf["done_rows"][()] = hi
        self.hf.flush()

    def results(self):
        from ..retrieval.bm25 import RetrievalResults
        return RetrievalResults(self.hf["values"][()],
                                self.hf["indices"][()],
                                self.hf["lens"][()])

    def close(self):
        self.hf.close()


def _cleanup_partials(resume_base):
    for p in glob.glob(resume_base + ".*.partial.h5"):
        os.remove(p)


def _retrieve(db_np_data, qry_np_data, retrieval_configs, resume_tag=None):
    """Engine dispatch: the mesh-sharded pool scan when a mesh is
    configured and the pool is large (identical results either way —
    tested), else the single-device engine.

    With ``resume_tag`` and a ``resume_base`` path in the configs,
    query sets larger than ``resume_slice_rows`` run as checkpointed
    slices through a _PartialRetrievalStore: a multi-hour scan killed
    mid-way resumes from its last completed slice instead of from zero.
    Per-pool IDF tables are computed once and reused across slices."""
    rc = retrieval_configs
    engine_kwargs = {k: v for k, v in rc.items() if k not in _DRIVER_KEYS}
    mesh = rc.get("mesh")
    min_rows = rc.get("sharded_pool_min_rows", _SHARDED_POOL_MIN_ROWS)
    sharded = mesh is not None and len(db_np_data) >= min_rows

    def run(qry, **extra):
        if sharded:
            from ..retrieval.sharded import sharded_bm25_topk_retrieval
            logging.info("Sharded BM25 pool scan over mesh {} ({} rows{})"
                         .format(dict(mesh.shape), len(db_np_data),
                                 ", dense exact-match mask"
                                 if rc.get("exact_match_col_indices") else ""))
            return sharded_bm25_topk_retrieval(db_np_data, qry, mesh,
                                               **engine_kwargs, **extra)
        return bm25_topk_retrieval(db_np_data=db_np_data,
                                   qry_np_data=qry, **engine_kwargs, **extra)

    Q = len(qry_np_data)
    resume_base = rc.get("resume_base")
    slice_rows = int(rc.get("resume_slice_rows",
                            os.environ.get("RAT_TPU_RESUME_SLICE_ROWS",
                                           _RESUME_SLICE_ROWS)))
    if resume_base is None or resume_tag is None or Q <= slice_rows:
        return run(qry_np_data)

    topk = engine_kwargs.get("topK", 10)
    ncols = qry_np_data.shape[1] if qry_np_data.ndim > 1 else 0
    # slice_rows is deliberately NOT part of the fingerprint: done_rows
    # is a row cursor, so a partial written under one slice size resumes
    # correctly under any other (changing the knob between restarts must
    # not throw away hours of completed scan)
    fingerprint = "{}:{}:{}:{}".format(Q, len(db_np_data), topk, ncols)
    store = _PartialRetrievalStore(
        "{}.{}.partial.h5".format(resume_base, resume_tag),
        Q, topk, fingerprint)
    try:
        done = store.done_rows
        if done:
            logging.info("Resuming retrieval '%s' at %d/%d queries",
                         resume_tag, done, Q)
        extra = {}
        if not engine_kwargs.get("exact_match_col_indices") \
                and engine_kwargs.get("idf_tables") is None:
            # pool statistics are slice-invariant: one linear pass here
            # instead of one per slice
            from ..retrieval.bm25 import _compute_idf_tables
            weighting = engine_kwargs.get("idf_weighting") or (
                "robertson" if engine_kwargs.get("generation", 4) == 1
                else "lucene")
            extra["idf_tables"] = _compute_idf_tables(
                np.ascontiguousarray(db_np_data, dtype=np.int64), weighting)
        for lo in range(done, Q, slice_rows):
            hi = min(lo + slice_rows, Q)
            store.append(lo, run(qry_np_data[lo:hi], **extra))
        # the partial survives until the caller's final cache write, so
        # a crash in between still resumes for free
        return store.results()
    finally:
        store.close()


def _fold_self_retrieval(data_array, retrieval_configs):
    """10-fold style self-retrieval (data_generator.py:115-176)."""
    used_cols = retrieval_configs["used_col_indices"]
    retrieval_data_array = data_array[:, used_cols].astype(int)
    label_wise = retrieval_configs.get("label_wise", False)
    if label_wise:
        retrieval_db_labels = data_array[:, -1].astype(int)
    retrieved_indices, retrieved_values, retrieved_lens = [], [], []
    fold_num = int(re.match(r"\d+-fold",
                            retrieval_configs["split_type"]).group().split("-")[0])
    fold_size = int(np.ceil(len(retrieval_data_array) / fold_num))
    for fi in range(fold_num):
        logging.info(f"{fold_num}-fold retrieval: process the {fi}-th fold")
        fold_qry_data = retrieval_data_array[fi * fold_size: (fi + 1) * fold_size]
        fold_db_data = np.concatenate(
            [retrieval_data_array[: fi * fold_size],
             retrieval_data_array[(fi + 1) * fold_size:]], axis=0)
        fold_db_indices = np.concatenate(
            [np.arange(fi * fold_size),
             np.arange((fi + 1) * fold_size, len(retrieval_data_array))], axis=0)
        if label_wise:
            fold_db_labels = np.concatenate(
                [retrieval_db_labels[: fi * fold_size],
                 retrieval_db_labels[(fi + 1) * fold_size:]], axis=0)
            parts_i, parts_v, parts_l = [], [], []
            for sub, sub_indices in (("pos", np.nonzero(fold_db_labels)[0]),
                                     ("neg", np.nonzero(1 - fold_db_labels)[0])):
                res = _retrieve(fold_db_data[sub_indices], fold_qry_data,
                                retrieval_configs,
                                resume_tag="fold{}.{}".format(fi, sub))
                parts_i.append(fold_db_indices[sub_indices[res.indices]])
                parts_v.append(res.values)
                parts_l.append(res.lens)
            retrieved_indices.append(np.concatenate(parts_i, axis=-1))  # Bx(2K)
            retrieved_values.append(np.concatenate(parts_v, axis=-1))   # Bx(2K)
            retrieved_lens.append(np.stack(parts_l, axis=-1))           # Bx2
        else:
            res = _retrieve(fold_db_data, fold_qry_data, retrieval_configs,
                            resume_tag="fold{}".format(fi))
            retrieved_indices.append(fold_db_indices[res.indices])
            retrieved_values.append(res.values)
            retrieved_lens.append(res.lens)
    return (np.concatenate(retrieved_indices),
            np.concatenate(retrieved_values),
            np.concatenate(retrieved_lens))


def _pool_retrieval(data_array, db_array, retrieval_configs):
    """Retrieval of split queries against an external pool
    (data_generator.py:177-212)."""
    used_cols = retrieval_configs["used_col_indices"]
    db_data = db_array[:, used_cols].astype(int)
    qry_data = data_array[:, used_cols].astype(int)
    if retrieval_configs.get("label_wise", False):
        db_labels = db_array[:, -1].astype(int)
        parts_i, parts_v, parts_l = [], [], []
        for sub, sub_indices in (("pos", np.nonzero(db_labels)[0]),
                                 ("neg", np.nonzero(1 - db_labels)[0])):
            res = _retrieve(db_data[sub_indices], qry_data,
                            retrieval_configs, resume_tag="pool." + sub)
            parts_i.append(sub_indices[res.indices])
            parts_v.append(res.values)
            parts_l.append(res.lens)
        return (np.concatenate(parts_i, axis=-1),
                np.concatenate(parts_v, axis=-1),
                np.stack(parts_l, axis=-1))
    res = _retrieve(db_data, qry_data, retrieval_configs, resume_tag="pool")
    return res.indices, res.values, res.lens


class DataGenerator(object):
    """One split: data arrays + (optional) cached neighbor retrieval.

    Exposes the reference's counters (num_samples/num_positives/
    num_negatives/num_batches/num_blocks, data_generator.py:242-251)
    and index-batch iteration for the jitted step.

    NOTE on the -1 padded neighbor index: the reference gathers pool row
    -1, which wraps to the pool's LAST row without masking
    (data_generator.py:69). ``neighbor_gather_indices`` reproduces that
    wrapping explicitly for parity.
    """

    def __init__(self, data_path, batch_size=32, shuffle=False,
                 feature_map=None,
                 retrieval_configs=None,
                 retrieval_pool_fname=None,
                 retrieval_augmented=False,
                 **kwargs):
        if isinstance(data_path, list):
            data_paths = data_path
        else:
            data_paths = [data_path]
        arrays = [load_hdf5(p) for p in data_paths]
        data_array = arrays[0] if len(arrays) == 1 else np.concatenate(arrays, axis=0)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.feature_map = feature_map
        self.retrieval_augmented = False
        self.darray = data_array
        self.pool_darray = None
        # identity of the retrieval pool ("self", a file path, or None)
        # so consumers can share one device upload across generators
        # that read the same explicit pool file (engine/trainer.py)
        self.retrieval_pool_fname = retrieval_pool_fname
        self.retr_indices = None
        self.retr_values = None
        self.retr_lens = None

        if retrieval_configs is not None:
            assert retrieval_configs.get("pre_retrieval", True), \
                "only the pre-retrieval strategy is implemented"
            db_array = None
            if retrieval_pool_fname != "self":
                logging.info(f"{retrieval_configs['split_type']} retrieval, "
                             f"pool file: {retrieval_pool_fname}")
                db_array = load_hdf5(retrieval_pool_fname)
            data_root, data_fname = os.path.split(data_paths[0])
            retrieval_save_path = os.path.join(
                data_root, f'retrieval_{retrieval_configs["topK"]}_' + data_fname)
            if os.path.exists(retrieval_save_path):
                retrieved_indices = load_hdf5(retrieval_save_path, "indices")
                retrieved_values = load_hdf5(retrieval_save_path, "values")
                retrieved_lens = load_hdf5(retrieval_save_path, "lens")
            else:
                # resume_base switches long scans to checkpointed slices
                # keyed off the final cache path (VERDICT r3 item 3)
                rc = dict(retrieval_configs, resume_base=retrieval_save_path)
                if retrieval_pool_fname == "self":
                    retrieved_indices, retrieved_values, retrieved_lens = \
                        _fold_self_retrieval(data_array, rc)
                else:
                    retrieved_indices, retrieved_values, retrieved_lens = \
                        _pool_retrieval(data_array, db_array, rc)
                save_hdf5_atomic({"indices": retrieved_indices,
                                  "values": retrieved_values,
                                  "lens": retrieved_lens},
                                 retrieval_save_path)
                _cleanup_partials(retrieval_save_path)
            if retrieval_augmented:
                self.retrieval_augmented = True
                self.pool_darray = data_array if retrieval_pool_fname == "self" \
                    else db_array
                self.retr_indices = retrieved_indices.astype(np.int64)
                self.retr_values = retrieved_values
                self.retr_lens = retrieved_lens
                assert len(self.darray) == len(self.retr_indices) == \
                    len(self.retr_values) == len(self.retr_lens)
            else:
                logging.info("[[WARNING]] dataloader provided retrieved samples but "
                             "the model doesn't enable retrieval-augmented mode.")
        else:
            assert not retrieval_augmented, \
                "retrieval-augmented mode requires a dataset with retrieval configs"

        self.num_blocks = 1
        self.num_samples = len(self.darray)
        self.num_batches = int(np.ceil(self.num_samples * 1.0 / self.batch_size))
        if self.darray.ndim == 2:
            self.num_positives = self.darray[:, -1].sum()
        elif self.darray.ndim == 3:
            self.num_positives = self.darray[:, 0, -1].sum()
        else:
            raise RuntimeError("data_array must be [Nx(F+1)] or [Nx(K+1)x(F+1)]")
        self.num_negatives = self.num_samples - self.num_positives

    # ---- device-pipeline accessors -------------------------------------
    @property
    def topk(self):
        return 0 if self.retr_indices is None else self.retr_indices.shape[-1]

    def neighbor_gather_indices(self):
        """Neighbor row ids with the reference's -1 -> last-row wrap."""
        n_pool = len(self.pool_darray)
        return np.where(self.retr_indices < 0,
                        self.retr_indices + n_pool,
                        self.retr_indices).astype(np.int32)

    def neighbor_valid_mask(self):
        """[N, K] float32 validity per neighbor slot (1 = real neighbor,
        0 = dropped zero-score slot). Backs the corrected
        ``neighbor_padding="mask"`` mode, which zero-masks dropped
        neighbors instead of reproducing the reference's silent wrap of
        index -1 to the pool's LAST row (data_generator.py:69)."""
        return (self.retr_indices >= 0).astype(np.float32)

    def epoch_index_batches(self, rng=None):
        """Yield (row_indices [B], valid_count) per step; the final
        partial batch is padded by repeating index 0 and masked in the
        loss/metrics (the reference relies on ragged last batches,
        base_model.py:220-230)."""
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


def get_data_generator(data_path_list, batch_size=32, shuffle=False,
                       feature_map=None, retrieval_configs=None,
                       retrieval_pool_fname=None, retrieval_augmented=False,
                       **kwargs):
    """1 block -> DataGenerator (whole split device-resident); >1 block
    -> streaming DataBlockGenerator with per-block retrieval caches
    (reference split at data_generator.py:479-508). Keeping the split
    avoids cache-filename collisions between full-split and per-block
    retrieval artifacts."""
    assert len(data_path_list) > 0, "invalid data files or paths."
    if len(data_path_list) == 1:
        return DataGenerator(data_path=data_path_list,
                             batch_size=batch_size,
                             shuffle=shuffle,
                             feature_map=feature_map,
                             retrieval_configs=retrieval_configs,
                             retrieval_pool_fname=retrieval_pool_fname,
                             retrieval_augmented=retrieval_augmented,
                             **kwargs)
    from .block_loader import DataBlockGenerator
    return DataBlockGenerator(data_block_list=data_path_list,
                              batch_size=batch_size,
                              shuffle=shuffle,
                              feature_map=feature_map,
                              retrieval_configs=retrieval_configs,
                              retrieval_pool_fname=retrieval_pool_fname,
                              retrieval_augmented=retrieval_augmented,
                              **kwargs)


def tfrecord_generator():
    """API-parity stub (reference: data_utils.py:1283-1284)."""
    raise NotImplementedError()


def h5_generator(feature_map, stage="both", train_data=None, valid_data=None,
                 test_data=None, batch_size=32, shuffle=True,
                 retrieval_configs=None, retrieval_augmented=False, **kwargs):
    """Stage-aware generator factory (data_utils.py:1189-1280).

    Resolves retrieval column names to indices, picks the retrieval pool
    per split (X-fold: train pool = 'self', valid/test pool = first
    train block), and logs the sample-count summary lines.
    """
    logging.info("Loading data...")
    if retrieval_configs is not None:
        retrieval_col_indices = []
        for col in retrieval_configs["used_cols"]:
            retrieval_col_indices.append(feature_map.feature_specs[col]["index"])
        retrieval_configs["used_col_indices"] = retrieval_col_indices
        exact_match_col_indices = None
        if len(retrieval_configs.get("exact_match_cols", []) or []) > 0:
            exact_match_col_indices = [retrieval_configs["used_cols"].index(item)
                                       for item in retrieval_configs["exact_match_cols"]]
        retrieval_configs["exact_match_col_indices"] = exact_match_col_indices

    def _sorted_blocks(pattern):
        blocks = glob.glob(pattern)
        if len(blocks) > 1:
            blocks.sort(key=lambda x: int(x.split("_")[-1].split(".")[0]))
        return blocks

    train_gen = valid_gen = test_gen = None
    if stage in ["both", "train"]:
        train_blocks = _sorted_blocks(train_data)
        valid_blocks = _sorted_blocks(valid_data)
        assert len(train_blocks) > 0 and len(valid_blocks) > 0, \
            "invalid data files or paths."
        if retrieval_configs is None:
            train_pool = valid_pool = None
        elif re.match(r"\d+-fold", retrieval_configs["split_type"]) is not None:
            train_pool = "self"
            valid_pool = train_blocks[0]
        else:
            train_pool = retrieval_configs["retrieval_pool_data"]
            valid_pool = retrieval_configs["retrieval_pool_data"]
        train_gen = get_data_generator(train_blocks, batch_size=batch_size,
                                       shuffle=shuffle, feature_map=feature_map,
                                       retrieval_configs=retrieval_configs,
                                       retrieval_pool_fname=train_pool,
                                       retrieval_augmented=retrieval_augmented,
                                       **kwargs)
        valid_gen = get_data_generator(valid_blocks, batch_size=batch_size,
                                       shuffle=False, feature_map=feature_map,
                                       retrieval_configs=retrieval_configs,
                                       retrieval_pool_fname=valid_pool,
                                       retrieval_augmented=retrieval_augmented,
                                       **kwargs)
        logging.info("Train samples: total/{:d}, pos/{:.0f}, neg/{:.0f}, ratio/{:.2f}%, blocks/{:.0f}"
                     .format(train_gen.num_samples, train_gen.num_positives,
                             train_gen.num_negatives,
                             100. * train_gen.num_positives / train_gen.num_samples,
                             train_gen.num_blocks))
        logging.info("Validation samples: total/{:d}, pos/{:.0f}, neg/{:.0f}, ratio/{:.2f}%, blocks/{:.0f}"
                     .format(valid_gen.num_samples, valid_gen.num_positives,
                             valid_gen.num_negatives,
                             100. * valid_gen.num_positives / valid_gen.num_samples,
                             valid_gen.num_blocks))
        if stage == "train":
            logging.info("Loading train data done.")
            return train_gen, valid_gen

    if stage in ["both", "test"]:
        test_blocks = _sorted_blocks(test_data) if test_data else []
        if len(test_blocks) > 0:
            if retrieval_configs is None:
                test_pool = None
            elif re.match(r"\d+-fold", retrieval_configs["split_type"]) is not None:
                test_pool = _sorted_blocks(train_data)[0]
            else:
                test_pool = retrieval_configs["retrieval_pool_data"]
            test_gen = get_data_generator(test_blocks, batch_size=batch_size,
                                          shuffle=False, feature_map=feature_map,
                                          retrieval_configs=retrieval_configs,
                                          retrieval_pool_fname=test_pool,
                                          retrieval_augmented=retrieval_augmented,
                                          **kwargs)
            logging.info("Test samples: total/{:d}, pos/{:.0f}, neg/{:.0f}, ratio/{:.2f}%, blocks/{:.0f}"
                         .format(test_gen.num_samples, test_gen.num_positives,
                                 test_gen.num_negatives,
                                 100. * test_gen.num_positives / test_gen.num_samples,
                                 test_gen.num_blocks))
        if stage == "test":
            logging.info("Loading test data done.")
            return test_gen

    logging.info("Loading data done.")
    return train_gen, valid_gen, test_gen
