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

from .io import load_hdf5, save_hdf5
from .loader import _fold_self_retrieval, _pool_retrieval


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

    def _block_retrieval(self, block_path, darray):
        rc = self.retrieval_configs
        assert rc.get("pre_retrieval", True), \
            "only the pre-retrieval strategy is implemented"
        data_root, data_fname = os.path.split(block_path)
        cache = os.path.join(data_root, f'retrieval_{rc["topK"]}_' + data_fname)
        if os.path.exists(cache):
            return (load_hdf5(cache, "indices"), load_hdf5(cache, "values"),
                    load_hdf5(cache, "lens"))
        if self.retrieval_pool_fname == "self":
            # intra-block X-fold retrieval (inter-block retrieval is a
            # documented reference TODO, data_generator.py:298)
            idx, vals, lens = _fold_self_retrieval(darray, rc)
        else:
            idx, vals, lens = _pool_retrieval(darray, self._pool_array(), rc)
        save_hdf5(idx, cache, "indices")
        save_hdf5(vals, cache, "values")
        save_hdf5(lens, cache, "lens")
        return idx, vals, lens

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
                idx, vals, lens = self._block_retrieval(block_path, darray)
                if self.retrieval_augmented:
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
