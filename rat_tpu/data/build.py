"""CSV -> h5 dataset build orchestration.

Covers train/valid/test splits, retrieval-pool handling (explicit pool
file, pool_ratio split, or X-fold self-retrieval) and optional
data_block_size chunking. Semantics mirror the reference
(fuxictr/datasets/data_utils.py:1067-1186).
"""

import gc
import logging
import os
import re

import numpy as np
import pandas as pd

from .io import save_hdf5


def split_train_test(train_ddf=None, valid_ddf=None, test_ddf=None, valid_size=0,
                     test_size=0, split_type="sequential"):
    num_samples = len(train_ddf)
    train_size = num_samples
    instance_IDs = np.arange(num_samples)
    if split_type == "random":
        np.random.shuffle(instance_IDs)
    if test_size > 0:
        if test_size < 1:
            test_size = int(num_samples * test_size)
        train_size = train_size - test_size
        test_ddf = train_ddf.loc[instance_IDs[train_size:], :].reset_index()
        instance_IDs = instance_IDs[0:train_size]
    if valid_size > 0:
        if valid_size < 1:
            valid_size = int(num_samples * valid_size)
        train_size = train_size - valid_size
        valid_ddf = train_ddf.loc[instance_IDs[train_size:], :].reset_index()
        instance_IDs = instance_IDs[0:train_size]
    if valid_size > 0 or test_size > 0:
        train_ddf = train_ddf.loc[instance_IDs, :].reset_index()
    return train_ddf, valid_ddf, test_ddf


def _save_split(data_array, data_dir, split_name, block_size):
    if block_size > 0:
        block_id = 0
        for idx in range(0, len(data_array), block_size):
            save_hdf5(data_array[idx:(idx + block_size), :],
                      os.path.join(data_dir, "{}_part_{}.h5".format(split_name, block_id)))
            block_id += 1
    else:
        save_hdf5(data_array, os.path.join(data_dir, "{}.h5".format(split_name)))


def build_dataset(feature_encoder, train_data=None, valid_data=None, test_data=None,
                  valid_size=0, test_size=0, split_type="sequential",
                  retrieval_configs=None, **kwargs):
    """Build feature_map and transform CSVs into h5 splits."""
    train_ddf = feature_encoder.read_csv(train_data)
    valid_ddf = feature_encoder.read_csv(valid_data) if valid_data else None
    test_ddf = feature_encoder.read_csv(test_data) if test_data else None

    train_ddf = feature_encoder.preprocess(train_ddf)
    if valid_ddf is not None:
        valid_ddf = feature_encoder.preprocess(valid_ddf)
    if test_ddf is not None:
        test_ddf = feature_encoder.preprocess(test_ddf)

    if valid_size > 0 or test_size > 0:
        train_ddf, valid_ddf, test_ddf = split_train_test(
            train_ddf, valid_ddf, test_ddf, valid_size, test_size, split_type)

    retrieval_pool_ddf = None
    if retrieval_configs is not None:
        if "retrieval_pool_data" in retrieval_configs:
            # explicit pool file: fit the encoder on train + pool rows
            retrieval_pool_ddf = feature_encoder.read_csv(
                retrieval_configs["retrieval_pool_data"])
            retrieval_pool_ddf = feature_encoder.preprocess(retrieval_pool_ddf)
            feature_encoder.fit(pd.concat([train_ddf, retrieval_pool_ddf], copy=False),
                                **kwargs)
        else:
            assert "pool_ratio" in retrieval_configs
            assert "split_type" in retrieval_configs
            feature_encoder.fit(train_ddf, **kwargs)
            # X-fold self-retrieval needs no separate pool split
            if re.match(r"\d+-fold", retrieval_configs["split_type"]) is None:
                retrieval_pool_ddf, train_ddf, _ = split_train_test(
                    train_ddf=train_ddf,
                    valid_size=(1 - retrieval_configs["pool_ratio"]),
                    split_type=retrieval_configs["split_type"])
    else:
        feature_encoder.fit(train_ddf, **kwargs)

    block_size = int(kwargs.get("data_block_size", 0))

    train_array = feature_encoder.transform(train_ddf)
    _save_split(train_array, feature_encoder.data_dir, "train", block_size)
    del train_array, train_ddf
    gc.collect()

    if retrieval_configs is not None and \
            re.match(r"\d+-fold", retrieval_configs["split_type"]) is None:
        retrieval_pool_array = feature_encoder.transform(retrieval_pool_ddf)
        _save_split(retrieval_pool_array, feature_encoder.data_dir,
                    "retrieval_pool", block_size)
        del retrieval_pool_array, retrieval_pool_ddf
        gc.collect()

    if valid_ddf is not None:
        valid_array = feature_encoder.transform(valid_ddf)
        _save_split(valid_array, feature_encoder.data_dir, "valid", block_size)
        del valid_array, valid_ddf
        gc.collect()

    if test_ddf is not None:
        test_array = feature_encoder.transform(test_ddf)
        _save_split(test_array, feature_encoder.data_dir, "test", block_size)
        del test_array, test_ddf
        gc.collect()
    logging.info("Transform csv data to h5 done.")
