"""HDF5 artifact IO (reference: fuxictr/datasets/data_utils.py:37-54)."""

import logging
import os

import h5py


def save_hdf5(data_array, data_path, key="data"):
    """Append one dataset under ``key`` (same artifact layout as the
    reference so its loaders can read our caches and vice versa)."""
    logging.info("Saving data to h5: %s", data_path)
    parent = os.path.dirname(data_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with h5py.File(data_path, "a") as hf:
        hf.create_dataset(key, data=data_array)


def save_hdf5_atomic(datasets, data_path):
    """Write several datasets as ONE h5 file, atomically.

    ``datasets`` is a dict of key -> array. The file is written to a
    temporary sibling path and os.rename'd into place so a crash
    mid-write can never leave a partial cache that passes an
    ``os.path.exists`` check (a partial file would KeyError on load and
    require manual deletion).
    """
    logging.info("Saving data to h5: %s", data_path)
    parent = os.path.dirname(data_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp_path = data_path + ".tmp.%d" % os.getpid()
    try:
        with h5py.File(tmp_path, "w") as hf:
            for key, arr in datasets.items():
                hf.create_dataset(key, data=arr)
        os.rename(tmp_path, data_path)
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)


def load_hdf5(data_path, key=None, verbose=True):
    if verbose:
        logging.info("Loading data from h5: " + data_path)
    with h5py.File(data_path, "r") as hf:
        if key is not None:
            data_array = hf[key][()]
        else:
            data_array = hf[list(hf.keys())[0]][()]
    return data_array
