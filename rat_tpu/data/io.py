"""HDF5 artifact IO (reference: fuxictr/datasets/data_utils.py:37-54)."""

import logging
import os

import h5py


def save_hdf5(data_array, data_path, key="data"):
    logging.info("Saving data to h5: " + data_path)
    dir_name = os.path.dirname(data_path)
    if dir_name and not os.path.exists(dir_name):
        os.makedirs(dir_name)
    with h5py.File(data_path, "a") as hf:
        hf.create_dataset(key, data=data_array)


def load_hdf5(data_path, key=None, verbose=True):
    if verbose:
        logging.info("Loading data from h5: " + data_path)
    with h5py.File(data_path, "r") as hf:
        if key is not None:
            data_array = hf[key][()]
        else:
            data_array = hf[list(hf.keys())[0]][()]
    return data_array
