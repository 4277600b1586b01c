from .io import load_hdf5, save_hdf5
from .build import build_dataset, split_train_test
from .loader import h5_generator, get_data_generator, DataGenerator
from .block_loader import DataBlockGenerator
