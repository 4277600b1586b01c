"""Experiment entry point (reference: run_expid.py:27-115).

Flow: load+merge config -> set logger -> seed -> build/load feature map
and h5 splits -> retrieval-augmented generators -> model -> fit ->
reload best checkpoint -> valid/test evaluation -> append a line to the
results CSV. ``--gpu`` is kept for CLI compatibility but ignored: JAX
selects the TPU/CPU backend; mesh topology comes from rat_tpu.parallel.
"""

import argparse
import datetime
import gc
import logging
import os
import re
import sys

import numpy as np

from ..data import build_dataset, h5_generator
from ..engine import Trainer
from ..features import FeatureEncoder, FeatureMap
from ..features import datasets as dataset_encoders
from ..utils import load_config, print_to_json, print_to_list, seed_everything, set_logger


def run_experiment(config_dir, experiment_id, version="tpu", gpu=-1,
                   platform="auto", mesh=None):
    """``mesh`` generalizes the reference's ``--gpu`` device pick to a
    topology spec — "4x2" (data x model), an int (pure DP), or a config
    ``mesh:`` key / RAT_TPU_MESH env var (see parallel.resolve_mesh).
    Default: single device."""
    if platform == "auto":
        # autotuner slots pin a platform per subprocess via this env var
        # (an in-process jax.config update: site hooks may override the
        # JAX_PLATFORMS env var itself)
        platform = os.environ.get("RAT_TPU_PLATFORM", "auto")
    if platform != "auto":
        import jax
        jax.config.update("jax_platforms", platform)
    params = load_config(config_dir, experiment_id)
    params["gpu"] = gpu
    params["version"] = version
    set_logger(params)
    logging.info(print_to_json(params))
    seed_everything(seed=params["seed"])

    dataset = params["dataset_id"].split("_")[0].lower()
    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    if params.get("data_format") == "h5":
        feature_map = FeatureMap(params["dataset_id"], data_dir, params["version"])
        json_file = os.path.join(data_dir, "feature_map.json")
        if os.path.exists(json_file):
            feature_map.load(json_file)
        else:
            raise RuntimeError("feature_map not exist!")
    else:
        if hasattr(dataset_encoders, dataset):
            feature_encoder = getattr(dataset_encoders, dataset).FeatureEncoder(**params)
        else:
            feature_encoder = FeatureEncoder(**params)
        if os.path.exists(feature_encoder.json_file):
            feature_encoder.feature_map.load(feature_encoder.json_file)
        else:
            build_dataset(feature_encoder, **params)
        params["train_data"] = os.path.join(data_dir, "train*.h5")
        params["valid_data"] = os.path.join(data_dir, "valid*.h5")
        params["test_data"] = os.path.join(data_dir, "test*.h5")
        if "retrieval_configs" in params and \
                re.match(r"\d+-fold", params["retrieval_configs"]["split_type"]) is None:
            params["retrieval_configs"]["retrieval_pool_data"] = \
                os.path.join(data_dir, "retrieval_pool.h5")
        feature_map = feature_encoder.feature_map

    from ..parallel import resolve_mesh
    device_mesh = resolve_mesh(params, cli_spec=mesh)
    if device_mesh is not None:
        logging.info("Device mesh: {}".format(dict(device_mesh.shape)))
        if "retrieval_configs" in params:
            # large-pool BM25 precompute shards the pool scan over the
            # mesh (data/loader.py::_retrieve picks the engine by size)
            params["retrieval_configs"]["mesh"] = device_mesh

    train_gen, valid_gen = h5_generator(feature_map, stage="train", **params)
    test_gen = h5_generator(feature_map, stage="test", **params)

    model = Trainer(feature_map, params, mesh=device_mesh)
    k = train_gen.topk
    input_length = feature_map.input_length or feature_map.num_fields
    model.init_state(np.zeros((2, 1 + k, input_length), np.int32),
                     np.zeros((2, 1 + k), np.float32))
    model.count_parameters()
    model.fit(train_gen, validation_data=valid_gen, **params)

    logging.info("Load best model: {}".format(model.checkpoint))
    model.load_weights(model.checkpoint)

    logging.info("****** Validation evaluation ******")
    valid_result = model.evaluate(valid_gen)
    del train_gen
    gc.collect()

    logging.info("******** Test evaluation ********")
    test_result = {}
    if test_gen:
        test_result = model.evaluate(test_gen)

    result_file = os.path.join(params["model_root"], params["dataset_id"],
                               params["model_id"] + ".csv")
    os.makedirs(os.path.dirname(result_file), exist_ok=True)
    with open(result_file, "a+") as fw:
        fw.write(" {},[command] python {},[exp_id] {},[dataset_id] {},[train] {},[val] {},[test] {}\n"
                 .format(datetime.datetime.now().strftime("%Y%m%d-%H%M%S"),
                         " ".join(sys.argv), experiment_id, params["dataset_id"],
                         "N.A.", print_to_list(valid_result),
                         print_to_list(test_result)))
    return valid_result, test_result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--version", type=str, default="tpu",
                        help="The model version.")
    parser.add_argument("--config", type=str, default="./configs/",
                        help="The config directory.")
    parser.add_argument("--expid", type=str, default="RAT_m2_test",
                        help="The experiment id to run.")
    parser.add_argument("--gpu", type=int, default=-1,
                        help="Kept for CLI compatibility; backend is chosen by JAX.")
    parser.add_argument("--platform", type=str, default="auto",
                        choices=["auto", "cpu", "tpu"],
                        help="Force the JAX platform (overrides env hooks).")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Device mesh topology 'DATAxMODEL' (e.g. 4x2) "
                             "or an int for pure data parallelism. Defaults "
                             "to the config 'mesh' key / RAT_TPU_MESH env, "
                             "else single device.")
    args = vars(parser.parse_args())
    run_experiment(args["config"], args["expid"], args["version"], args["gpu"],
                   args["platform"], args["mesh"])


if __name__ == "__main__":
    main()
