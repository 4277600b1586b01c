"""Grid-search autotuner (reference: fuxictr/autotuner.py:70-187).

``enumerate_params`` expands a ``tuner_space`` YAML into hashed expids
with generated dataset/model config files; ``grid_search`` schedules one
``run_expid`` subprocess per execution slot. The reference schedules
over a GPU list; here a slot is an accelerator *instance* spec — for a
single TPU host the slot list is typically ``[0]`` (one process owns
the chip), and for CPU sweeps it can be any width.
"""

import glob
import hashlib
import itertools
import os
import subprocess
import time

import numpy as np
import yaml

from .utils.config import print_to_json


def load_model_config(config_dir, experiment_id):
    params = dict()
    model_configs = glob.glob(os.path.join(config_dir, "model_config.yaml"))
    if not model_configs:
        model_configs = glob.glob(os.path.join(config_dir, "model_config/*.yaml"))
    found_keys = []
    for config in model_configs:
        with open(config, "r") as cfg:
            config_dict = yaml.load(cfg, Loader=yaml.FullLoader)
            if "Base" in config_dict:
                params.update(config_dict["Base"])
                found_keys.append("Base")
            if experiment_id in config_dict:
                params.update(config_dict[experiment_id])
                found_keys.append(experiment_id)
        if len(found_keys) == 2:
            break
    if "dataset_id" not in params:
        raise RuntimeError("experiment_id={} is not valid in config.".format(experiment_id))
    params["model_id"] = experiment_id
    return params


def load_dataset_config(config_dir, dataset_id):
    params = dict()
    dataset_configs = glob.glob(os.path.join(config_dir, "dataset_config.yaml"))
    if not dataset_configs:
        dataset_configs = glob.glob(os.path.join(config_dir, "dataset_config/*.yaml"))
    for config in dataset_configs:
        with open(config, "r") as cfg:
            config_dict = yaml.load(cfg, Loader=yaml.FullLoader)
            if dataset_id in config_dict:
                params.update(config_dict[dataset_id])
                break
    return params


def enumerate_params(config_file, exclude_expid=[]):
    """Expand tuner_space into per-combination config files; returns the
    generated config directory."""
    with open(config_file, "r") as cfg:
        config_dict = yaml.load(cfg, Loader=yaml.FullLoader)
    tune_dict = config_dict["tuner_space"]
    for k, v in tune_dict.items():
        if not isinstance(v, list):
            tune_dict[k] = [v]
    experiment_id = config_dict["base_expid"]
    if "model_config" in config_dict:
        model_dict = dict()
        if "Base" in config_dict["model_config"]:
            model_dict.update(config_dict["model_config"]["Base"])
        model_dict.update(config_dict["model_config"][experiment_id])
    else:
        base_config_dir = config_dict.get("base_config",
                                          os.path.dirname(config_file))
        model_dict = load_model_config(base_config_dir, experiment_id)

    dataset_id = config_dict.get("dataset_id", model_dict["dataset_id"])
    if "dataset_config" in config_dict:
        dataset_dict = config_dict["dataset_config"][dataset_id]
    else:
        dataset_dict = load_dataset_config(base_config_dir, dataset_id)

    if model_dict["dataset_id"] == "TBD":
        model_dict["dataset_id"] = dataset_id
        experiment_id = model_dict["model"] + "_" + dataset_id

    tuner_keys = set(tune_dict.keys())
    base_keys = set(model_dict.keys()).union(set(dataset_dict.keys()))
    if len(tuner_keys - base_keys) > 0:
        raise RuntimeError("Invalid params in tuner config: {}"
                           .format(tuner_keys - base_keys))

    config_dir = config_file.replace(".yaml", "")
    if not os.path.exists(config_dir):
        os.makedirs(config_dir)

    # dataset-parameter combinations
    dataset_dict = {k: tune_dict[k] if k in tune_dict else [v]
                    for k, v in dataset_dict.items()}
    dataset_para_keys = list(dataset_dict.keys())
    dataset_para_combs = dict()
    for values in itertools.product(*map(dataset_dict.get, dataset_para_keys)):
        dataset_params = dict(zip(dataset_para_keys, values))
        if dataset_params.get("data_format") == "h5":
            dataset_para_combs[dataset_id] = dataset_params
        else:
            hash_id = hashlib.md5(
                print_to_json(dataset_params).encode("utf-8")).hexdigest()[0:8]
            dataset_para_combs[dataset_id + "_{}".format(hash_id)] = dataset_params

    with open(os.path.join(config_dir, "dataset_config.yaml"), "w") as fw:
        yaml.dump(dataset_para_combs, fw, default_flow_style=None, indent=4)

    # model-parameter combinations
    model_dict = {k: tune_dict[k] if k in tune_dict else [v]
                  for k, v in model_dict.items()}
    model_para_keys = list(model_dict.keys())
    model_param_combs = dict()
    for idx, values in enumerate(itertools.product(*map(model_dict.get,
                                                        model_para_keys))):
        model_param_combs[idx + 1] = dict(zip(model_para_keys, values))

    merged_param_combs = dict()
    for idx, item in enumerate(itertools.product(model_param_combs.values(),
                                                 dataset_para_combs.keys())):
        para_dict = item[0]
        para_dict["dataset_id"] = item[1]
        random_number = ""
        if para_dict.get("debug"):
            random_number = str(np.random.randint(1e8))
        hash_id = hashlib.md5((print_to_json(para_dict) + random_number)
                              .encode("utf-8")).hexdigest()[0:8]
        hash_expid = experiment_id + "_{:03d}_{}".format(idx + 1, hash_id)
        if hash_expid not in exclude_expid:
            merged_param_combs[hash_expid] = para_dict.copy()

    with open(os.path.join(config_dir, "model_config.yaml"), "w") as fw:
        yaml.dump(merged_param_combs, fw, default_flow_style=None, indent=4)
    print("Enumerate all tuner configurations done.")
    return config_dir


def load_experiment_ids(config_dir):
    model_configs = glob.glob(os.path.join(config_dir, "model_config.yaml"))
    if not model_configs:
        model_configs = glob.glob(os.path.join(config_dir, "model_config/*.yaml"))
    experiment_id_list = []
    for config in model_configs:
        with open(config, "r") as cfg:
            config_dict = yaml.load(cfg, Loader=yaml.FullLoader)
            experiment_id_list += config_dict.keys()
    return sorted(experiment_id_list)


def _slot_env(slot):
    """Environment overrides for one execution slot.

    A slot is either a plain value (exported as RAT_TPU_SLOT, mirroring
    the reference's GPU-index list) or a dict of environment variables —
    which is how chip sets and mesh topologies are scheduled: e.g.
    ``{"TPU_VISIBLE_DEVICES": "0,1", "RAT_TPU_MESH": "2x1"}`` pins a
    subprocess to two chips, ``{"JAX_PLATFORMS": "cpu"}`` runs a CPU
    sweep lane. The subprocess inherits the parent environment plus the
    overrides.
    """
    env = dict(os.environ)
    if isinstance(slot, dict):
        env.update({str(k): str(v) for k, v in slot.items()})
    else:
        env["RAT_TPU_SLOT"] = str(slot)
    return env


def grid_search(version, config_dir, slot_list, expid_tag=None,
                runner="rat_tpu.cli.run_expid"):
    """Run every enumerated expid, one subprocess per free slot.

    ``slot_list`` generalizes the reference's GPU list
    (autotuner.py:164-187) to accelerator-instance specs — see
    ``_slot_env``. Slot width = scheduling parallelism.
    """
    experiment_id_list = load_experiment_ids(config_dir)
    if expid_tag is not None:
        experiment_id_list = [expid for expid in experiment_id_list
                              if str(expid_tag) in expid]
        assert len(experiment_id_list) > 0, \
            "tag={} does not match any expid!".format(expid_tag)
    slot_list = list(slot_list)
    idle_queue = list(range(len(slot_list)))
    processes = dict()
    while len(experiment_id_list) > 0:
        if len(idle_queue) > 0:
            idle_idx = idle_queue.pop(0)
            expid = experiment_id_list.pop(0)
            cmd = ("python -u -m {} --version {} --config {} --expid {}"
                   .format(runner, version, config_dir, expid))
            p = subprocess.Popen(cmd.split(),
                                 env=_slot_env(slot_list[idle_idx]))
            processes[idle_idx] = p
        else:
            time.sleep(5)
            for idle_idx, p in list(processes.items()):
                if p.poll() is not None:
                    idle_queue.append(idle_idx)
    [p.wait() for p in processes.values()]
