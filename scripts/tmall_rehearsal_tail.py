"""Tmall rehearsal tail: train epoch + evaluation against a
valid-split SLICE.

Fallback driver for nights when the shared tunnel cannot sustain the
full 21.2M-query validation retrieval (two attempts died to remote
TPU-worker failures mid-scan): slices the first ``--valid-rows`` rows
of the built valid split, computes their retrieval against the full
20M-row pool (the identical program and shapes as the measured
20M-query train stage, so the full-size stage cost is a measured-rate
extrapolation, not a guess), then runs the training epoch on the FULL
20M-row train split and evaluates the slice. Stage wall-clocks print
as one JSON line like scripts/tmall_rehearsal.py.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--valid-rows", type=int, default=2_116_535)
    ap.add_argument("--expid", default="RAT_m2_tmall_x1_002_retrieval")
    ap.add_argument("--config", default="./configs/RAT_m2/tmall_x1_002")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from rat_tpu.data.io import load_hdf5, save_hdf5
    from rat_tpu.data.loader import DataGenerator
    from rat_tpu.engine import Trainer
    from rat_tpu.features import FeatureMap
    from rat_tpu.utils import load_config, seed_everything

    params = load_config(args.config, args.expid)
    params["epochs"] = 1
    seed_everything(params["seed"])
    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    fm = FeatureMap(params["dataset_id"], data_dir, "tpu")
    fm.load(os.path.join(data_dir, "feature_map.json"))

    stages, t_all = {}, time.time()

    def stage(name, t0):
        stages[name] = round(time.time() - t0, 1)
        logging.info("[stage] %s: %.1fs", name, stages[name])

    # slice of the built valid split, as its own h5 + retrieval cache
    slice_h5 = os.path.join(data_dir, "valid_slice.h5")
    if not os.path.exists(slice_h5):
        save_hdf5(load_hdf5(os.path.join(data_dir, "valid.h5"))
                  [:args.valid_rows], slice_h5)

    rc = dict(params["retrieval_configs"])
    rc["used_col_indices"] = [fm.feature_specs[c]["index"]
                              for c in rc["used_cols"]]
    rc["exact_match_col_indices"] = None
    pool_h5 = os.path.join(data_dir, "retrieval_pool.h5")

    t0 = time.time()
    train_gen = DataGenerator(data_path=os.path.join(data_dir, "train.h5"),
                              batch_size=params["batch_size"], shuffle=True,
                              feature_map=fm, retrieval_configs=rc,
                              retrieval_pool_fname=pool_h5,
                              retrieval_augmented=True)
    stage("train_retrieval_cache_load", t0)

    t0 = time.time()
    valid_gen = DataGenerator(data_path=slice_h5,
                              batch_size=params["batch_size"], shuffle=False,
                              feature_map=fm, retrieval_configs=rc,
                              retrieval_pool_fname=pool_h5,
                              retrieval_augmented=True)
    stage("valid_slice_retrieval_{}_queries".format(args.valid_rows), t0)

    trainer = Trainer(fm, params)
    os.makedirs(trainer.model_dir, exist_ok=True)
    k = train_gen.topk
    trainer.init_state(np.zeros((2, 1 + k, fm.input_length), np.int32),
                       np.zeros((2, 1 + k), np.float32))
    trainer.count_parameters()

    t0 = time.time()
    trainer.fit(train_gen, validation_data=valid_gen, epochs=1)
    stage("train_epoch_20M_incl_epoch_end_eval", t0)

    t0 = time.time()
    logs = trainer.evaluate(valid_gen, data=trainer._valid_data)
    stage("eval_{}_rows".format(args.valid_rows), t0)

    stages["total"] = round(time.time() - t_all, 1)
    stages["valid_metrics"] = {k: round(float(v), 6) for k, v in logs.items()}
    print("TMALL_REHEARSAL_TAIL " + json.dumps(stages))


if __name__ == "__main__":
    main()
