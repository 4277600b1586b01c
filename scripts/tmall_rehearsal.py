"""Full Tmall-scale single-chip rehearsal (VERDICT r2 item 3).

Every stage of the composed pipeline at SURVEY §6 scale, wall-clock per
stage: synthetic 20M/21M/20M-row CSVs -> feature build (encoder fit on
train+pool, 3 h5 artifacts) -> BM25 retrieval precompute for the train
(20M queries) and valid (21.2M queries) splits against the 20M-row pool
-> one training epoch (incl. the epoch-end 21.2M-row validation) -> a
standalone 21.2M-row evaluation. Config = the shipped
RAT_m2_tmall_x1_002_retrieval expid (mirrors the reference's
tmall_x1_002_retrieval: explicit pool file, sequential split).

Usage (from the repo root, chip attached):
    python scripts/tmall_rehearsal.py              # full scale, hours
    python scripts/tmall_rehearsal.py --scale 0.1  # 1/10 smoke, minutes

Prints one JSON line with per-stage seconds; the reference's composed
total for this dataset is ~25.4 h on one GPU (BASELINE.md).
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
    ap.add_argument("--scale", type=float, default=1.0,
                    help="row-count multiplier (1.0 = full Tmall scale)")
    ap.add_argument("--expid", default="RAT_m2_tmall_x1_002_retrieval")
    ap.add_argument("--config", default="./configs/RAT_m2/tmall_x1_002")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from rat_tpu.data import build_dataset
    from rat_tpu.data.loader import DataGenerator
    from rat_tpu.data.synthetic import make_tmall_like
    from rat_tpu.engine import Trainer
    from rat_tpu.features import FeatureEncoder
    from rat_tpu.utils import load_config, seed_everything

    s = args.scale
    tag = "" if s == 1.0 else "_s{:g}".format(s)
    data_src = "./data/tmall{}".format(tag)
    stages, t_all = {}, time.time()

    def stage(name, t0):
        stages[name] = round(time.time() - t0, 1)
        logging.info("[stage] %s: %.1fs", name, stages[name])

    params = load_config(args.config, args.expid)
    params["dataset_id"] = params["dataset_id"] + tag
    params["epochs"] = 1
    for key in ("train_data", "valid_data", "test_data"):
        params[key] = os.path.join(data_src, os.path.basename(params[key]))
    params["retrieval_configs"]["retrieval_pool_data"] = os.path.join(
        data_src, "retrieval_pool.csv")
    seed_everything(params["seed"])

    t0 = time.time()
    if not os.path.exists(os.path.join(data_src, "retrieval_pool.csv")):
        make_tmall_like(data_src,
                        n_train=int(20_038_830 * s),
                        n_test=int(21_165_358 * s),
                        n_pool=int(20_000_000 * s), seed=11)
    stage("generate_csv", t0)

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    t0 = time.time()
    feature_encoder = FeatureEncoder(**params)
    if os.path.exists(feature_encoder.json_file):
        feature_encoder.feature_map.load(feature_encoder.json_file)
    else:
        build_dataset(feature_encoder,
                      train_data=params["train_data"],
                      valid_data=params["valid_data"],
                      test_data=None,  # test == valid file; eval once
                      retrieval_configs=params["retrieval_configs"],
                      **{k: v for k, v in params.items()
                         if k not in ("train_data", "valid_data",
                                      "test_data", "retrieval_configs")})
    fm = feature_encoder.feature_map
    stage("build_csv_to_h5", t0)

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
    stage("train_retrieval_20M_queries", t0)

    t0 = time.time()
    valid_gen = DataGenerator(data_path=os.path.join(data_dir, "valid.h5"),
                              batch_size=params["batch_size"], shuffle=False,
                              feature_map=fm, retrieval_configs=rc,
                              retrieval_pool_fname=pool_h5,
                              retrieval_augmented=True)
    stage("valid_retrieval_21M_queries", t0)

    # the 21M-row valid split stays host-side during the train epoch
    # (uploaded per eval): train split + valid split + activations
    # exceeded free HBM on the shared-tenant chip
    params["lazy_valid_upload"] = True
    trainer = Trainer(fm, params)
    os.makedirs(trainer.model_dir, exist_ok=True)
    k = train_gen.topk
    trainer.init_state(np.zeros((2, 1 + k, fm.input_length), np.int32),
                       np.zeros((2, 1 + k), np.float32))
    trainer.count_parameters()

    t0 = time.time()
    trainer.fit(train_gen, validation_data=valid_gen, epochs=1)
    stage("train_epoch_incl_epoch_end_eval", t0)

    t0 = time.time()
    logs = trainer.evaluate(valid_gen, data=trainer._valid_data)
    stage("eval_21M_rows", t0)

    stages["total"] = round(time.time() - t_all, 1)
    stages["scale"] = s
    stages["valid_metrics"] = {k: round(float(v), 6) for k, v in logs.items()}
    print("TMALL_REHEARSAL " + json.dumps(stages))


if __name__ == "__main__":
    main()
