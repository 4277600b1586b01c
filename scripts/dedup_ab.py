"""A/B the `dedup_neighbors` flag (VERDICT r4 weak item 4).

The flag routes the pool-row gather through unique-ids + inverse-gather
(engine/trainer.py::_gather_batch) on the theory that deduplicating the
heavily-repeating neighbor ids cuts all-to-all traffic on sharded
meshes (SURVEY §7.3). This script produces the data to keep or demote
it:

  --hlo   compile the sharded train step on a virtual 8-device CPU mesh
          (4 data x 2 model) with the flag off/on and report the
          compiled program's collective ops (count + output bytes) and
          total HLO op count. If the collective profile is identical,
          the "traffic lever" does not exist at the XLA level — the
          pool arrays are replicated (gathers are local) and the
          embedding all-to-all operates on the already-gathered token
          grid, whose size dedup cannot change (static shapes force the
          unique buffer to full [B*K] capacity).
  --time  step-time A/B on the current backend (run on the chip):
          best-of-3 windows of grouped train dispatches per arm.

Usage: python scripts/dedup_ab.py --hlo | --time
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = ("all-to-all", "all-gather", "all-reduce",
               "collective-permute", "reduce-scatter")


def _shape_bytes(shape_str):
    """bytes of an HLO shape string like 'f32[64,5,3]{2,1,0}'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    width = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
             "bf16": 2, "f16": 2, "s8": 1, "u8": 1, "pred": 1}.get(dtype, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * width


def hlo_audit():
    # the audit needs an 8-virtual-device CPU platform; both knobs must
    # be set before jax initializes (the script defers all jax imports
    # to function bodies for exactly this reason)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rat_tpu.engine import Trainer
    from rat_tpu.features import FeatureMap
    from rat_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8, model_axis_size=2)
    out = {}
    for dedup in (False, True):
        fm = FeatureMap("dedup_ab", ".")
        fm.feature_specs = {
            "user_id": {"source": "", "type": "categorical",
                        "vocab_size": 61000, "index": 0},
            "item_id": {"source": "", "type": "categorical",
                        "vocab_size": 17000, "index": 1},
            "tag_id": {"source": "", "type": "categorical",
                       "vocab_size": 12000, "index": 2}}
        fm.num_fields, fm.num_features, fm.input_length = 3, 90000, 3
        params = {"model": "RAT_m2", "model_id": "ab",
                  "model_root": "/tmp/ab_exps/", "embedding_dim": 10,
                  "dnn_hidden_units": [64, 64], "dnn_activations": "relu",
                  "num_heads": 2, "dim_head": 10, "depth": 2, "scale_dim": 4,
                  "dropout": 0., "emb_dropout": 0., "net_dropout": 0.,
                  "batch_norm": False, "use_wide": True,
                  "embedding_regularizer": 0.03, "net_regularizer": 0,
                  "learning_rate": 1e-3, "optimizer": "adam", "seed": 2021,
                  "metrics": ["AUC"], "dedup_neighbors": dedup}
        B, K, N = 64, 5, 4096
        rng = np.random.RandomState(0)
        tr = Trainer(fm, params, mesh=mesh)
        tr.init_state(np.zeros((B, 1 + K, 3), np.int32),
                      np.zeros((B, 1 + K), np.float32))
        tr._build_steps()
        tokens = np.stack([rng.randint(0, 61000, N), rng.randint(0, 17000, N),
                           rng.randint(0, 12000, N)], axis=1).astype(np.int32)
        data = {"tokens": jnp.asarray(tokens),
                "labels": jnp.asarray(rng.rand(N).astype(np.float32)),
                "pool_tokens": jnp.asarray(tokens),
                "pool_labels": jnp.asarray(rng.rand(N).astype(np.float32)),
                "nbr": jnp.asarray(rng.randint(0, N, (N, K)).astype(np.int32))}
        idx = jnp.asarray(rng.randint(0, N, B).astype(np.int32))
        import jax.random as jrandom
        lowered = tr._jit_train_step.lower(
            tr.state, data, idx, jnp.float32(B), jrandom.PRNGKey(0))
        text = lowered.compile().as_text()
        ops = {}
        coll_bytes = 0
        coll_re = re.compile(
            r"\s((?:%s)[\w.-]*)\(" % "|".join(COLLECTIVES))
        for line in text.splitlines():
            ls = line.strip()
            if " = " not in ls:
                continue
            m = coll_re.search(ls)
            if not m or m.group(1).endswith("-done"):
                continue  # count start ops once, skip async completions
            for c in COLLECTIVES:
                if m.group(1).startswith(c):
                    ops[c] = ops.get(c, 0) + 1
                    # output may be a tuple; sum every shape between
                    # '= ' and the op name
                    lhs = ls[ls.index(" = ") + 3: m.start(1)]
                    for shape in re.findall(r"\w+\[[\d,]*\]", lhs):
                        coll_bytes += _shape_bytes(shape)
                    break
        out["dedup=%s" % dedup] = {
            "collectives": ops, "collective_out_bytes": coll_bytes,
            "hlo_lines": len(text.splitlines())}
    print(json.dumps(out, indent=2))
    same = (out["dedup=False"]["collectives"] == out["dedup=True"]["collectives"]
            and out["dedup=False"]["collective_out_bytes"]
            == out["dedup=True"]["collective_out_bytes"])
    print("collective profile identical:", same)


def time_ab(steps=256, group=64):
    import jax
    import jax.numpy as jnp
    rates = {}
    for dedup in (False, True):
        from rat_tpu.cli.benchmark import _bench_setup
        if dedup:
            os.environ["RAT_AB_OVERRIDE"] = json.dumps(
                {"dedup_neighbors": True})
        else:
            os.environ.pop("RAT_AB_OVERRIDE", None)
        trainer, data, idx, B = _bench_setup("mltag")
        rng = jax.random.PRNGKey(0)
        idx_group = jnp.stack([idx[i % len(idx)] for i in range(group)])
        valid_group = jnp.full((group,), B, jnp.float32)
        trainer.state, losses = trainer._jit_train_scan(
            trainer.state, data, idx_group, valid_group, rng)
        float(jax.device_get(losses[-1]))
        best = 0.0
        for _ in range(3):
            tic = time.perf_counter()
            for _ in range(steps // group):
                trainer.state, losses = trainer._jit_train_scan(
                    trainer.state, data, idx_group, valid_group, rng)
            float(jax.device_get(losses[-1]))
            best = max(best, steps * B / (time.perf_counter() - tic))
        rates["dedup=%s" % dedup] = round(best, 1)
    os.environ.pop("RAT_AB_OVERRIDE", None)
    print(json.dumps(rates))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()
    if args.hlo:
        hlo_audit()
    if args.time:
        time_ab()
