"""Multi-host (multi-process) exercise without a cluster (VERDICT r1
item 4, SURVEY §2.8 comm-backend row): two localhost processes joined by
jax.distributed.initialize, each owning 4 virtual CPU devices, run the
REAL Trainer fit loop over an 8-device global (4 data x 2 model) mesh —
per-host input feeding via process_local_rows +
host_local_batch_to_global, SPMD init, sharded steps, replicated eval,
rank-0 checkpointing — and must reproduce the single-process loss/AUC.
"""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys, json
import numpy as np
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')

from rat_tpu.parallel.distributed import initialize_distributed
n_procs, rank = initialize_distributed(
    coordinator_address={coord!r},
    num_processes={nproc},
    process_id=int(os.environ['PARITY_RANK']))
assert n_procs == {nproc}, n_procs
assert len(jax.devices()) == 8, jax.devices()

import __graft_entry__ as g
from rat_tpu.engine import Trainer
from rat_tpu.parallel import make_mesh

fm = g._tiny_feature_map()
rng = np.random.RandomState(0)
B, K, F, N = 16, 3, 3, 64
darray = np.concatenate([rng.randint(0, 32, (N, F)),
                         rng.randint(0, 2, (N, 1))], axis=1).astype(np.float64)

class G: pass
gen = G()
gen.darray = darray; gen.pool_darray = darray
gen.retr_indices = rng.randint(0, N, (N, K)).astype(np.int64)
gen.retr_lens = np.full(N, K); gen.retrieval_augmented = True
gen.neighbor_gather_indices = lambda: gen.retr_indices.astype(np.int32)
gen.num_samples = N
gen.num_batches = N // B
gen.topk = K
gen.shuffle = False
def epoch_index_batches(rng=None):
    for s in range(0, N, B):
        yield np.arange(s, s + B, dtype=np.int32), B
gen.epoch_index_batches = epoch_index_batches
def glen(self=None): return gen.num_batches
gen.__class__.__len__ = glen

mesh = make_mesh(n_devices=8, model_axis_size=2)
params = g._model_params(model_root='/tmp/dist_exps_%d/' % {nproc},
                         patience=100, train_scan_batches={tsb})
tr = Trainer(fm, params, mesh=mesh)
if {tsb}:
    # grouped arm: also exercise the multi-process EVAL scan grouping
    # (4 batches >= 2*group activates the scanned dispatch path)
    tr._EVAL_SCAN_BATCHES = 2
tr.fit(gen, validation_data=gen, epochs=2)
metrics = tr.evaluate(gen)
# exercise the checkpoint round-trip (rank 0 writes, all ranks load)
import jax.experimental.multihost_utils as mhu
mhu.sync_global_devices('ckpt-written')
tr.load_weights(tr.checkpoint)
metrics2 = tr.evaluate(gen)
print('RESULT', json.dumps({{'rank': rank,
                             'auc': metrics['AUC'],
                             'logloss': metrics['logloss'],
                             'auc_reload': metrics2['AUC']}}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc, coord, tsb=0):
    procs = []
    for rank in range(nproc):
        env = dict(os.environ, PARITY_RANK=str(rank),
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        code = _WORKER.format(repo=REPO, coord=coord, nproc=nproc, tsb=tsb)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    return procs


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    """Two localhost processes over a 4x2 mesh must reproduce the
    single-process loss trajectory — and the 2-process run dispatches
    its train steps as scanned GROUPS (train_scan_batches=2, the r5
    multi-process grouped path) while the baseline runs per-step, so
    the equality also certifies grouped == per-step under
    multi-process (VERDICT r4 item 5)."""
    import json

    # single-process PER-STEP baseline on an 8-virtual-device mesh
    env = dict(os.environ, PARITY_RANK="0", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    code = _WORKER.format(repo=REPO, coord=None, nproc=1, tsb=0)
    base = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert base.returncode == 0, base.stderr[-3000:]
    base_res = json.loads(
        [l for l in base.stdout.splitlines() if l.startswith("RESULT")][0]
        .split("RESULT ")[1])

    coord = "127.0.0.1:%d" % _free_port()
    procs = _launch(2, coord, tsb=2)
    results = {}
    deadline = time.time() + 900
    for p in procs:
        out, err = p.communicate(timeout=max(10, deadline - time.time()))
        assert p.returncode == 0, err[-3000:]
        res = json.loads(
            [l for l in out.splitlines() if l.startswith("RESULT")][0]
            .split("RESULT ")[1])
        results[res["rank"]] = res

    assert set(results) == {0, 1}
    # both ranks compute identical metrics (replicated eval outputs)
    assert results[0]["auc"] == pytest.approx(results[1]["auc"], abs=1e-9)
    # and the 2-process run reproduces the single-process math
    assert results[0]["auc"] == pytest.approx(base_res["auc"], abs=1e-5)
    assert results[0]["logloss"] == pytest.approx(base_res["logloss"],
                                                  abs=1e-5)
    # checkpoint round-trip preserved the weights on every rank
    for r in results.values():
        assert r["auc_reload"] == pytest.approx(r["auc"], abs=1e-9)
