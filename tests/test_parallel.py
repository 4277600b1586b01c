"""Mesh-parallel tests: run the full sharded train step on an
8-virtual-device CPU mesh in a subprocess (the device-count XLA flag
must be set before jax initializes)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_subprocess(code, n_devices=8, timeout=600):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}")
    # force CPU through jax.config too: tunnel environments override
    # JAX_PLATFORMS via a sitecustomize hook
    prelude = "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    return subprocess.run([sys.executable, "-c", prelude + code], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    r = _run_in_subprocess(
        "import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "OK" in r.stdout


@pytest.mark.slow
def test_sharded_bm25_matches_single_device():
    """The pool-sharded scan must reproduce the single-device engine."""
    code = """
import numpy as np
from rat_tpu.retrieval import bm25_topk_retrieval
from rat_tpu.retrieval.sharded import sharded_bm25_topk_retrieval
from rat_tpu.parallel import make_mesh
rng = np.random.RandomState(0)
db = rng.randint(0, 6, (500, 4))
q = rng.randint(0, 6, (40, 4))
mesh = make_mesh(n_devices=8, model_axis_size=1)
r1 = bm25_topk_retrieval(db, q, db_chunk_size=64, topK=5)
r2 = sharded_bm25_topk_retrieval(db, q, mesh, db_chunk_size=16, topK=5)
np.testing.assert_allclose(r1.values, r2.values, rtol=1e-5)
np.testing.assert_array_equal(r1.lens, r2.lens)
# indices may tie-swap only within equal scores
for i in range(len(q)):
    same = r1.indices[i] == r2.indices[i]
    assert same.all() or np.allclose(np.sort(r1.values[i]), np.sort(r2.values[i]))
print('MATCH')
"""
    r = _run_in_subprocess(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """The 4-device DP x 2-way row-sharded step must produce the same
    loss as the unsharded step (SPMD is a partitioning, not a math
    change)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
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

losses = {}
for mesh in [None, make_mesh(n_devices=8, model_axis_size=2)]:
    tr = Trainer(fm, g._model_params(), mesh=mesh)
    tr.init_state(np.zeros((B, 1+K, F), np.int32), np.zeros((B, 1+K), np.float32))
    tr._build_steps()
    data = tr.device_split(gen)
    idx = jnp.asarray(np.arange(B, dtype=np.int32))
    _, loss = tr._jit_train_step(tr.state, data, idx, jnp.float32(B),
                                 jax.random.PRNGKey(1))
    losses['sharded' if mesh is not None else 'single'] = float(loss)
print(losses)
assert abs(losses['single'] - losses['sharded']) < 1e-5, losses
print('MATCH')
"""
    r = _run_in_subprocess(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout
