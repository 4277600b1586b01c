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


def test_parse_mesh_spec():
    from rat_tpu.parallel import parse_mesh_spec, resolve_mesh
    assert parse_mesh_spec("4x2") == (4, 2)
    assert parse_mesh_spec(8) == (8, 1)
    assert parse_mesh_spec("8") == (8, 1)
    assert parse_mesh_spec({"data": 2, "model": 4}) == (2, 4)
    assert parse_mesh_spec(None) is None
    assert parse_mesh_spec("none") is None
    # unset everywhere -> single-device default
    os.environ.pop("RAT_TPU_MESH", None)
    assert resolve_mesh({}) is None
    assert resolve_mesh({"mesh": "1x1"}) is None  # trivial mesh -> None


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    r = _run_in_subprocess(
        "import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "OK" in r.stdout


@pytest.mark.slow
def test_cli_mesh_flow_matches_single_device(tmp_path):
    """VERDICT r1 item 2: the full run_expid flow must be reachable on a
    mesh via the '--mesh' spec and reproduce the single-device AUC (SPMD
    partitioning does not change the math)."""
    code = f"""
import os, sys, yaml, numpy as np
sys.path.insert(0, {REPO!r})
os.chdir({str(tmp_path)!r})
from rat_tpu.data.synthetic import make_mltag_like
make_mltag_like('./data/e2e', n_train=2000, n_valid=500, n_test=500,
                n_users=60, n_items=40, n_tags=15, seed=3)
os.makedirs('configs', exist_ok=True)
model_cfg = {{'RAT_m2_e2e': {{
    'dataset_id': 'e2e_10fold_retrieval', 'model': 'RAT_m2',
    'model_id': 'RAT_m2_e2e', 'model_root': './exps/', 'batch_size': 512,
    'embedding_dim': 8, 'dnn_hidden_units': [16, 16],
    'dnn_activations': 'relu', 'embedding_regularizer': 0.01,
    'net_regularizer': 0, 'net_dropout': 0, 'batch_norm': False,
    'learning_rate': 2e-3, 'epochs': 2, 'num_heads': 2, 'depth': 1,
    'dim_head': 8, 'dropout': 0.0, 'emb_dropout': 0.0, 'scale_dim': 2,
    'use_wide': True, 'retrieval_augmented': True,
    'metrics': ['AUC', 'logloss'], 'monitor': 'AUC',
    'monitor_mode': 'max', 'patience': 3, 'every_x_epochs': 1,
    'seed': 7, 'shuffle': False, 'verbose': 0,
    'loss': 'binary_crossentropy', 'optimizer': 'adam',
    'task': 'binary_classification', 'save_best_only': True}}}}
dataset_cfg = {{'e2e_10fold_retrieval': {{
    'data_format': 'csv', 'data_root': './data/',
    'feature_cols': [
        {{'active': True, 'dtype': 'float', 'name': ['user_id', 'item_id', 'tag_id'],
          'type': 'categorical'}}],
    'label_col': {{'dtype': 'float', 'name': 'label'}},
    'min_categr_count': 1,
    'train_data': './data/e2e/train.csv',
    'valid_data': './data/e2e/valid.csv',
    'test_data': './data/e2e/test.csv',
    'retrieval_configs': {{'split_type': '4-fold', 'pre_retrieval': True,
                           'used_cols': ['user_id', 'item_id', 'tag_id'],
                           'exact_match_cols': [], 'label_wise': False,
                           'pool_ratio': 0.2, 'enable_clean': False,
                           'topK': 3, 'qry_batch_size': 2000,
                           'db_chunk_size': 5000}}}}}}
yaml.dump(model_cfg, open('configs/model_config.yaml', 'w'))
yaml.dump(dataset_cfg, open('configs/dataset_config.yaml', 'w'))
from rat_tpu.cli.run_expid import run_experiment
v1, t1 = run_experiment('./configs', 'RAT_m2_e2e')
v2, t2 = run_experiment('./configs', 'RAT_m2_e2e', mesh='4x2')
print('single', v1, t1)
print('mesh  ', v2, t2)
assert abs(v1['AUC'] - v2['AUC']) < 1e-3, (v1, v2)
assert abs(t1['logloss'] - t2['logloss']) < 1e-3, (t1, t2)
print('MATCH')
"""
    r = _run_in_subprocess(code, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout


@pytest.mark.slow
def test_xfold_driver_sharded_scan_identical_caches(tmp_path):
    """VERDICT r1 item 5: the X-fold retrieval precompute routed through
    the mesh-sharded pool scan must produce caches identical to the
    single-device engine (reference driver semantics,
    data_generator.py:115-212)."""
    code = f"""
import os, sys
import numpy as np
sys.path.insert(0, {REPO!r})
import h5py
from rat_tpu.data.io import save_hdf5
from rat_tpu.data.loader import DataGenerator
from rat_tpu.parallel import make_mesh

rng = np.random.RandomState(5)
N, F = 600, 4
darray = np.concatenate([rng.randint(0, 12, (N, F)),
                         rng.randint(0, 2, (N, 1))], axis=1).astype(np.float64)
base = {str(tmp_path)!r}
rc = dict(split_type='4-fold', used_col_indices=[0, 1, 2], topK=5,
          qry_batch_size=64, db_chunk_size=100, pre_retrieval=True)
results = {{}}
for tag, extra in (('single', {{}}),
                   # resume_slice_rows forces the checkpointed slice
                   # driver (3 slices/fold) through the sharded engine,
                   # covering its idf_tables pass-through
                   ('sharded', {{'mesh': make_mesh(8, 1),
                                 'sharded_pool_min_rows': 1,
                                 'resume_slice_rows': 50}})):
    d = os.path.join(base, tag)
    os.makedirs(d)
    path = os.path.join(d, 'train.h5')
    save_hdf5(darray, path)
    gen = DataGenerator(path, batch_size=64,
                        retrieval_configs=dict(rc, **extra),
                        retrieval_pool_fname='self',
                        retrieval_augmented=True)
    cache = os.path.join(d, 'retrieval_5_train.h5')
    assert os.path.exists(cache)
    with h5py.File(cache, 'r') as hf:
        results[tag] = {{k: hf[k][()] for k in ('indices', 'values', 'lens')}}
for k in ('indices', 'values', 'lens'):
    np.testing.assert_array_equal(results['single'][k], results['sharded'][k])
print('IDENTICAL')
"""
    r = _run_in_subprocess(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "IDENTICAL" in r.stdout


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
def test_sharded_bm25_generation1_matches_single_device():
    """generation=1 (Robertson IDF, negative scores) must survive the
    sharded dispatch — it used to be silently swallowed by **kwargs."""
    code = """
import numpy as np
from rat_tpu.retrieval import bm25_topk_retrieval
from rat_tpu.retrieval.sharded import sharded_bm25_topk_retrieval
from rat_tpu.parallel import make_mesh
rng = np.random.RandomState(3)
# near-constant pool: value 0 covers ~90% of every column, so its
# Robertson IDF is negative and all-zero queries' TOP-K scores are
# negative (kept as valid neighbors, reference v1 semantics)
db = (rng.rand(500, 4) > 0.9).astype(np.int64)
q = (rng.rand(40, 4) > 0.9).astype(np.int64)
mesh = make_mesh(n_devices=8, model_axis_size=1)
r1 = bm25_topk_retrieval(db, q, db_chunk_size=64, topK=5, generation=1)
r2 = sharded_bm25_topk_retrieval(db, q, mesh, db_chunk_size=16, topK=5,
                                 generation=1)
assert (r1.values < 0).any(), 'test data must exercise negative scores'
np.testing.assert_allclose(r1.values, r2.values, rtol=1e-5)
np.testing.assert_array_equal(r1.lens, r2.lens)
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


@pytest.mark.slow
def test_sharded_bm25_exact_match_matches_single_device():
    """The sharded exact-match path must reproduce the single-device
    engine EXACTLY (values, indices, lens) in BOTH reference branches:
    the scored branch (a batch with a large matched group -> (bm25+1)
    scores, score order) and the batch-level FLAT branch
    (data_utils.py:906-918: largest group in the batch fits topK ->
    values 1.0 in group order). Low-cardinality exm columns exercise
    the scored branch; a high-cardinality column makes every group
    small and forces the flat branch."""
    code = """
import numpy as np
from rat_tpu.retrieval import bm25_topk_retrieval
from rat_tpu.retrieval.sharded import sharded_bm25_topk_retrieval
from rat_tpu.parallel import make_mesh
rng = np.random.RandomState(5)
mesh = make_mesh(n_devices=8, model_axis_size=1)
cases = [
    ("scored", rng.randint(0, 4, (400, 5)), [0, 4]),       # groups ~25 >> K
    ("flat", np.concatenate([rng.randint(0, 300, (400, 1)),  # groups ~1-2
                             rng.randint(0, 4, (400, 4))], axis=1), [0]),
    ("mixed", np.concatenate([rng.randint(0, 40, (400, 1)),  # groups ~10
                              rng.randint(0, 4, (400, 4))], axis=1), [0]),
    ("exm_only", rng.randint(0, 3, (400, 2)), [0, 1]),  # truncated flat
]
for name, db, exm in cases:
    q = db[rng.randint(0, 400, 48)]  # matched queries in every branch
    r1 = bm25_topk_retrieval(db, q, exact_match_col_indices=exm,
                             qry_batch_size=16, db_chunk_size=64, topK=5)
    r2 = sharded_bm25_topk_retrieval(db, q, mesh,
                                     exact_match_col_indices=exm,
                                     qry_batch_size=16, db_chunk_size=16,
                                     topK=5)
    np.testing.assert_array_equal(r1.values, r2.values, err_msg=name)
    np.testing.assert_array_equal(r1.indices, r2.indices, err_msg=name)
    np.testing.assert_array_equal(r1.lens, r2.lens, err_msg=name)
    for i in range(len(q)):
        for idx in r2.indices[i]:
            if idx >= 0:
                assert (db[idx, exm] == q[i, exm]).all(), (name, i, idx)
print('MATCH')
"""
    r = _run_in_subprocess(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout


@pytest.mark.slow
def test_mesh_full_state_resume_matches_uninterrupted(tmp_path):
    """VERDICT r3 item 4: orbax full-state restore must be
    sharding-aware. Train 2 epochs on the 8-device (4x2) mesh, save,
    restore into a FRESH Trainer, continue 2 more — every restored leaf
    keeps its mesh layout (row-sharded tables stay P('model', None))
    and the final state matches an uninterrupted 4-epoch run."""
    code = f"""
import os, numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as g
from rat_tpu.engine import Trainer
from rat_tpu.parallel import make_mesh

fm = g._tiny_feature_map()
K, F, N, B = 3, 3, 256, 64

class Gen:
    def __init__(self, seed):
        r = np.random.RandomState(seed)
        X = r.randint(1, 32, (N, F))
        y = (X[:, 0] >= 16).astype(np.float64)
        self.darray = np.concatenate([X, y[:, None]], 1).astype(np.float64)
        self.pool_darray = self.darray
        self.retr_indices = r.randint(0, N, (N, K)).astype(np.int64)
        self.retr_lens = np.full(N, K)
        self.retrieval_augmented = True
        self.batch_size = B
        self.num_samples = N
        self.num_batches = N // B
        self.topk = K
    def neighbor_gather_indices(self):
        return self.retr_indices.astype(np.int32)
    def epoch_index_batches(self, rng=None):
        for s in range(0, N, B):
            yield np.arange(s, s + B, dtype=np.int32), B
    def __len__(self):
        return self.num_batches

params = dict(g._model_params(), reduce_lr_on_plateau=False,
              patience=100, model_root={str(tmp_path)!r})
mesh = make_mesh(n_devices=8, model_axis_size=2)

def run(n_epochs, restore_from=None):
    tr = Trainer(fm, params, mesh=mesh)
    if restore_from is not None:
        tr.init_state(np.zeros((2, 1 + K, F), np.int32),
                      np.zeros((2, 1 + K), np.float32))
        tr.restore_train_state(restore_from)
    tr.fit(Gen(0), validation_data=Gen(1), epochs=n_epochs)
    return tr

trA = run(4)                                  # uninterrupted
trB = run(2)                                  # first half
ck = os.path.join({str(tmp_path)!r}, 'full_ck')
trB.save_train_state(ck)
trC = Trainer(fm, params, mesh=mesh)          # fresh restore target
trC.init_state(np.zeros((2, 1 + K, F), np.int32),
               np.zeros((2, 1 + K), np.float32))
trC.restore_train_state(ck)

# every leaf restored into the template's sharding, bit-identical
lb = jax.tree_util.tree_leaves(trB.state)
lc = jax.tree_util.tree_leaves(trC.state)
assert len(lb) == len(lc)
n_model_sharded = 0
for a, c in zip(lb, lc):
    assert str(a.sharding.spec) == str(c.sharding.spec), (a.sharding, c.sharding)
    n_model_sharded += 'model' in str(c.sharding.spec)
    np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                  np.asarray(jax.device_get(c)))
assert n_model_sharded >= 1, 'no row-sharded leaf exercised the fix'

# ...and the restored state drives the compiled SPMD steps onward to
# the exact same place as the uninterrupted run
trC.fit(Gen(0), validation_data=Gen(1), epochs=2)
assert int(trC.state.step) == int(trA.state.step)
for a, c in zip(jax.tree_util.tree_leaves(trA.state),
                jax.tree_util.tree_leaves(trC.state)):
    np.testing.assert_allclose(np.asarray(jax.device_get(a), np.float64),
                               np.asarray(jax.device_get(c), np.float64),
                               rtol=1e-6, atol=1e-8)
print('MATCH')
"""
    r = _run_in_subprocess(code, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout


@pytest.mark.slow
def test_dedup_neighbor_lookup_matches_direct_gather():
    """dedup_neighbors=True (unique-ids + inverse-gather inside the
    step, SURVEY §7.3's all-to-all traffic lever) must produce the
    identical loss on the 8-device mesh AND single-device (VERDICT r2
    item 7; the perf A/B waits for real multi-chip hardware)."""
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
# heavy duplication on purpose: neighbors drawn from only 8 pool rows
gen.retr_indices = rng.randint(0, 8, (N, K)).astype(np.int64)
gen.retr_lens = np.full(N, K); gen.retrieval_augmented = True
gen.neighbor_gather_indices = lambda: gen.retr_indices.astype(np.int32)

losses = {}
for mesh in [None, make_mesh(n_devices=8, model_axis_size=2)]:
    for dedup in (False, True):
        params = dict(g._model_params(), dedup_neighbors=dedup)
        tr = Trainer(fm, params, mesh=mesh)
        tr.init_state(np.zeros((B, 1+K, F), np.int32),
                      np.zeros((B, 1+K), np.float32))
        tr._build_steps()
        data = tr.device_split(gen)
        idx = jnp.asarray(np.arange(B, dtype=np.int32))
        _, loss = tr._jit_train_step(tr.state, data, idx, jnp.float32(B),
                                     jax.random.PRNGKey(1))
        losses[('mesh' if mesh is not None else 'single', dedup)] = float(loss)
print(losses)
assert losses[('single', False)] == losses[('single', True)], losses
assert losses[('mesh', False)] == losses[('mesh', True)], losses
print('MATCH')
"""
    r = _run_in_subprocess(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MATCH" in r.stdout
