"""Block-streaming training, pretrained embeddings, eval cadence."""

import os

import h5py
import numpy as np
import pytest

from rat_tpu.data import save_hdf5
from rat_tpu.data.block_loader import DataBlockGenerator
from rat_tpu.engine import Trainer
from tests.test_loader import RC, _write_split
from tests.test_trainer import FakeGen, _trainer


def test_block_generator_counts_and_views(tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"train_part_{i}.h5")
        _write_split(p, n=40, seed=i)
        paths.append(p)
    gen = DataBlockGenerator(paths, batch_size=16, retrieval_configs=dict(RC),
                             retrieval_pool_fname="self",
                             retrieval_augmented=True)
    assert gen.num_samples == 120
    assert gen.num_blocks == 3
    views = list(gen.iter_block_views())
    assert len(views) == 3
    assert all(v.retrieval_augmented for v in views)
    # retrieval caches per block
    for i in range(3):
        assert os.path.exists(str(tmp_path / f"retrieval_4_train_part_{i}.h5"))


def test_block_mode_training(tiny_feature_map, demo_params, tmp_path):
    paths = []
    rng = np.random.RandomState(0)
    for i in range(2):
        X = rng.randint(1, 8, (128, 3))
        y = (X[:, 0] >= 4).astype(np.float64)
        arr = np.concatenate([X, y[:, None]], axis=1)
        p = str(tmp_path / f"train_part_{i}.h5")
        save_hdf5(arr, p)
        paths.append(p)
    rc = dict(RC, topK=2)
    gen = DataBlockGenerator(paths, batch_size=64, retrieval_configs=rc,
                             retrieval_pool_fname="self",
                             retrieval_augmented=True, shuffle=True)
    valid = FakeGen(n=128, seed=2, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                  embedding_regularizer=0, learning_rate=5e-3)
    tr.fit(gen, validation_data=valid, epochs=6)
    # learns the embedding-readable signal across streamed blocks
    logs = tr.evaluate(valid)
    assert logs["AUC"] > 0.8, logs


def test_pretrained_embedding_frozen(tmp_path, demo_params, rng):
    """pretrained_emb h5 loads into the table and freeze_emb blocks
    gradients (embedding.py:123-136 semantics)."""
    import jax
    import jax.numpy as jnp
    from rat_tpu.features import FeatureMap
    from rat_tpu.nn.embedding import EmbeddingSpec, PackedEmbedding

    pretrain = rng.randn(20, 4).astype(np.float32)
    with h5py.File(str(tmp_path / "pretrained_user.h5"), "w") as hf:
        hf.create_dataset("user", data=pretrain)
    fm = FeatureMap("pre", str(tmp_path))
    fm.feature_specs = {
        "user": {"source": "", "type": "categorical", "vocab_size": 20,
                 "index": 0, "pretrained_emb": "pretrained_user.h5",
                 "freeze_emb": True, "embedding_dim": 4},
        "item": {"source": "", "type": "categorical", "vocab_size": 10,
                 "index": 1},
    }
    fm.num_fields, fm.num_features, fm.input_length = 2, 30, 2
    spec = EmbeddingSpec.build(fm, 4)
    emb = PackedEmbedding(spec, 4, data_dir=str(tmp_path))
    X = jnp.asarray([[3, 2]], dtype=jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), X)
    out = np.asarray(emb.apply(variables, X))
    # pretrained row loaded verbatim
    np.testing.assert_allclose(out[0, 0], pretrain[3], rtol=1e-6)

    # frozen: gradient w.r.t. the pretrained field's rows is zero
    def loss(params):
        return jnp.sum(emb.apply({"params": params}, X) ** 2)
    g = jax.grad(loss)(variables["params"])["table"]
    g = np.asarray(g)
    assert np.all(g[:20] == 0), "pretrained rows must receive no gradient"
    assert np.any(g[20:] != 0), "trainable rows must receive gradients"


def test_eval_cadence_fractional_epochs(tiny_feature_map, demo_params, tmp_path):
    """every_x_epochs=0.5 evaluates twice per epoch
    (base_model.py:144-151,198)."""
    train = FakeGen(n=512, seed=1, batch_size=64)  # 8 batches/epoch
    valid = FakeGen(n=128, seed=2, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path, patience=100,
                  every_x_epochs=0.5)
    calls = []
    orig = tr.evaluate

    def counting_eval(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    tr.evaluate = counting_eval
    tr.fit(train, validation_data=valid, epochs=2)
    # 2 epochs x 8 batches, eval every ceil(0.5*8)=4 batches -> 4 evals
    assert len(calls) == 4, len(calls)


def test_inter_block_retrieval_matches_bruteforce(tmp_path):
    """Inter-block mode == brute-force retrieval against the concatenated
    other blocks with union-pool IDF (indices mapped to the all-blocks
    index space), with neighbor rows materialized."""
    from rat_tpu.retrieval import bm25_topk_retrieval
    from rat_tpu.retrieval.bm25 import _compute_idf_tables

    paths, arrs = [], []
    for i in range(3):
        p = str(tmp_path / f"train_part_{i}.h5")
        arrs.append(_write_split(p, n=40, seed=i))
        paths.append(p)
    rc = dict(RC, inter_block_retrieval=True)
    gen = DataBlockGenerator(paths, batch_size=16, retrieval_configs=rc,
                             retrieval_pool_fname="self",
                             retrieval_augmented=True)
    views = list(gen.iter_block_views())
    digest = gen._block_set_digest()
    for b, view in enumerate(views):
        cache = str(tmp_path / f"retrieval_inter_{digest}_4_train_part_{b}.h5")
        assert os.path.exists(cache)
        with h5py.File(cache, "r") as hf:
            idx = hf["indices"][()]
            vals = hf["values"][()]
            lens = hf["lens"][()]
            rows = hf["neighbor_rows"][()]
        others = [arrs[j] for j in range(3) if j != b]
        pool = np.concatenate(others, axis=0)
        res = bm25_topk_retrieval(
            pool[:, :3].astype(int), arrs[b][:, :3].astype(int),
            topK=4, idf_tables=_compute_idf_tables(pool[:, :3].astype(int)))
        # map other-concat positions to all-blocks positions
        exp_idx = res.indices.copy()
        own_start = b * 40
        shift = exp_idx >= own_start
        exp_idx = np.where(exp_idx < 0, -1,
                           np.where(shift, exp_idx + 40, exp_idx))
        np.testing.assert_allclose(vals, res.values)
        np.testing.assert_array_equal(idx, exp_idx)
        np.testing.assert_array_equal(lens, res.lens)
        # materialized rows equal the pool rows (dropped -> union last row)
        exp_rows = np.where((res.indices < 0)[..., None], pool[-1][None, None],
                            pool[np.where(res.indices < 0, 0, res.indices)])
        np.testing.assert_array_equal(rows, exp_rows)
        # view gathers from the materialized store with identity layout
        assert view.retrieval_augmented
        g = view.neighbor_gather_indices()
        np.testing.assert_array_equal(view.pool_darray[g[5]], rows[5])


def test_inter_block_cache_invalidates_on_block_set_change(tmp_path):
    """ADVICE r1: the inter-block cache depends on ALL blocks (union
    IDF, global indices), so adding a block must change the cache key
    and trigger recomputation — stale caches must never be reused."""
    paths, arrs = [], []
    for i in range(2):
        p = str(tmp_path / f"train_part_{i}.h5")
        arrs.append(_write_split(p, n=40, seed=i))
        paths.append(p)
    rc = dict(RC, inter_block_retrieval=True)
    gen2 = DataBlockGenerator(paths, batch_size=16, retrieval_configs=rc,
                              retrieval_pool_fname="self",
                              retrieval_augmented=True)
    v2 = list(gen2.iter_block_views())
    # add a third block: digest changes, block 0's neighbors recompute
    p3 = str(tmp_path / "train_part_2.h5")
    arrs.append(_write_split(p3, n=40, seed=2))
    gen3 = DataBlockGenerator(paths + [p3], batch_size=16,
                              retrieval_configs=rc,
                              retrieval_pool_fname="self",
                              retrieval_augmented=True)
    assert gen2._block_set_digest() != gen3._block_set_digest()
    v3 = list(gen3.iter_block_views())
    # both cache generations coexist on disk under distinct names
    import glob
    caches = glob.glob(str(tmp_path / "retrieval_inter_*_train_part_0.h5"))
    assert len(caches) == 2
    # and the 3-block neighbors differ from the 2-block ones (the new
    # block's rows are now candidates)
    assert not np.array_equal(v2[0].retr_values, v3[0].retr_values) or \
        not np.array_equal(v2[0].pool_darray, v3[0].pool_darray)


def test_inter_block_training_smoke(tiny_feature_map, demo_params, tmp_path):
    """The trainer consumes materialized-neighbor block views unchanged."""
    paths = []
    rng = np.random.RandomState(0)
    for i in range(2):
        X = rng.randint(1, 8, (128, 3))
        y = (X[:, 0] >= 4).astype(np.float64)
        arr = np.concatenate([X, y[:, None]], axis=1)
        p = str(tmp_path / f"train_part_{i}.h5")
        save_hdf5(arr, p)
        paths.append(p)
    rc = dict(RC, topK=2, inter_block_retrieval=True)
    gen = DataBlockGenerator(paths, batch_size=64, retrieval_configs=rc,
                             retrieval_pool_fname="self",
                             retrieval_augmented=True, shuffle=True)
    valid = FakeGen(n=128, seed=2, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                  embedding_regularizer=0, learning_rate=5e-3)
    tr.fit(gen, validation_data=valid, epochs=6)
    logs = tr.evaluate(valid)
    assert logs["AUC"] > 0.8, logs


def test_inter_block_guard_resolves_effective_idf(tmp_path):
    """generation=1 with an EXPLICIT idf_weighting='lucene' resolves to
    non-negative Lucene scores and must be accepted; bare generation=1
    (implies Robertson) and explicit Robertson must be rejected
    (ADVICE r2: the old guard rejected the valid combination)."""
    def blocks(sub):
        d = tmp_path / sub
        d.mkdir()
        paths = []
        for i in range(2):
            p = str(d / f"train_part_{i}.h5")
            _write_split(p, n=24, seed=i)
            paths.append(p)
        return paths

    ok = dict(RC, inter_block_retrieval=True, generation=1,
              idf_weighting="lucene")
    gen = DataBlockGenerator(blocks("ok"), batch_size=8,
                             retrieval_configs=ok,
                             retrieval_pool_fname="self",
                             retrieval_augmented=True)
    assert list(gen.iter_block_views())  # caches computed without asserts

    # fresh dirs: the retrieval caches key on topK+fname only (reference
    # semantics), so reusing the ok dir would load its cache and never
    # reach the guard
    for sub, bad in (
            ("bad_gen1", dict(RC, inter_block_retrieval=True, generation=1)),
            ("bad_rob", dict(RC, inter_block_retrieval=True,
                             idf_weighting="robertson"))):
        with pytest.raises(AssertionError, match="lucene"):
            g = DataBlockGenerator(blocks(sub), batch_size=8,
                                   retrieval_configs=bad,
                                   retrieval_pool_fname="self",
                                   retrieval_augmented=True)
            list(g.iter_block_views())


def test_block_mode_grouped_dispatch_matches_stepwise(tiny_feature_map,
                                                      demo_params, tmp_path,
                                                      monkeypatch):
    """Grouped train dispatch must flush at BLOCK boundaries (each block
    is a separate device-resident split, so a scan group can never span
    two blocks) and still match the per-step path exactly: 3 blocks x 4
    batches with group=3 exercises scan groups, block-edge remainders,
    and the final partial batch."""
    import jax

    paths = []
    rng = np.random.RandomState(7)
    for i in range(3):
        X = rng.randint(1, 8, (120, 3))
        y = (X[:, 0] >= 4).astype(np.float64)
        arr = np.concatenate([X, y[:, None]], axis=1)
        p = str(tmp_path / f"train_part_{i}.h5")
        save_hdf5(arr, p)
        paths.append(p)
    rc = dict(RC, topK=2)

    def run(group):
        with monkeypatch.context() as m:
            m.setenv("RAT_TPU_TRAIN_SCAN_BATCHES", str(group))
            gen = DataBlockGenerator(paths, batch_size=32,
                                     retrieval_configs=dict(rc),
                                     retrieval_pool_fname="self",
                                     retrieval_augmented=True, shuffle=True)
            valid = FakeGen(n=64, seed=2, shuffle=False)
            tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                          patience=100)
            tr.fit(gen, validation_data=valid, epochs=2)
        return jax.device_get(tr.state.params), int(tr.state.step)

    params_s, step_s = run(0)
    params_g, step_g = run(3)
    assert step_s == step_g
    for a, b in zip(jax.tree_util.tree_leaves(params_s),
                    jax.tree_util.tree_leaves(params_g)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
