"""Regression tests for the round-1 code-review findings."""

import h5py
import numpy as np
import pytest

from rat_tpu.data import save_hdf5
from rat_tpu.data.loader import get_data_generator
from rat_tpu.data.block_loader import DataBlockGenerator
from tests.test_loader import RC, _write_split
from tests.test_trainer import FakeGen, _trainer


def test_multiblock_get_data_generator_returns_block_gen(tmp_path):
    """>1 block must stream (reference data_generator.py:479-508);
    concatenation collided with per-block retrieval caches."""
    paths = [str(tmp_path / f"train_part_{i}.h5") for i in range(2)]
    for i, p in enumerate(paths):
        _write_split(p, n=30, seed=i)
    gen = get_data_generator(paths, batch_size=8, retrieval_configs=dict(RC),
                             retrieval_pool_fname="self",
                             retrieval_augmented=True)
    assert isinstance(gen, DataBlockGenerator)
    assert gen.topk == RC["topK"]


def test_block_valid_generator_evaluate(tiny_feature_map, demo_params, tmp_path):
    """evaluate() must stream block-mode validation splits."""
    paths = [str(tmp_path / f"valid_part_{i}.h5") for i in range(2)]
    rng = np.random.RandomState(0)
    for p in paths:
        X = rng.randint(1, 8, (48, 3))
        y = (X[:, 0] >= 4).astype(np.float64)
        save_hdf5(np.concatenate([X, y[:, None]], axis=1), p)
    rc = dict(RC, topK=2)
    valid = DataBlockGenerator(paths, batch_size=16, retrieval_configs=rc,
                               retrieval_pool_fname="self",
                               retrieval_augmented=True)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path)
    tr.init_state(np.zeros((2, 3, 3), np.int32), np.zeros((2, 3), np.float32))
    logs = tr.evaluate(valid)
    assert 0 <= logs["AUC"] <= 1


def test_fast_forward_identity_projection(tiny_feature_map, demo_params, rng):
    """num_heads=1 with dim_head == embedding_dim omits the attention
    output projection (RAT_m0.py:167); the fast path must match."""
    import jax
    from rat_tpu.models import build_model
    from rat_tpu.models.fast_forward import rat_m2_fast_forward
    from tests.test_models import _make_inputs
    params = dict(demo_params, num_heads=1, dim_head=demo_params["embedding_dim"])
    model = build_model(tiny_feature_map, params)
    X, y = _make_inputs(rng, B=4, K=2, F=3)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    want = model.apply(variables, X, y, train=False)
    got = rat_m2_fast_forward(variables["params"], model, X, y,
                              use_kernel=False)
    np.testing.assert_allclose(np.asarray(got["y_pred"]),
                               np.asarray(want["y_pred"]),
                               rtol=1e-4, atol=1e-6)


def test_lr_decay_without_grad_clipping(tiny_feature_map, demo_params, tmp_path):
    """LR plateau must work when max_gradient_norm disables the chain."""
    tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                  max_gradient_norm=0)
    tr.init_state(np.zeros((2, 3, 3), np.int32), np.zeros((2, 3), np.float32))
    from rat_tpu.engine.optim import get_learning_rate
    assert get_learning_rate(tr.state.opt_state) == pytest.approx(1e-3)
    assert tr.lr_decay() == pytest.approx(1e-4)


def test_hooked_pretrained_side_table(tmp_path, rng):
    """pretrained dim != model dim: side table + projection hook, frozen
    rows receive no gradient (embedding.py:66-67,129-136 semantics)."""
    import jax
    import jax.numpy as jnp
    from rat_tpu.features import FeatureMap
    from rat_tpu.nn.embedding import EmbeddingSpec, PackedEmbedding

    pretrain = rng.randn(15, 32).astype(np.float32)  # width 32 != 6
    with h5py.File(str(tmp_path / "pretrained_user.h5"), "w") as hf:
        hf.create_dataset("user", data=pretrain)
    fm = FeatureMap("hook", str(tmp_path))
    fm.feature_specs = {
        "user": {"source": "", "type": "categorical", "vocab_size": 15,
                 "index": 0, "pretrained_emb": "pretrained_user.h5",
                 "freeze_emb": True, "embedding_dim": 32},
        "item": {"source": "", "type": "categorical", "vocab_size": 10,
                 "index": 1},
    }
    fm.num_fields, fm.num_features, fm.input_length = 2, 25, 2
    spec = EmbeddingSpec.build(fm, 6)
    emb = PackedEmbedding(spec, 6, data_dir=str(tmp_path))
    X = jnp.asarray([[4, 2]], dtype=jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), X)
    out = np.asarray(emb.apply(variables, X))
    assert out.shape == (1, 2, 6)
    # user field = pretrained row through the hook projection
    hook = np.asarray(variables["params"]["hook_user"]["kernel"])
    np.testing.assert_allclose(out[0, 0], pretrain[4] @ hook, rtol=1e-5)

    def loss(params):
        return jnp.sum(emb.apply({"params": params}, X) ** 2)
    g = jax.grad(loss)(variables["params"])
    assert np.all(np.asarray(g["side_user"]) == 0)      # frozen
    assert np.any(np.asarray(g["hook_user"]["kernel"]) != 0)  # hook trains


def test_exact_match_batch_level_branch(rng):
    """Batch-level short-circuit: a mixed batch (one big group) BM25-
    scores all matched queries (data_utils.py:906-917)."""
    from rat_tpu.retrieval import bm25_topk_retrieval
    # col0 is the exact-match key; make key 0 have 6 rows, key 1 have 2
    db = np.array([[0, i % 3] for i in range(6)] + [[1, 0], [1, 1]])
    q = np.array([[0, 1], [1, 1]])
    res = bm25_topk_retrieval(db, q, exact_match_col_indices=[0],
                              qry_batch_size=2, topK=4)
    # query 0: 6 candidates > topK -> BM25-scored (values > 1 possible)
    assert res.lens[0] == 4
    # query 1: only 2 candidates, but batch went the BM25 route:
    # both candidates kept with scores >= 1
    assert res.lens[1] == 2
    assert (res.values[1][:2] >= 1).all()
