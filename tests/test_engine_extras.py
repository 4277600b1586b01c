"""Engine extras: full-state checkpoint/resume, numeric fields,
sequence fields through the model, profiling knobs."""

import numpy as np
import pytest

from rat_tpu.engine import Trainer
from tests.test_trainer import FakeGen, _trainer


def test_full_state_resume_roundtrip(tiny_feature_map, demo_params, tmp_path):
    train = FakeGen(n=256, seed=1)
    valid = FakeGen(n=128, seed=2, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path)
    tr.fit(train, validation_data=valid, epochs=2)
    ckpt_dir = str(tmp_path / "full_ckpt")
    tr.save_train_state(ckpt_dir)
    step_before = int(tr.state.step)
    best_before = tr._best_metric

    tr2 = _trainer(tiny_feature_map, demo_params, tmp_path)
    tr2.init_state(np.zeros((2, 3, 3), np.int32), np.zeros((2, 3), np.float32))
    extra = tr2.restore_train_state(ckpt_dir)
    assert int(tr2.state.step) == step_before
    assert extra["best_metric"] == pytest.approx(best_before)
    # optimizer moments restored: a further eval must match exactly
    m1 = tr.evaluate(valid)
    m2 = tr2.evaluate(valid)
    assert m1["AUC"] == pytest.approx(m2["AUC"], abs=1e-12)


def test_numeric_fields_through_model(tmp_path, demo_params, rng):
    from rat_tpu.features import FeatureMap
    fm = FeatureMap("numtest", str(tmp_path))
    fm.feature_specs = {
        "user_id": {"source": "", "type": "categorical", "vocab_size": 20, "index": 0},
        "price": {"source": "", "type": "numeric", "index": 1},
        "tag_id": {"source": "", "type": "categorical", "vocab_size": 10, "index": 2},
    }
    fm.num_fields = 3
    fm.num_features = 31
    fm.input_length = 3

    n, K = 128, 2
    X = np.zeros((n, 3))
    X[:, 0] = rng.randint(1, 20, n)
    X[:, 1] = rng.randn(n)  # numeric column holds float values
    X[:, 2] = rng.randint(1, 10, n)
    y = (X[:, 1] > 0).astype(np.float64)
    darray = np.concatenate([X, y[:, None]], axis=1)

    gen = FakeGen(n=n, K=K)
    gen.darray = darray
    gen.pool_darray = darray
    params = dict(demo_params, model_root=str(tmp_path), use_wide=True)
    tr = Trainer(fm, params)
    tr.fit(gen, validation_data=gen, epochs=5)
    logs = tr.evaluate(gen)
    # numeric signal is directly predictive -> must beat chance clearly
    assert logs["AUC"] > 0.8, logs


def test_sequence_fields_through_model(tmp_path, demo_params, rng):
    """kkbox-style schema: input_length > num_fields (sequence spans)."""
    from rat_tpu.features import FeatureMap
    fm = FeatureMap("seqtest", str(tmp_path))
    fm.feature_specs = {
        "user_id": {"source": "", "type": "categorical", "vocab_size": 20, "index": 0},
        "genres": {"source": "", "type": "sequence", "vocab_size": 12,
                   "padding_idx": 11, "max_len": 3, "index": [1, 2, 3],
                   "encoder": "MaskedSumPooling"},
        "tag_id": {"source": "", "type": "categorical", "vocab_size": 10, "index": 4},
    }
    fm.num_fields = 3
    fm.num_features = 42
    fm.input_length = 5

    n, K = 128, 2
    X = np.zeros((n, 5))
    X[:, 0] = rng.randint(1, 20, n)
    X[:, 1:4] = rng.randint(0, 12, (n, 3))
    X[:, 4] = rng.randint(1, 10, n)
    y = (X[:, 0] >= 10).astype(np.float64)
    darray = np.concatenate([X, y[:, None]], axis=1)

    gen = FakeGen(n=n, K=K, F=5)
    gen.darray = darray
    gen.pool_darray = darray
    params = dict(demo_params, model_root=str(tmp_path))
    tr = Trainer(fm, params)
    tr.fit(gen, validation_data=gen, epochs=5)
    logs = tr.evaluate(gen)
    assert logs["AUC"] > 0.8, logs


def test_masked_average_pooling_sequence(rng):
    """MaskedAveragePooling divides by the non-padding token count."""
    import jax
    import jax.numpy as jnp
    from rat_tpu.features import FeatureMap
    from rat_tpu.nn.embedding import EmbeddingSpec, PackedEmbedding
    fm = FeatureMap("avg", ".")
    fm.feature_specs = {
        "seq": {"source": "", "type": "sequence", "vocab_size": 6,
                "padding_idx": 5, "max_len": 3, "index": [0, 1, 2],
                "encoder": "MaskedAveragePooling"},
    }
    spec = EmbeddingSpec.build(fm, 4)
    emb = PackedEmbedding(spec, 4)
    X = jnp.asarray([[1, 2, 5]], dtype=jnp.int32)  # 2 valid + 1 pad
    variables = emb.init(jax.random.PRNGKey(0), X)
    out = np.asarray(emb.apply(variables, X))[0, 0]
    table = np.asarray(variables["params"]["table"])
    want = (table[1] + table[2]) / (2 + 1e-16)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_adam_step_matches_torch():
    """torch.optim.Adam and our optax adam (behind global-norm clip)
    must produce the same parameter trajectory for the same gradients —
    torch: m_hat / (sqrt(v_hat) + eps), optax: the same with
    eps_root=0 (SURVEY §7.3 risk item)."""
    import jax.numpy as jnp
    import torch

    from rat_tpu.engine.optim import get_optimizer

    rng = np.random.RandomState(0)
    w0 = rng.randn(7, 5).astype(np.float32)
    grads = [rng.randn(7, 5).astype(np.float32) * 3 for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=1e-3)
    for gr in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(gr.copy())
        torch.nn.utils.clip_grad_norm_([tp], 10.0)
        topt.step()

    opt = get_optimizer("adam", 1e-3, max_gradient_norm=10.0)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for gr in grads:
        updates, state = opt.update({"w": jnp.asarray(gr)}, state, params)
        import optax
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), atol=1e-6, rtol=1e-5)
