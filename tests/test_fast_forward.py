"""Fused fast-forward path: parity with model.apply and trainability."""

import jax
import numpy as np
import pytest

from rat_tpu.models import build_model
from rat_tpu.models.fast_forward import rat_m2_fast_forward
from tests.test_models import _make_inputs
from tests.test_trainer import FakeGen, _trainer


def test_fast_forward_matches_apply(tiny_feature_map, demo_params, rng):
    model = build_model(tiny_feature_map, demo_params)
    X, y = _make_inputs(rng, B=8, K=3, F=3)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    want = model.apply(variables, X, y, train=False)
    got = rat_m2_fast_forward(variables["params"], model, X, y,
                              use_kernel=False)
    np.testing.assert_allclose(np.asarray(got["y_pred"]),
                               np.asarray(want["y_pred"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["y_true"]),
                                  np.asarray(want["y_true"]))


def test_fast_forward_gradients_match(tiny_feature_map, demo_params, rng):
    model = build_model(tiny_feature_map, demo_params)
    X, y = _make_inputs(rng, B=8, K=3, F=3)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)

    def loss_apply(p):
        out = model.apply({"params": p}, X, y, train=False)
        return np.pi * 0 + jax.numpy.mean(out["y_pred"])

    def loss_fast(p):
        out = rat_m2_fast_forward(p, model, X, y, use_kernel=False)
        return jax.numpy.mean(out["y_pred"])

    g1 = jax.grad(loss_apply)(variables["params"])
    g2 = jax.grad(loss_fast)(variables["params"])
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    # query_proj dead params get zero grads in both
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


def test_trainer_fast_path_trains(tiny_feature_map, demo_params, tmp_path):
    train = FakeGen(n=256, seed=1)
    valid = FakeGen(n=128, seed=2, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path, use_pallas=True,
                  embedding_regularizer=0, learning_rate=5e-3)
    assert tr._use_fast_forward()
    tr.fit(train, validation_data=valid, epochs=8)
    logs = tr.evaluate(valid)
    assert logs["AUC"] > 0.9, logs


def test_fast_path_disabled_with_dropout(tiny_feature_map, demo_params, tmp_path):
    tr = _trainer(tiny_feature_map, demo_params, tmp_path, use_pallas=True,
                  dropout=0.1)
    assert not tr._use_fast_forward()
