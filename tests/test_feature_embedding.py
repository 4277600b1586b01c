"""FuxiCTR-v2-style FeatureEmbedding API (feature_embedding.py:29-216)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rat_tpu.features import FeatureMap
from rat_tpu.nn import (FeatureEmbedding, FeatureEmbeddingDict,
                        parse_feature_encoder)


def _fm(specs, input_length=None):
    fm = FeatureMap("t", ".")
    fm.feature_specs.update(specs)
    fm.num_fields = len(specs)
    if input_length is None:
        input_length = 0
        for s in specs.values():
            idx = s["index"]
            input_length += len(idx) if isinstance(idx, (list, tuple)) else 1
    fm.input_length = input_length
    return fm


def test_parse_feature_encoder_accepts_reference_forms():
    assert parse_feature_encoder("layers.MaskedAveragePooling()") == \
        ("MaskedAveragePooling", (), {})
    assert parse_feature_encoder("nn.Linear(64, 10, bias=False)") == \
        ("Linear", (64, 10), {"bias": False})
    assert parse_feature_encoder("layers.KMaxPooling(2, dim=1)") == \
        ("KMaxPooling", (2,), {"dim": 1})


def test_parse_feature_encoder_rejects_code_execution():
    for bad in ("__import__('os').system('true')",
                "layers.MaskedAveragePooling",      # not a call
                "eval('1+1')",
                "nn.Linear(64, open('/etc/passwd'))",  # non-literal arg
                "SomethingElse()"):
        with pytest.raises(ValueError):
            parse_feature_encoder(bad)


def _basic_specs():
    return {
        "u": {"source": "user", "type": "categorical", "vocab_size": 9,
              "index": 0},
        "i": {"source": "item", "type": "categorical", "vocab_size": 7,
              "index": 1},
        "tags": {"source": "item", "type": "sequence", "vocab_size": 6,
                 "index": [2, 3, 4], "padding_idx": 5,
                 "feature_encoder": "layers.MaskedAveragePooling()"},
    }


def test_dict_view_and_tensor_views():
    fm = _fm(_basic_specs())
    layer = FeatureEmbeddingDict(fm, 4)
    X = np.array([[1, 2, 0, 1, 5], [3, 4, 5, 5, 5]], dtype=np.int32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(X))
    out = layer.apply(variables, jnp.asarray(X))
    assert list(out) == ["u", "i", "tags"]
    assert all(v.shape == (2, 4) for v in out.values())

    stacked = layer.dict2tensor(out)
    assert stacked.shape == (2, 3, 4)
    flat = layer.dict2tensor(out, dynamic_emb_dim=True)
    assert flat.shape == (2, 12)
    np.testing.assert_allclose(np.asarray(stacked).reshape(2, 12),
                               np.asarray(flat))

    item_only = layer.dict2tensor(out, feature_source="item")
    assert item_only.shape == (2, 2, 4)
    cat_only = layer.apply(variables, jnp.asarray(X),
                           feature_type="categorical")
    assert list(cat_only) == ["u", "i"]


def test_per_field_dynamic_dims_concat():
    specs = _basic_specs()
    specs["u"]["embedding_dim"] = 6
    fm = _fm(specs)
    model = FeatureEmbedding(fm, 4)
    X = jnp.asarray(np.array([[1, 2, 0, 1, 5]], dtype=np.int32))
    variables = model.init(jax.random.PRNGKey(0), X, dynamic_emb_dim=True)
    out = model.apply(variables, X, dynamic_emb_dim=True)
    assert out.shape == (1, 6 + 4 + 4)
    # two dim groups -> two packed tables
    p = variables["params"]["embedding_layer"]
    assert p["table_d6"].shape[0] == 9
    assert p["table_d4"].shape[0] == 7 + 6


def test_required_and_not_required_filters():
    fm = _fm(_basic_specs())
    X = jnp.asarray(np.array([[1, 2, 0, 1, 5]], dtype=np.int32))
    only_u = FeatureEmbeddingDict(fm, 4, required_feature_columns=("u",))
    v = only_u.init(jax.random.PRNGKey(0), X)
    assert list(only_u.apply(v, X)) == ["u"]
    no_tags = FeatureEmbeddingDict(fm, 4,
                                   not_required_feature_columns=("tags",))
    v = no_tags.init(jax.random.PRNGKey(0), X)
    assert list(no_tags.apply(v, X)) == ["u", "i"]


def test_lr_mode_forces_dim1_and_sum_pooling():
    """embedding_dim=1 without pretrain+sharing = the LR one-hot trick:
    every field 1-dim, sequences sum-pooled (feature_embedding.py:72-75)."""
    fm = _fm(_basic_specs())
    layer = FeatureEmbeddingDict(fm, 1, use_pretrain=False)
    X = np.array([[1, 2, 0, 1, 5]], dtype=np.int32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(X))
    out = layer.apply(variables, jnp.asarray(X))
    assert all(v.shape == (1, 1) for v in out.values())
    table = np.asarray(variables["params"]["table_d1"])
    assert table.shape == (9 + 7 + 6, 1)
    # sum pooling over the two non-pad tags (ids 0, 1 of the tags vocab)
    np.testing.assert_allclose(np.asarray(out["tags"])[0, 0],
                               table[9 + 7 + 0, 0] + table[9 + 7 + 1, 0],
                               rtol=1e-6)


def test_share_embedding_and_use_sharing_off():
    specs = {
        "a": {"source": "", "type": "categorical", "vocab_size": 5,
              "index": 0},
        "b": {"source": "", "type": "categorical", "vocab_size": 5,
              "index": 1, "share_embedding": "a"},
    }
    fm = _fm(specs)
    X = jnp.asarray(np.array([[3, 3]], dtype=np.int32))
    shared = FeatureEmbeddingDict(fm, 4)
    v = shared.init(jax.random.PRNGKey(0), X)
    out = shared.apply(v, X)
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(out["b"]))
    assert v["params"]["table_d4"].shape[0] == 5

    own = FeatureEmbeddingDict(fm, 4, use_sharing=False)
    v2 = own.init(jax.random.PRNGKey(0), X)
    assert v2["params"]["table_d4"].shape[0] == 10
    out2 = own.apply(v2, X)
    assert not np.allclose(np.asarray(out2["a"]), np.asarray(out2["b"]))


def test_linear_and_kmax_encoders():
    specs = {
        "seq": {"source": "", "type": "sequence", "vocab_size": 6,
                "index": [0, 1, 2], "padding_idx": 5,
                "feature_encoder": ["layers.KMaxPooling(2, dim=1)",
                                    "nn.Linear(4, 3, bias=False)"]},
    }
    fm = _fm(specs)
    layer = FeatureEmbeddingDict(fm, 4)
    X = jnp.asarray(np.array([[0, 1, 5], [2, 5, 5]], dtype=np.int32))
    variables = layer.init(jax.random.PRNGKey(0), X)
    out = layer.apply(variables, X)
    # KMax keeps 2 of 3 sequence positions, Linear maps d 4 -> 3
    assert out["seq"].shape == (2, 2, 3)


def test_numeric_field():
    specs = {
        "price": {"source": "", "type": "numeric", "index": 0},
        "u": {"source": "", "type": "categorical", "vocab_size": 5,
              "index": 1},
    }
    fm = _fm(specs)
    layer = FeatureEmbeddingDict(fm, 4)
    X = np.array([[0, 2], [0, 3]], dtype=np.int32)
    Xn = np.array([[2.0, 0.0], [0.5, 0.0]], dtype=np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(X),
                           jnp.asarray(Xn))
    out = layer.apply(variables, jnp.asarray(X), jnp.asarray(Xn))
    w = np.asarray(variables["params"]["numeric_weights_d4"])[0]
    np.testing.assert_allclose(np.asarray(out["price"]),
                               np.array([[2.0], [0.5]]) * w, rtol=1e-6)


def test_kmax_pooling_positive_dim_anchors_from_right():
    """Reference configs write KMaxPooling's axis against a 3-D
    [B, L, D] input (dim=1 = sequence axis); under the RAT grid the
    span is higher-rank ([B, 1+K, L, D]), so a positive dim must be
    anchored from the right (ADVICE r2)."""
    import jax.numpy as jnp
    import numpy as np

    from rat_tpu.nn.attention_lib import k_max_pooling
    from rat_tpu.nn.feature_embedding import FeatureEmbeddingDict

    emb = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5, 4)
                      .astype(np.float32))  # [B, 1+K, L, D]
    mod = FeatureEmbeddingDict.__new__(FeatureEmbeddingDict)
    out = mod._apply_encoder(emb, ("KMaxPooling", (), {"k": 2, "dim": 1}),
                             "enc")
    # dim=1 in the 3-D convention = the sequence axis = -2 here
    want = k_max_pooling(emb, 2, axis=-2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    assert out.shape == (2, 3, 2, 4)
