"""Model forward tests: shapes for all 4 variants + a pure-numpy oracle
for the default RAT cross/intra encoder block (SURVEY.md §4: numerical
parity tests against a numpy oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf, softmax

from rat_tpu.models import build_model
from rat_tpu.nn.encoders import CrossIntraEncoderBlock


def _make_inputs(rng, B=4, K=3, F=3):
    X = rng.randint(0, 10, (B, 1 + K, F)).astype(np.int32)
    y = rng.randint(0, 2, (B, 1 + K)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("model_name", ["RAT_m0", "RAT_m1", "RAT_m2", "RAT_m3"])
def test_variant_forward_shapes(model_name, tiny_feature_map, demo_params, rng):
    params = dict(demo_params, model=model_name)
    model = build_model(tiny_feature_map, params)
    X, y = _make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    out = model.apply(variables, X, y, train=False)
    assert out["y_pred"].shape == (4, 1)
    assert out["y_true"].shape == (4, 1)
    assert np.all(np.asarray(out["y_pred"]) >= 0)
    assert np.all(np.asarray(out["y_pred"]) <= 1)
    np.testing.assert_array_equal(np.asarray(out["y_true"])[:, 0],
                                  np.asarray(y)[:, 0])


def test_forward_deterministic_in_eval(tiny_feature_map, demo_params, rng):
    params = dict(demo_params, dropout=0.5, emb_dropout=0.5)
    model = build_model(tiny_feature_map, params)
    X, y = _make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    o1 = model.apply(variables, X, y, train=False)
    o2 = model.apply(variables, X, y, train=False)
    np.testing.assert_array_equal(np.asarray(o1["y_pred"]), np.asarray(o2["y_pred"]))


def test_no_neighbors_k0(tiny_feature_map, demo_params, rng):
    model = build_model(tiny_feature_map, demo_params)
    X = jnp.asarray(rng.randint(0, 10, (4, 1, 3)).astype(np.int32))
    y = jnp.asarray(rng.randint(0, 2, (4, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    out = model.apply(variables, X, y, train=False)
    assert out["y_pred"].shape == (4, 1)


def test_query_proj_dead_params_exist(tiny_feature_map, demo_params, rng):
    """Parameter-count parity: the reference instantiates an unused
    query_proj Linear (RAT_m2.py:66-70)."""
    model = build_model(tiny_feature_map, demo_params)
    X, y = _make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
    p = variables["params"]
    d, F = demo_params["embedding_dim"], 3
    assert p["query_proj_kernel"].shape == (d * F, d * F)
    assert p["query_proj_bias"].shape == (d * F,)


# ---------------------------------------------------------------------------
# numpy oracle for the default RAT block (RAT_m2.py:204-236)
# ---------------------------------------------------------------------------

def np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_attention_core(q, k, v, heads, dim_head, p_out):
    """Shared oracle core: head split, scaled dots, softmax, merge,
    output projection."""
    def split_heads(t):
        b, n, inner = t.shape
        return t.reshape(b, n, heads, inner // heads).transpose(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))
    dots = np.einsum("bhid,bhjd->bhij", q, k) * dim_head ** -0.5
    attn = softmax(dots, axis=-1)
    out = np.einsum("bhij,bhjd->bhid", attn, v)
    b, h, n, dh = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    return out @ np.asarray(p_out["kernel"]) + np.asarray(p_out["bias"])


def np_attention(x, p, heads, dim_head):
    qkv = x @ np.asarray(p["to_qkv"]["kernel"])
    q, k, v = np.split(qkv, 3, axis=-1)
    return np_attention_core(q, k, v, heads, dim_head, p["to_out"])


def np_prenorm_attn(x, p, heads, dim_head):
    xn = np_layernorm(x, np.asarray(p["LayerNorm_0"]["scale"]),
                      np.asarray(p["LayerNorm_0"]["bias"]))
    return np_attention(xn, p["Attention_0"], heads, dim_head)


def np_ff(x, p):
    h = np_gelu(x @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"]))
    return h @ np.asarray(p["Dense_1"]["kernel"]) + np.asarray(p["Dense_1"]["bias"])


def test_cross_intra_block_matches_numpy_oracle(rng):
    d, heads, dim_head, hidden = 8, 2, 8, 16
    block = CrossIntraEncoderBlock(d, heads, dim_head, 0.0, hidden)
    x = rng.randn(2, 4, 5, d).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    got = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    b, t, s, _ = x.shape
    h = x.reshape(b * t, s, d)
    h = np_prenorm_attn(h, p["intra_attention"], heads, dim_head) + h
    h = h.reshape(b, t, s, d).transpose(0, 2, 1, 3).reshape(b * s, t, d)
    h = np_prenorm_attn(h, p["cross_attention"], heads, dim_head) + h
    h = np_ff(h, p["mlp"]) + h
    want = h.reshape(b, s, t, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def np_shared_q_attention(x, p, w_q, num_heads, dim_head):
    """PA branch oracle: prenorm, shared Q, halved heads, dim_head scale
    (RAT_m3.py:164-196)."""
    xn = np_layernorm(x, np.asarray(p["LayerNorm_0"]["scale"]),
                      np.asarray(p["LayerNorm_0"]["bias"]))
    q = xn @ w_q
    k = xn @ np.asarray(p["W_k"]["kernel"])
    v = xn @ np.asarray(p["W_v"]["kernel"])
    # the reference halves heads per branch but keeps dim_head scaling
    return np_attention_core(q, k, v, num_heads // 2, dim_head, p["to_out"])


def test_pa_block_matches_numpy_oracle(rng):
    from rat_tpu.nn.encoders import CrossIntraEncoderBlockPA
    d, heads, dim_head, hidden = 8, 4, 8, 16
    block = CrossIntraEncoderBlockPA(d, heads, dim_head, 0.0, hidden)
    x = rng.randn(2, 4, 5, d).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    got = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    w_q = p["W_q"]
    b, n, s, _ = x.shape
    out_s = np_shared_q_attention(x.reshape(b * n, s, d), p["intra_attention"],
                                  w_q, heads, dim_head).reshape(b, n, s, d)
    x2 = x.transpose(0, 2, 1, 3).reshape(b * s, n, d)
    out_t = np_shared_q_attention(x2, p["cross_attention"], w_q, heads,
                                  dim_head).reshape(b, s, n, d).transpose(0, 2, 1, 3)
    out = (out_s + out_t) / 2
    want = np_ff(out, p["mlp"]) + x  # sole residual: FF back to input
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_embedding_padding_row_zero_and_masked(tiny_feature_map):
    """Padding ids must embed to exact zeros (torch padding_idx contract)."""
    from rat_tpu.nn.embedding import EmbeddingSpec, PackedEmbedding
    fm = tiny_feature_map
    fm.feature_specs["tag_id"]["padding_idx"] = 9
    spec = EmbeddingSpec.build(fm, 4)
    emb = PackedEmbedding(spec, 4)
    X = jnp.asarray([[1, 2, 9]], dtype=jnp.int32)  # tag hits padding idx
    variables = emb.init(jax.random.PRNGKey(0), X)
    out = np.asarray(emb.apply(variables, X))
    np.testing.assert_array_equal(out[0, 2], np.zeros(4))
    assert np.abs(out[0, 0]).sum() > 0


def test_wide_tower_is_target_only(tiny_feature_map, demo_params, rng):
    """The wide/LR tower sees ONLY the target row: the reference reassigns
    X = X[:, 0]; X = unsqueeze(X, 1) -> Bx1xF before ``y_pred +=
    self.lr_layer(X)`` (RAT_m2.py:114,119,148). Perturbing a neighbor's
    features must therefore shift the prediction identically with use_wide
    on or off (the shift comes only from the encoder path), while
    perturbing the TARGET row must engage the LR term."""
    X, y = _make_inputs(rng)
    Xn = np.asarray(X).copy()
    Xn[:, 3, :] = (Xn[:, 3, :] + 1) % 5 + 1  # perturb one neighbor
    Xn = jnp.asarray(Xn)
    Xt = np.asarray(X).copy()
    Xt[:, 0, :] = (Xt[:, 0, :] + 1) % 5 + 1  # perturb the target
    Xt = jnp.asarray(Xt)

    outs = {}
    for wide in (True, False):
        params = dict(demo_params, use_wide=wide)
        model = build_model(tiny_feature_map, params)
        variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
        p1 = np.asarray(model.apply(variables, X, y, train=False)["y_pred"])
        pn = np.asarray(model.apply(variables, Xn, y, train=False)["y_pred"])
        pt = np.asarray(model.apply(variables, Xt, y, train=False)["y_pred"])
        outs[wide] = (p1, pn, pt)
    # neighbor perturbation flows only through the (wide-independent)
    # encoder: the logit-space shift is the same with the wide tower on.
    # Compare in logit space because the extra LR constant moves the
    # sigmoid operating point.
    def logit(p):
        return np.log(p) - np.log1p(-p)
    d_wide = logit(outs[True][1]) - logit(outs[True][0])
    d_base = logit(outs[False][1]) - logit(outs[False][0])
    np.testing.assert_allclose(d_wide, d_base, atol=1e-4,
                               err_msg="neighbor features leaked into the "
                                       "wide tower")
    # target perturbation must engage the LR term (wide on != wide off)
    dt_wide = np.abs(logit(outs[True][2]) - logit(outs[True][0])).mean()
    dt_base = np.abs(logit(outs[False][2]) - logit(outs[False][0])).mean()
    assert dt_wide != dt_base, "target features must reach the LR tower"
    # and the pure-LR contribution to a neighbor change must be zero:
    from rat_tpu.nn.embedding import EmbeddingSpec
    from rat_tpu.nn.layers import LRLayer
    spec = EmbeddingSpec.build(tiny_feature_map, 1, use_pretrain=False,
                               force_dim=1)
    lr = LRLayer(spec, use_bias=False)
    v = lr.init(jax.random.PRNGKey(1), X[:, 0:1])
    l1 = np.asarray(lr.apply(v, X[:, 0:1]))
    l2 = np.asarray(lr.apply(v, Xn[:, 0:1]))
    np.testing.assert_allclose(l1, l2)
    l3 = np.asarray(lr.apply(v, Xt[:, 0:1]))
    assert not np.allclose(l1, l3)


class TestGridMinorEncoder:
    """RAT_TPU_ENCODER_IMPL=grid_minor must be a pure layout change:
    identical parameter tree, identical forward and gradients."""

    def _encoder(self, heads=2, dim_head=5, d=10, depth=3):
        from rat_tpu.nn.encoders import CrossIntraEncoder
        return CrossIntraEncoder(d, heads, dim_head, 0.0, depth, 4 * d)

    def test_param_tree_identical(self, rng, monkeypatch):
        enc = self._encoder()
        x = jnp.asarray(rng.randn(3, 4, 5, 10).astype(np.float32))
        v_stream = enc.init(jax.random.PRNGKey(7), x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        v_gm = enc.init(jax.random.PRNGKey(7), x)
        s_paths = {jax.tree_util.keystr(p): a.shape for p, a in
                   jax.tree_util.tree_leaves_with_path(v_stream)}
        g_paths = {jax.tree_util.keystr(p): a.shape for p, a in
                   jax.tree_util.tree_leaves_with_path(v_gm)}
        assert s_paths == g_paths
        # same init rng stream -> same values leaf for leaf
        for a, b in zip(jax.tree_util.tree_leaves(v_stream),
                        jax.tree_util.tree_leaves(v_gm)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("heads,dim_head", [(2, 5), (1, 10), (4, 3)])
    def test_forward_and_grad_match_stream(self, rng, monkeypatch,
                                           heads, dim_head):
        enc = self._encoder(heads=heads, dim_head=dim_head)
        x = jnp.asarray(rng.randn(6, 4, 5, 10).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(enc.apply(v, x) ** 2)

        y_s, g_s = jax.value_and_grad(loss)(variables, x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        y_g, g_g = jax.value_and_grad(loss)(variables, x)
        np.testing.assert_allclose(float(y_s), float(y_g), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_g)):
            # the two schedules reassociate fp32 sums differently; scale
            # the absolute floor by the leaf's own gradient magnitude
            atol = 2e-6 * float(np.max(np.abs(np.asarray(a))) + 1.0)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=atol)

    def test_full_model_prediction_matches(self, tiny_feature_map,
                                           demo_params, rng, monkeypatch):
        model = build_model(tiny_feature_map, demo_params)
        X, y = _make_inputs(rng, B=8)
        variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
        out_s = model.apply(variables, X, y, train=False)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        out_g = model.apply(variables, X, y, train=False)
        np.testing.assert_allclose(np.asarray(out_s["y_pred"]),
                                   np.asarray(out_g["y_pred"]),
                                   rtol=1e-5, atol=1e-6)


class TestGridMinorEncoderPA:
    """grid_minor for the m3 (PA) stack: identical tree + math."""

    def _encoder(self, heads=4, dim_head=5, d=10, depth=2):
        from rat_tpu.nn.encoders import CrossIntraEncoderPA
        return CrossIntraEncoderPA(d, heads, dim_head, 0.0, depth, 2 * d)

    def test_param_tree_identical(self, rng, monkeypatch):
        enc = self._encoder()
        x = jnp.asarray(rng.randn(3, 4, 5, 10).astype(np.float32))
        v_stream = enc.init(jax.random.PRNGKey(7), x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        v_gm = enc.init(jax.random.PRNGKey(7), x)
        s_paths = {jax.tree_util.keystr(p): a.shape for p, a in
                   jax.tree_util.tree_leaves_with_path(v_stream)}
        g_paths = {jax.tree_util.keystr(p): a.shape for p, a in
                   jax.tree_util.tree_leaves_with_path(v_gm)}
        assert s_paths == g_paths
        for a, b in zip(jax.tree_util.tree_leaves(v_stream),
                        jax.tree_util.tree_leaves(v_gm)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("heads,dim_head", [(4, 5), (2, 10)])
    def test_forward_and_grad_match_stream(self, rng, monkeypatch,
                                           heads, dim_head):
        enc = self._encoder(heads=heads, dim_head=dim_head)
        x = jnp.asarray(rng.randn(6, 4, 5, 10).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(enc.apply(v, x) ** 2)

        y_s, g_s = jax.value_and_grad(loss)(variables, x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        y_g, g_g = jax.value_and_grad(loss)(variables, x)
        np.testing.assert_allclose(float(y_s), float(y_g), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_g)):
            atol = 2e-6 * float(np.max(np.abs(np.asarray(a))) + 1.0)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=atol)

    def test_full_model_prediction_matches(self, tiny_feature_map,
                                           demo_params, rng, monkeypatch):
        model = build_model(tiny_feature_map,
                            dict(demo_params, model="RAT_m3", num_heads=4))
        X, y = _make_inputs(rng, B=8)
        variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
        out_s = model.apply(variables, X, y, train=False)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        out_g = model.apply(variables, X, y, train=False)
        np.testing.assert_allclose(np.asarray(out_s["y_pred"]),
                                   np.asarray(out_g["y_pred"]),
                                   rtol=1e-5, atol=1e-6)


class TestGridMinorJointCascade:
    """grid_minor twins for the m0 (Joint) and m1 (Cascade) stacks."""

    @pytest.mark.parametrize("which", ["joint", "cascade"])
    def test_param_tree_and_forward_match(self, rng, monkeypatch, which):
        from rat_tpu.nn.encoders import CascadeEncoder, JointEncoder
        cls = JointEncoder if which == "joint" else CascadeEncoder
        enc = cls(10, 2, 2, 5, 20, 0.0)
        x = jnp.asarray(rng.randn(6, 4, 5, 10).astype(np.float32))
        v_s = enc.init(jax.random.PRNGKey(7), x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        v_g = enc.init(jax.random.PRNGKey(7), x)
        assert ({jax.tree_util.keystr(p): a.shape for p, a in
                 jax.tree_util.tree_leaves_with_path(v_s)} ==
                {jax.tree_util.keystr(p): a.shape for p, a in
                 jax.tree_util.tree_leaves_with_path(v_g)})
        for a, b in zip(jax.tree_util.tree_leaves(v_s),
                        jax.tree_util.tree_leaves(v_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(v, x):
            return jnp.sum(enc.apply(v, x) ** 2)

        monkeypatch.delenv("RAT_TPU_ENCODER_IMPL")
        y_s = loss(v_s, x)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        y_g = loss(v_s, x)
        np.testing.assert_allclose(float(y_s), float(y_g), rtol=1e-5)

        # these stacks end in a LayerNorm, which nearly cancels the
        # parameter gradients (max |g| ~1e-3 here): fp32 reassociation
        # between the two schedules shows up as percent-level relative
        # error on the tiny remainders, so the gradient equivalence is
        # asserted in float64 (measured 2e-11 rel; a real math
        # difference would not vanish with precision)
        jax.config.update("jax_enable_x64", True)
        try:
            v64 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), v_s)
            x64 = jnp.asarray(np.asarray(x), jnp.float64)
            monkeypatch.delenv("RAT_TPU_ENCODER_IMPL")
            g_s = jax.grad(loss)(v64, x64)
            monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
            g_g = jax.grad(loss)(v64, x64)
            for a, b in zip(jax.tree_util.tree_leaves(g_s),
                            jax.tree_util.tree_leaves(g_g)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-8, atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    @pytest.mark.parametrize("model_name", ["RAT_m0", "RAT_m1"])
    def test_full_model_prediction_matches(self, tiny_feature_map,
                                           demo_params, rng, monkeypatch,
                                           model_name):
        model = build_model(tiny_feature_map,
                            dict(demo_params, model=model_name))
        X, y = _make_inputs(rng, B=8)
        variables = model.init(jax.random.PRNGKey(0), X, y, train=False)
        out_s = model.apply(variables, X, y, train=False)
        monkeypatch.setenv("RAT_TPU_ENCODER_IMPL", "grid_minor")
        out_g = model.apply(variables, X, y, train=False)
        np.testing.assert_allclose(np.asarray(out_s["y_pred"]),
                                   np.asarray(out_g["y_pred"]),
                                   rtol=1e-5, atol=1e-6)
