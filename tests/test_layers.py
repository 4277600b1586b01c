"""Layer-library tests (interaction / attention / graph / APG / misc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rat_tpu.nn import (APGMLPLayer, BilinearInteractionLayer,
                        CompressedInteractionNet, CrossNet, DIN_Attention,
                        Dice, FiGNN_Layer, HolographicInteractionLayer,
                        InnerProductLayer, InteractionMachine, MLPBlock,
                        MultiHeadTargetAttention, PET_Layer,
                        SqueezeExcitationLayer, k_max_pooling)

KEY = jax.random.PRNGKey(0)


def test_inner_product_sum_pooling(rng):
    emb = rng.randn(4, 5, 6).astype(np.float32)
    out = InnerProductLayer(output="product_sum_pooling").init_with_output(
        KEY, jnp.asarray(emb))[0]
    # oracle: sum over i<j of <e_i, e_j>
    want = np.zeros((4, 1))
    for i in range(5):
        for j in range(i + 1, 5):
            want[:, 0] += (emb[:, i] * emb[:, j]).sum(-1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


def test_inner_product_elementwise(rng):
    emb = rng.randn(2, 4, 3).astype(np.float32)
    out = InnerProductLayer(num_fields=4, output="elementwise_product") \
        .init_with_output(KEY, jnp.asarray(emb))[0]
    assert out.shape == (2, 6, 3)  # C(4,2) pairs


def test_inner_product_inner(rng):
    emb = rng.randn(2, 4, 3).astype(np.float32)
    out = InnerProductLayer(num_fields=4, output="inner_product") \
        .init_with_output(KEY, jnp.asarray(emb))[0]
    assert out.shape == (2, 6)


def test_bilinear_types(rng):
    emb = jnp.asarray(rng.randn(2, 4, 5).astype(np.float32))
    for t in ["field_all", "field_each", "field_interaction"]:
        out = BilinearInteractionLayer(4, 5, bilinear_type=t) \
            .init_with_output(KEY, emb)[0]
        assert out.shape == (2, 6, 5), t


def test_holographic_circular_correlation(rng):
    emb = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
    for t in ["hadamard_product", "circular_convolution", "circular_correlation"]:
        out = HolographicInteractionLayer(3, interaction_type=t) \
            .init_with_output(KEY, emb)[0]
        assert out.shape == (2, 3, 4), t


def test_crossnet_matches_recurrence(rng):
    x = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    model = CrossNet(6, 2)
    out, variables = model.init_with_output(KEY, x)
    p = variables["params"]
    xi = np.asarray(x)
    x0 = np.asarray(x)
    for i in range(2):
        lp = p[f"CrossInteractionLayer_{i}"]
        xi = xi + (x0 * (xi @ np.asarray(lp["weight"])) + np.asarray(lp["bias"]))
    np.testing.assert_allclose(np.asarray(out), xi, rtol=1e-4)


def test_cin_shape(rng):
    emb = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    out = CompressedInteractionNet(5, [6, 4], output_dim=1) \
        .init_with_output(KEY, emb)[0]
    assert out.shape == (2, 1)


def test_interaction_machine_order2_oracle(rng):
    emb = rng.randn(3, 4, 5).astype(np.float32)
    model = InteractionMachine(5, order=2)
    out, variables = model.init_with_output(KEY, jnp.asarray(emb))
    p1 = emb.sum(1)
    p2 = (emb ** 2).sum(1)
    feats = np.concatenate([p1, (p1 ** 2 - p2) / 2], axis=-1)
    k = np.asarray(variables["params"]["Dense_0"]["kernel"])
    b = np.asarray(variables["params"]["Dense_0"]["bias"])
    np.testing.assert_allclose(np.asarray(out), feats @ k + b, rtol=1e-3,
                               atol=1e-5)


def test_squeeze_excitation(rng):
    emb = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
    out = SqueezeExcitationLayer(6).init_with_output(KEY, emb)[0]
    assert out.shape == (2, 6, 4)


def test_dice_train_eval(rng):
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    model = Dice(4)
    variables = model.init(KEY, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == x.shape
    # alpha = 0 at init: output = p*x; finite everywhere
    assert np.isfinite(np.asarray(out)).all()


def test_din_attention(rng):
    tgt = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    hist = jnp.asarray(rng.randn(3, 5, 8).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 2, (3, 5)))
    for softmax in (False, True):
        out = DIN_Attention(8, use_softmax=softmax).init_with_output(
            KEY, tgt, hist, mask)[0]
        assert out.shape == (3, 8)


def test_multihead_target_attention(rng):
    tgt = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    hist = jnp.asarray(rng.randn(3, 5, 8).astype(np.float32))
    out = MultiHeadTargetAttention(8, 8, num_heads=2).init_with_output(
        KEY, tgt, hist)[0]
    assert out.shape == (3, 8)
    out2 = MultiHeadTargetAttention(8, use_qkvo=False).init_with_output(
        KEY, tgt, hist)[0]
    assert out2.shape == (3, 8)


def test_k_max_pooling(rng):
    x = jnp.asarray([[3., 1., 4., 1., 5.]])
    out = k_max_pooling(x, 2, axis=1)
    # top-2 values kept in original order: 4 before 5
    np.testing.assert_array_equal(np.asarray(out), [[4., 5.]])


def test_fignn_shapes(rng):
    emb = jnp.asarray(rng.randn(2, 4, 6).astype(np.float32))
    for gru, res in [(True, True), (False, False)]:
        out = FiGNN_Layer(4, 6, gnn_layers=2, use_gru=gru,
                          use_residual=res).init_with_output(KEY, emb)[0]
        assert out.shape == (2, 4, 6)


def test_pet_layer_on_tiny_graph(rng):
    node_h = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    edge_h = jnp.asarray(rng.randn(6, 6).astype(np.float32))
    src = jnp.asarray([0, 1, 2, 3, 0, 2])
    dst = jnp.asarray([1, 0, 3, 2, 2, 0])
    model = PET_Layer(num_layers=2, in_feat=6, hidden_feat=6)
    (nh, eh), _ = model.init_with_output(KEY, node_h, edge_h, src, dst)
    assert nh.shape == (4, 6) and eh.shape == (6, 6)
    assert np.isfinite(np.asarray(nh)).all()


def test_apg_mlp_modes(rng):
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    # plain mode
    out = APGMLPLayer(6, output_dim=2, hidden_units=(8,)) \
        .init_with_output(KEY, x)[0]
    assert out.shape == (4, 2)
    # self-conditioned with low-rank decomposition
    meta = {"hidden_units": [4], "hidden_activations": "relu"}
    out = APGMLPLayer(6, output_dim=2, hidden_units=(8,),
                      condition_mode="self", decompose_ranks=2,
                      meta_net_configs=meta).init_with_output(KEY, x)[0]
    assert out.shape == (4, 2)
    # moe mode with mean aggregation
    conds = jnp.asarray(rng.randn(4, 3, 5).astype(np.float32))
    meta_moe = {"hidden_units": [4], "hidden_activations": "relu",
                "input_dim": 5, "num_experts": 3, "aggregation": "mean"}
    out = APGMLPLayer(6, output_dim=2, hidden_units=(8,),
                      condition_mode="moe", decompose_ranks=2,
                      meta_net_configs=meta_moe).init_with_output(
        KEY, x, conds)[0]
    assert out.shape == (4, 2)


def test_mlp_block_norm_placements(rng):
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    for ln, before in [(True, True), (True, False), (False, True)]:
        out = MLPBlock(6, hidden_units=(8, 8), output_dim=1, layer_norm=ln,
                       norm_before_activation=before).init_with_output(KEY, x)[0]
        assert out.shape == (4, 1)


def test_pet_graph_processor(rng):
    from rat_tpu.data.graph import PETGraphProcessor, batch_graphs
    X = np.array([[1, 2], [3, 2], [1, 5]])  # (1+K)=3 instances, F=2
    y = np.array([1.0, 0.0, 1.0])
    g = PETGraphProcessor.build_instance_graph(X, y)
    # target label masked to 2
    assert g["label"][0] == 2
    assert g["is_target"].sum() == 1
    assert g["is_instance"].sum() == 3
    # bidirectional edges: 2 * (3 instances * 2 fields)
    assert len(g["edge_src"]) == 12
    # feature nodes deduplicate (values 1,2 repeat)
    assert g["num_nodes"] == 3 + len(np.unique(X))
    b = batch_graphs([g, g])
    assert b["num_nodes"] == 2 * g["num_nodes"]
    assert b["edge_src"][len(g["edge_src"]):].min() >= g["num_nodes"]


def test_jaccard_similarity_oracle(rng):
    from rat_tpu.retrieval.similarity import jaccard_similarity
    u = np.array([[1, 2, 0], [3, 4, 5]])
    v = np.array([[1, 2, 3], [0, 0, 0]])
    sims = np.asarray(jaccard_similarity(u, v))
    # row0 vs row0: u valid {1,2}, v valid {1,2,3}: inter 2, union 2+3-2=3
    assert sims[0, 0] == pytest.approx(2 / (3 + 1e-3), rel=1e-4)
    # row1 vs row1: no valid v tokens -> intersection 0
    assert sims[1, 1] == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("b,heads,dh", [
    (512, 8, 10),   # the RAT regime (tiny dim_head, huge folded batch)
    (256, 4, 32),   # exactly on the dispatch boundary (dh<=32, b>=256)
    (255, 4, 32),   # one below the batch threshold (batch-major side)
    (256, 2, 33),   # one above the dim_head threshold (batch-major side)
])
def test_mhsa_batch_minor_matches_batch_major(rng, b, heads, dh):
    """The TPU batch-minor attention layout (picked for large folded
    batches with tiny dim_head) is numerically the same attention,
    including at the dispatch-boundary shapes where a checkpoint could
    cross layouts between train and eval batch sizes."""
    from rat_tpu.nn.layers import _mhsa_batch_major, _mhsa_batch_minor

    n = 6
    q, k, v = (jnp.asarray(rng.randn(b, n, heads * dh).astype(np.float32))
               for _ in range(3))
    scale = dh ** -0.5
    a = _mhsa_batch_major(q, k, v, heads, scale)
    c = _mhsa_batch_minor(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=1e-5, atol=1e-5)


def test_mhsa_layout_override_knob(rng, monkeypatch):
    """RAT_TPU_ATTN_LAYOUT pins one layout regardless of shape."""
    from rat_tpu.nn import layers

    b, n, heads, dh = 512, 6, 8, 10  # auto-dispatch picks batch-minor
    q, k, v = (jnp.asarray(rng.randn(b, n, heads * dh).astype(np.float32))
               for _ in range(3))
    scale = dh ** -0.5
    calls = []
    real = layers._mhsa_batch_major
    monkeypatch.setattr(layers, "_mhsa_batch_major",
                        lambda *a: calls.append(1) or real(*a))
    monkeypatch.setenv("RAT_TPU_ATTN_LAYOUT", "batch_major")
    out = layers._mhsa(q, k, v, heads, scale)
    assert calls, "override did not route to the batch-major kernel"
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(real(q, k, v, heads, scale)),
                               rtol=1e-6, atol=1e-6)


def test_torch_batchnorm_matches_torch_running_stats(rng):
    """TorchBatchNorm tracks the UNBIASED running variance like torch
    (flax's BatchNorm folds in the biased one) — KKBox/Tmall train with
    batch_norm on, so eval logits depend on this."""
    import jax
    import torch

    from rat_tpu.nn.layers import TorchBatchNorm

    x1 = rng.randn(32, 6).astype(np.float32)
    x2 = rng.randn(32, 6).astype(np.float32)
    bn = TorchBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    y1, mut = bn.apply(variables, jnp.asarray(x1), mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    y2, mut = bn.apply(variables, jnp.asarray(x2), mutable=["batch_stats"])
    stats = mut["batch_stats"]

    tbn = torch.nn.BatchNorm1d(6, eps=1e-5, momentum=0.1)
    tbn.train()
    ty1 = tbn(torch.from_numpy(x1))
    ty2 = tbn(torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(y1), ty1.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), ty2.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-6)

    tbn.eval()
    ye = TorchBatchNorm(use_running_average=True).apply(
        {"params": variables["params"], "batch_stats": stats},
        jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(ye),
                               tbn(torch.from_numpy(x1)).detach().numpy(),
                               atol=1e-5)
