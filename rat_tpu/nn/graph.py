"""Graph CTR layers.

JAX re-implementations of fuxictr/pytorch/layers/graph.py:31-160:

- FiGNN_Layer / GraphLayer: fully-connected field graph with attention
  adjacency, per-field in/out projections and an optional GRU cell. The
  reference's DGL dependency is unnecessary here — the field graph is a
  dense [F, F] adjacency, so message passing is a batched matmul (MXU-
  friendly).
- HypergraphLayer / PET_Layer: PET-style hypergraph message passing,
  re-expressed over padded edge lists with ``jax.ops.segment_sum``
  (functional edge_softmax) instead of DGL kernels.
"""

from itertools import product
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .initializers import xavier_normal


class GraphLayer(nn.Module):
    """Per-field in/out projections around adjacency aggregation
    (graph.py:91-103)."""
    num_fields: int
    embedding_dim: int

    @nn.compact
    def __call__(self, g, h):
        # g: [B, F, F] attention adjacency; h: [B, F, d]
        W_in = self.param("W_in", xavier_normal,
                          (self.num_fields, self.embedding_dim, self.embedding_dim))
        W_out = self.param("W_out", xavier_normal,
                           (self.num_fields, self.embedding_dim, self.embedding_dim))
        bias_p = self.param("bias_p", nn.initializers.zeros, (self.embedding_dim,))
        h_out = jnp.einsum("fde,bfe->bfd", W_out, h)
        aggr = jnp.einsum("bfg,bgd->bfd", g, h_out)
        return jnp.einsum("fde,bfe->bfd", W_in, aggr) + bias_p


class GRUCell(nn.Module):
    """torch.nn.GRUCell semantics (update/reset/new gates)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, x, h):
        zr_n_x = nn.Dense(3 * self.hidden_dim, kernel_init=xavier_normal,
                          name="ih")(x)
        zr_n_h = nn.Dense(3 * self.hidden_dim, kernel_init=xavier_normal,
                          name="hh")(h)
        xr, xz, xn = jnp.split(zr_n_x, 3, axis=-1)
        hr, hz, hn = jnp.split(zr_n_h, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = nn.tanh(xn + r * hn)
        return (1 - z) * n + z * h


class FiGNN_Layer(nn.Module):
    num_fields: int
    embedding_dim: int
    gnn_layers: int = 3
    reuse_graph_layer: bool = False
    use_gru: bool = True
    use_residual: bool = True

    @nn.compact
    def __call__(self, feature_emb):
        F_ = self.num_fields
        src, dst = zip(*list(product(range(F_), repeat=2)))
        src_emb = feature_emb[:, list(src), :]
        dst_emb = feature_emb[:, list(dst), :]
        concat_emb = jnp.concatenate([src_emb, dst_emb], axis=-1)
        alpha = nn.Dense(1, use_bias=False, kernel_init=xavier_normal,
                         name="W_attn")(concat_emb)
        alpha = nn.leaky_relu(alpha, negative_slope=0.01)
        alpha = alpha.reshape(-1, F_, F_)
        eye = jnp.eye(F_, dtype=bool)
        alpha = jnp.where(eye, -jnp.inf, alpha)
        g = nn.softmax(alpha, axis=-1)  # no self-loops

        if self.reuse_graph_layer:
            gnn = GraphLayer(F_, self.embedding_dim, name="gnn")
            gnns = [gnn] * self.gnn_layers
        else:
            gnns = [GraphLayer(F_, self.embedding_dim, name=f"gnn_{i}")
                    for i in range(self.gnn_layers)]
        gru = GRUCell(self.embedding_dim, name="gru") if self.use_gru else None

        h = feature_emb
        for i in range(self.gnn_layers):
            a = gnns[i](g, h)
            if gru is not None:
                B = h.shape[0]
                h = gru(a.reshape(-1, self.embedding_dim),
                        h.reshape(-1, self.embedding_dim))
                h = h.reshape(B, F_, self.embedding_dim)
            else:
                h = a + h
            if self.use_residual:
                h = h + feature_emb
        return h


def _edge_softmax(scores, dst, num_nodes):
    """Softmax of edge scores grouped by destination node
    (DGL edge_softmax equivalent)."""
    score_max = jax.ops.segment_max(scores, dst, num_segments=num_nodes)
    scores = jnp.exp(scores - score_max[dst])
    denom = jax.ops.segment_sum(scores, dst, num_segments=num_nodes)
    return scores / (denom[dst] + 1e-12)


class HypergraphLayer(nn.Module):
    """PET hypergraph attention step over an edge list
    (graph.py:106-136). node_h: [N, din], edge_h: [E, din],
    src/dst: [E] int."""
    in_feat: int
    hidden_feat: int

    @nn.compact
    def __call__(self, node_h, edge_h, src, dst):
        num_nodes = node_h.shape[0]
        src_messages = jnp.concatenate([node_h[src] * edge_h, node_h[src]], axis=1)
        Q = nn.Dense(self.hidden_feat, kernel_init=xavier_normal, name="Q")(node_h)
        K = nn.Dense(self.hidden_feat, kernel_init=xavier_normal, name="K")(src_messages)
        V = nn.Dense(self.hidden_feat, kernel_init=xavier_normal, name="V")(src_messages)
        alpha = Q[dst] * K                      # v_mul_e
        alpha = _edge_softmax(alpha, dst, num_nodes)
        V = alpha * V
        h_n = jax.ops.segment_sum(V, dst, num_segments=num_nodes)
        new_node_h = nn.Dense(self.hidden_feat, kernel_init=xavier_normal,
                              name="W")(jnp.concatenate([h_n, node_h], axis=1))
        new_edge_h = nn.Dense(self.hidden_feat, kernel_init=xavier_normal,
                              name="edge_W")(jnp.concatenate(
                                  [new_node_h[src], new_node_h[dst], edge_h], axis=1))
        return new_node_h, new_edge_h


class PET_Layer(nn.Module):
    """Stack of hypergraph layers with relu + shared layernorm + dropout
    between propagations (graph.py:139-160)."""
    num_layers: int
    in_feat: int
    hidden_feat: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, node_h, edge_h, src, dst, train: bool = False):
        ln = nn.LayerNorm(epsilon=1e-5, name="layernorm")
        for i in range(self.num_layers):
            layer = HypergraphLayer(
                self.in_feat if i == 0 else self.hidden_feat,
                self.hidden_feat, name=f"layer_{i}")
            node_h, edge_h = layer(node_h, edge_h, src, dst)
            node_h = nn.Dropout(rate=self.dropout, deterministic=not train)(
                ln(nn.relu(node_h)))
            edge_h = nn.Dropout(rate=self.dropout, deterministic=not train)(
                ln(nn.relu(edge_h)))
        return node_h, edge_h
