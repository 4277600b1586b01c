"""RAT encoder stacks over the (1+K) x (F+1) token grid.

- CrossIntraEncoder: the default RAT (m2) interleaved block — intra-
  sample attention over the F+1 feature tokens, cross-sample attention
  over the 1+K sample axis, then a feed-forward, each with residuals
  (RAT_m2.py:204-259). Note the FF has NO pre-norm in the reference.
- CrossIntraEncoderPA: RAT_PA (m3) parallel attention with a shared
  query projection, separate K/V per branch, branch outputs averaged,
  and heads HALVED per branch (``h = heads/2``, RAT_m3.py:181); the
  only residual is around the final FF (RAT_m3.py:220-242).
- JointEncoder: RAT_JM (m0) — flatten the grid to one sequence and run
  a standard pre-norm Transformer (RAT_m0.py:123-128).
- CascadeEncoder: RAT_CE (m1) — intra transformer per sample, take each
  sample's CLS, cross transformer over the 1+K CLS tokens
  (RAT_m1.py:119-129).

All blocks fold the batch into the leading dim ((b t) s d / (b s) t d)
exactly like the reference so XLA sees large flat batched matmuls.
"""

import flax.linen as nn
import jax.numpy as jnp

from .initializers import xavier_normal
from .layers import (FeedForward, PreNormAttention, Transformer, _mhsa)


class CrossIntraEncoderBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float = 0.
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, s, d = x.shape
        h = x.reshape(b * t, s, d)
        h = PreNormAttention(self.dim, self.num_heads, self.head_dim,
                             self.p_dropout, name="intra_attention")(
            h, train=train) + h
        h = h.reshape(b, t, s, d).transpose(0, 2, 1, 3).reshape(b * s, t, d)
        h = PreNormAttention(self.dim, self.num_heads, self.head_dim,
                             self.p_dropout, name="cross_attention")(
            h, train=train) + h
        # plain FF residual, no pre-norm (RAT_m2.py:217,232)
        h = FeedForward(self.dim, self.hidden_dim, name="mlp")(h, train=train) + h
        return h.reshape(b, s, t, d).transpose(0, 2, 1, 3)


class CrossIntraEncoder(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float
    depth: int
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            x = CrossIntraEncoderBlock(self.dim, self.num_heads, self.head_dim,
                                       self.p_dropout, self.hidden_dim)(x, train=train)
        return x


class _SharedQAttention(nn.Module):
    """One PA branch: pre-norm, shared-Q + branch K/V, halved heads."""
    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, w_q, train: bool = False):
        inner_dim = self.num_heads * self.head_dim
        # quirk preserved: each branch runs heads/2 heads of width
        # inner_dim/(heads/2), but scales by head_dim**-0.5 (RAT_m3.py:173,181)
        h = self.num_heads // 2
        project_out = not (self.num_heads == 1 and self.head_dim == self.dim)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        q = x @ w_q
        k = nn.Dense(inner_dim, use_bias=False, kernel_init=xavier_normal,
                     name="W_k")(x)
        v = nn.Dense(inner_dim, use_bias=False, kernel_init=xavier_normal,
                     name="W_v")(x)
        out = _mhsa(q, k, v, h, self.head_dim ** -0.5)
        if project_out:
            out = nn.Dense(self.dim, kernel_init=xavier_normal, name="to_out")(out)
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out


class CrossIntraEncoderBlockPA(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float = 0.
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_heads >= 2, "RAT_PA halves the head count per branch"
        b, n, s, d = x.shape
        inner_dim = self.num_heads * self.head_dim
        w_q = self.param("W_q", xavier_normal, (d, inner_dim))
        out_s = _SharedQAttention(self.dim, self.num_heads, self.head_dim,
                                  self.p_dropout, name="intra_attention")(
            x.reshape(b * n, s, d), w_q, train=train).reshape(b, n, s, d)
        out_t = _SharedQAttention(self.dim, self.num_heads, self.head_dim,
                                  self.p_dropout, name="cross_attention")(
            x.transpose(0, 2, 1, 3).reshape(b * s, n, d), w_q,
            train=train).reshape(b, s, n, d).transpose(0, 2, 1, 3)
        out = (out_s + out_t) / 2.0
        # sole residual: around the FF, back to the block input (RAT_m3.py:240)
        return FeedForward(self.dim, self.hidden_dim, name="mlp")(
            out, train=train) + x


class CrossIntraEncoderPA(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float
    depth: int
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            x = CrossIntraEncoderBlockPA(self.dim, self.num_heads, self.head_dim,
                                         self.p_dropout, self.hidden_dim)(x, train=train)
        return x


class JointEncoder(nn.Module):
    """RAT_JM: one flat sequence over the whole grid."""
    dim: int
    depth: int
    num_heads: int
    head_dim: int
    mlp_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, s, d = x.shape
        h = x.reshape(b, t * s, d)
        h = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                        self.mlp_dim, self.dropout, name="encoder")(h, train=train)
        return h.reshape(b, t, s, d)


class CascadeEncoder(nn.Module):
    """RAT_CE: intra transformer -> per-sample CLS -> cross transformer."""
    dim: int
    depth: int
    num_heads: int
    head_dim: int
    mlp_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, s, d = x.shape
        h = x.reshape(b * t, s, d)
        h = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                        self.mlp_dim, self.dropout, name="intra_transformer")(
            h, train=train)
        cls = h[:, 0].reshape(b, t, d)
        cls = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                          self.mlp_dim, self.dropout, name="cross_transformer")(
            cls, train=train)
        return cls  # [b, 1+K, d]
