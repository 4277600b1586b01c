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

The default ("stream") blocks fold the batch into the leading dim
((b t) s d / (b s) t d) exactly like the reference so XLA sees large
flat batched matmuls. RAT_TPU_ENCODER_IMPL=grid_minor selects an
alternative m2 implementation with the identical parameter tree that
keeps the stream in one fixed [t, s, d, b] layout end to end (batch in
the lane dimension): intra vs cross attention differ only in which
axis the contraction runs over, every op is a broadcast-multiply-
reduce, and the stream is never transposed between blocks — one entry
and one exit transpose replace the ~10 layout-change copies per block
that the stream form pays (2026-08 xplane trace: those copies are what
a degraded-worker mode taxes ~30x; scripts/gm_encoder_ab.py measures
the A/B).
"""

import os

import flax.linen as nn
import jax.numpy as jnp

from .initializers import xavier_normal
from .layers import (FeedForward, PreNormAttention, Transformer, _mhsa)


def _contract_channels(x, kernel, split=None):
    """x [t, s, d, b] x kernel [d, f] -> [t, s, f, b] (or
    [t, s, *split, b] with the kernel pre-reshaped to (d, *split)),
    batch kept minor, as a fused multiply-reduce."""
    if split:
        k = kernel.reshape((x.shape[2],) + tuple(split))
        xe = x[:, :, :, *([None] * len(split)), :]
        return jnp.sum(xe * k[..., None], axis=2)
    return jnp.sum(x[:, :, :, None, :] * kernel[:, :, None], axis=2)


class _GMDense(nn.Module):
    """nn.Dense param twin (kernel [in, features] + optional bias)
    applied to a batch-minor tensor as a fused multiply-reduce — a
    dot_general here would be relayouted to batch-major by the dot
    lowering (see layers._mhsa_batch_minor).

    split=None:      x [t, s, d, b]       -> [t, s, features, b]
    split=(...,):    x [t, s, d, b]       -> [t, s, *split, b]
                     (kernel pre-reshaped; no head-split reshape of the
                     wide activation; e.g. (3, h, c) for fused QKV or
                     (h, c) for a single projection)
    merge=(h, c):    x [t, s, h, c, b]    -> [t, s, features, b]
                     (contracts heads and head-dim in one reduce)"""
    features: int
    use_bias: bool = True
    split: tuple = None
    merge: tuple = None

    @nn.compact
    def __call__(self, x):
        if self.merge:
            in_dim = self.merge[0] * self.merge[1]
            kernel = self.param("kernel", xavier_normal,
                                (in_dim, self.features))
            k = kernel.reshape(self.merge + (self.features,))   # [h, c, f]
            y = jnp.sum(x[:, :, :, :, None, :] * k[:, :, :, None],
                        axis=(2, 3))                             # [t,s,f,b]
        else:
            kernel = self.param("kernel", xavier_normal,
                                (x.shape[2], self.features))
            y = _contract_channels(x, kernel, self.split)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))[:, None]
        return y


def _gm_attention_core(q, k, v, scale, over_t):
    """Softmax attention on [t, s, h, c, b] tensors over the t axis
    (over_t, 'cross') or the s axis ('intra'); every contraction a
    broadcast-multiply-reduce with batch minor."""
    if over_t:
        dots = jnp.sum(q[:, None] * k[None], axis=4) * scale  # [i,j,s,h,b]
        attn = nn.softmax(dots, axis=1)
        return jnp.sum(attn[:, :, :, :, None, :] * v[None], axis=1)
    dots = jnp.sum(q[:, :, None] * k[:, None], axis=4) * scale  # [t,i,j,h,b]
    attn = nn.softmax(dots, axis=2)
    return jnp.sum(attn[:, :, :, :, None, :] * v[:, None], axis=2)


class _GMAttention(nn.Module):
    """Attention param twin on [t, s, d, b]: MHSA over the t axis
    (over_t, 'cross') or the s axis ('intra'), batch kept minor through
    every contraction."""
    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.
    over_t: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        qkv = _GMDense(inner * 3, use_bias=False,
                       split=(3, self.heads, self.dim_head),
                       name="to_qkv")(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [t,s,h,c,b]
        out = _gm_attention_core(q, k, v, self.dim_head ** -0.5,
                                 self.over_t)
        if project_out:                                     # [t,s,h,c,b]
            out = _GMDense(self.dim, merge=(self.heads, self.dim_head),
                           name="to_out")(out)
            out = nn.Dropout(rate=self.dropout,
                             deterministic=not train)(out)
        else:
            t, s = out.shape[0], out.shape[1]
            out = out.reshape(t, s, inner, out.shape[-1])
        return out


class _GMPreNormAttention(nn.Module):
    """PreNormAttention param twin on [t, s, d, b] (channel axis 2)."""
    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.
    over_t: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        xn = nn.LayerNorm(epsilon=1e-5, reduction_axes=2, feature_axes=2,
                          name="LayerNorm_0")(x)
        return _GMAttention(self.dim, self.heads, self.dim_head,
                            self.dropout, self.over_t,
                            name="Attention_0")(xn, train=train)


class _GMFeedForward(nn.Module):
    """FeedForward param twin on [t, s, d, b]."""
    dim: int
    hidden_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _GMDense(self.hidden_dim, name="Dense_0")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = _GMDense(self.dim, name="Dense_1")(h)
        return nn.Dropout(rate=self.dropout, deterministic=not train)(h)


class _GMPreNormFeedForward(nn.Module):
    """PreNormFeedForward param twin on [t, s, d, b]."""
    dim: int
    hidden_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        xn = nn.LayerNorm(epsilon=1e-5, reduction_axes=2, feature_axes=2,
                          name="LayerNorm_0")(x)
        return _GMFeedForward(self.dim, self.hidden_dim, self.dropout,
                              name="FeedForward_0")(xn, train=train)


class _GMTransformer(nn.Module):
    """Transformer param twin on [t, s, d, b]: pre-norm blocks + final
    LayerNorm, attention over the t axis (over_t) or the s axis."""
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.
    over_t: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = _GMPreNormAttention(self.dim, self.heads, self.dim_head,
                                    self.dropout, self.over_t,
                                    name=f"attn_{i}")(x, train=train) + x
            x = _GMPreNormFeedForward(self.dim, self.mlp_dim, self.dropout,
                                      name=f"ff_{i}")(x, train=train) + x
        return nn.LayerNorm(epsilon=1e-5, reduction_axes=2, feature_axes=2,
                            name="LayerNorm_0")(x)


class _GMSharedQAttention(nn.Module):
    """_SharedQAttention param twin on [t, s, d, b]: pre-norm, shared-Q
    (external w_q) + branch K/V, heads halved to h = num_heads/2 of
    width 2*head_dim, scale still head_dim**-0.5 (the RAT_m3.py:173,181
    quirk, preserved)."""
    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.
    over_t: bool = False

    @nn.compact
    def __call__(self, x, w_q, train: bool = False):
        inner = self.num_heads * self.head_dim
        h = self.num_heads // 2
        c = inner // h
        project_out = not (self.num_heads == 1 and self.head_dim == self.dim)
        xn = nn.LayerNorm(epsilon=1e-5, reduction_axes=2, feature_axes=2,
                          name="LayerNorm_0")(x)
        q = _contract_channels(xn, w_q, (h, c))             # [t,s,h,c,b]
        k = _GMDense(inner, use_bias=False, split=(h, c), name="W_k")(xn)
        v = _GMDense(inner, use_bias=False, split=(h, c), name="W_v")(xn)
        out = _gm_attention_core(q, k, v, self.head_dim ** -0.5,
                                 self.over_t)
        if project_out:
            out = _GMDense(self.dim, merge=(h, c), name="to_out")(out)
            out = nn.Dropout(rate=self.dropout,
                             deterministic=not train)(out)
        else:
            t, s = out.shape[0], out.shape[1]
            out = out.reshape(t, s, inner, out.shape[-1])
        return out


class _GMCrossIntraBlockPA(nn.Module):
    """CrossIntraEncoderBlockPA param twin on the fixed [t, s, d, b]
    layout: both branches read the same tensor — no stream transposes."""
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float = 0.
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_heads >= 2, "RAT_PA halves the head count per branch"
        d = x.shape[2]
        inner = self.num_heads * self.head_dim
        w_q = self.param("W_q", xavier_normal, (d, inner))
        out_s = _GMSharedQAttention(self.dim, self.num_heads, self.head_dim,
                                    self.p_dropout, over_t=False,
                                    name="intra_attention")(x, w_q,
                                                            train=train)
        out_t = _GMSharedQAttention(self.dim, self.num_heads, self.head_dim,
                                    self.p_dropout, over_t=True,
                                    name="cross_attention")(x, w_q,
                                                            train=train)
        out = (out_s + out_t) / 2.0
        # sole residual: around the FF, back to the block input (RAT_m3.py:240)
        return _GMFeedForward(self.dim, self.hidden_dim,
                              name="mlp")(out, train=train) + x


class _GMCrossIntraBlock(nn.Module):
    """CrossIntraEncoderBlock param twin on the fixed [t, s, d, b]
    layout: no stream transposes between intra and cross attention —
    the two differ only in the contraction axis."""
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float = 0.
    hidden_dim: int = None

    @nn.compact
    def __call__(self, h, train: bool = False):
        h = _GMPreNormAttention(self.dim, self.num_heads, self.head_dim,
                                self.p_dropout, over_t=False,
                                name="intra_attention")(h, train=train) + h
        h = _GMPreNormAttention(self.dim, self.num_heads, self.head_dim,
                                self.p_dropout, over_t=True,
                                name="cross_attention")(h, train=train) + h
        # plain FF residual, no pre-norm (RAT_m2.py:217,232)
        return _GMFeedForward(self.dim, self.hidden_dim,
                              name="mlp")(h, train=train) + h


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
    """impl: 'stream' (reference-shaped folds), 'grid_minor' (fixed
    batch-minor layout, see module docstring), or 'env' (read
    RAT_TPU_ENCODER_IMPL at trace time; default stream). The trainer
    resolves encoder_impl='auto' by probing both on the attached
    accelerator (engine/trainer.py). With dropout > 0 the two impls
    draw masks in different tensor layouts — same distribution,
    different realization."""
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float
    depth: int
    hidden_dim: int = None
    impl: str = "env"

    @nn.compact
    def __call__(self, x, train: bool = False):
        impl = self.impl
        if impl == "env":
            impl = os.environ.get("RAT_TPU_ENCODER_IMPL", "stream")
        if impl == "grid_minor":
            # identical parameter tree (explicit twin names), identical
            # math (parity-tested); only the layout schedule differs.
            # One entry + one exit transpose for the whole stack.
            h = jnp.transpose(x, (1, 2, 3, 0))
            for i in range(self.depth):
                h = _GMCrossIntraBlock(
                    self.dim, self.num_heads, self.head_dim,
                    self.p_dropout, self.hidden_dim,
                    name=f"CrossIntraEncoderBlock_{i}")(h, train=train)
            return jnp.transpose(h, (3, 0, 1, 2))
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
    """impl: see CrossIntraEncoder — same 'stream'/'grid_minor'/'env'
    contract for the PA (m3) stack."""
    dim: int
    num_heads: int
    head_dim: int
    p_dropout: float
    depth: int
    hidden_dim: int = None
    impl: str = "env"

    @nn.compact
    def __call__(self, x, train: bool = False):
        impl = self.impl
        if impl == "env":
            impl = os.environ.get("RAT_TPU_ENCODER_IMPL", "stream")
        if impl == "grid_minor":
            h = jnp.transpose(x, (1, 2, 3, 0))
            for i in range(self.depth):
                h = _GMCrossIntraBlockPA(
                    self.dim, self.num_heads, self.head_dim,
                    self.p_dropout, self.hidden_dim,
                    name=f"CrossIntraEncoderBlockPA_{i}")(h, train=train)
            return jnp.transpose(h, (3, 0, 1, 2))
        for _ in range(self.depth):
            x = CrossIntraEncoderBlockPA(self.dim, self.num_heads, self.head_dim,
                                         self.p_dropout, self.hidden_dim)(x, train=train)
        return x


class JointEncoder(nn.Module):
    """RAT_JM: one flat sequence over the whole grid. impl: see
    CrossIntraEncoder (the grid-minor twin runs the flat sequence as
    [t*s, 1, d, b] with attention over axis 0)."""
    dim: int
    depth: int
    num_heads: int
    head_dim: int
    mlp_dim: int
    dropout: float = 0.
    impl: str = "env"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, s, d = x.shape
        impl = self.impl
        if impl == "env":
            impl = os.environ.get("RAT_TPU_ENCODER_IMPL", "stream")
        if impl == "grid_minor":
            h = jnp.transpose(x, (1, 2, 3, 0)).reshape(t * s, 1, d, b)
            h = _GMTransformer(self.dim, self.depth, self.num_heads,
                               self.head_dim, self.mlp_dim, self.dropout,
                               over_t=True, name="encoder")(h, train=train)
            return jnp.transpose(h.reshape(t, s, d, b), (3, 0, 1, 2))
        h = x.reshape(b, t * s, d)
        h = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                        self.mlp_dim, self.dropout, name="encoder")(h, train=train)
        return h.reshape(b, t, s, d)


class CascadeEncoder(nn.Module):
    """RAT_CE: intra transformer -> per-sample CLS -> cross transformer.
    impl: see CrossIntraEncoder (the grid-minor twin attends over the s
    axis, slices CLS, then runs the CLS sequence as [t, 1, d, b])."""
    dim: int
    depth: int
    num_heads: int
    head_dim: int
    mlp_dim: int
    dropout: float = 0.
    impl: str = "env"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, s, d = x.shape
        impl = self.impl
        if impl == "env":
            impl = os.environ.get("RAT_TPU_ENCODER_IMPL", "stream")
        if impl == "grid_minor":
            h = jnp.transpose(x, (1, 2, 3, 0))                   # [t,s,d,b]
            h = _GMTransformer(self.dim, self.depth, self.num_heads,
                               self.head_dim, self.mlp_dim, self.dropout,
                               over_t=False,
                               name="intra_transformer")(h, train=train)
            cls = h[:, 0:1]                                      # [t,1,d,b]
            cls = _GMTransformer(self.dim, self.depth, self.num_heads,
                                 self.head_dim, self.mlp_dim, self.dropout,
                                 over_t=True,
                                 name="cross_transformer")(cls, train=train)
            return jnp.transpose(cls[:, 0], (2, 0, 1))           # [b,1+K,d]
        h = x.reshape(b * t, s, d)
        h = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                        self.mlp_dim, self.dropout, name="intra_transformer")(
            h, train=train)
        cls = h[:, 0].reshape(b, t, d)
        cls = Transformer(self.dim, self.depth, self.num_heads, self.head_dim,
                          self.mlp_dim, self.dropout, name="cross_transformer")(
            cls, train=train)
        return cls  # [b, 1+K, d]
