"""Core NN layers: MLP tower, LR (wide) tower, transformer primitives.

References:
- MLP_Layer: fuxictr/pytorch/layers/deep.py:108-141
- LR_Layer:  fuxictr/pytorch/layers/shallow.py:23-45
- PreNorm / FeedForward / Attention / Transformer:
  fuxictr/pytorch/models/RAT_m0.py:142-208 (identical copies live in
  RAT_m1/RAT_m2).

Parity notes:
- GELU is the exact (erf) variant, torch's nn.GELU default;
- LayerNorm eps 1e-5 (torch default);
- attention scale is ``dim_head ** -0.5`` regardless of the actual
  per-head width (RAT_m0.py:170), and the output projection collapses
  to identity when ``heads == 1 and dim_head == dim`` (RAT_m0.py:167).
"""

import os
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .embedding import EmbeddingSpec, PackedEmbedding
from .initializers import xavier_normal


def get_activation(name):
    name = name.lower() if isinstance(name, str) else name
    if callable(name):
        return name
    if name == "relu":
        return nn.relu
    if name == "sigmoid":
        return nn.sigmoid
    if name == "tanh":
        return nn.tanh
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise NotImplementedError("activation={}".format(name))


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-parity running statistics.

    flax's ``nn.BatchNorm`` folds the BIASED batch variance into the
    running average; torch normalizes with the biased variance but
    tracks the UNBIASED one (factor n/(n-1)). KKBox/Tmall configs train
    with batch_norm on, so eval-time logits depend on this. ``momentum``
    is the flax-style decay of the running average (torch momentum m
    corresponds to decay 1-m).
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (feat,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (feat,))
        return y


class MLPLayer(nn.Module):
    """Dense tower: [Linear, BatchNorm?, act, dropout?]* + output Linear."""
    input_dim: int
    output_dim: Optional[int] = None
    hidden_units: Sequence[int] = ()
    hidden_activations: str = "relu"
    output_activation: Optional[str] = None
    dropout_rates: float = 0.0
    batch_norm: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.hidden_units)
        drops = self.dropout_rates
        if not isinstance(drops, (list, tuple)):
            drops = [drops] * len(self.hidden_units)
        for i, units in enumerate(self.hidden_units):
            x = nn.Dense(units, use_bias=self.use_bias,
                         kernel_init=xavier_normal)(x)
            if self.batch_norm:
                x = TorchBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5)(x)
            x = get_activation(acts[i])(x)
            if drops[i] > 0:
                x = nn.Dropout(rate=drops[i], deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias,
                         kernel_init=xavier_normal)(x)
        if self.output_activation is not None:
            x = get_activation(self.output_activation)(x)
        return x


class LRLayer(nn.Module):
    """Wide/LR tower via the 1-dim-embedding one-hot trick.

    For a retrieval grid input [B, 1+K, F] the per-sample logits are
    aggregated with ``retrieval_aggregation`` (default mean,
    shallow.py:36-45).
    """
    spec: EmbeddingSpec
    use_bias: bool = True
    retrieval_aggregation: str = "mean"

    @nn.compact
    def __call__(self, X_tokens, X_numeric=None):
        weights = PackedEmbedding(self.spec, 1, name="embedding_layer")(
            X_tokens, X_numeric)                       # [..., F, 1]
        output = jnp.sum(weights, axis=-2)             # [..., 1]
        if X_tokens.ndim == 3:
            if self.retrieval_aggregation == "mean":
                output = jnp.mean(output, axis=1)
            elif self.retrieval_aggregation == "sum":
                output = jnp.sum(output, axis=1)
            else:
                raise NotImplementedError(self.retrieval_aggregation)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (1,))
            output = output + bias
        return output


class FMLayer(nn.Module):
    """Factorization machine: LR term + pairwise inner-product pooling
    (shallow.py:48-66)."""
    spec: EmbeddingSpec
    use_bias: bool = True
    lr_retrieval_aggregation: str = "mean"

    @nn.compact
    def __call__(self, X_tokens, feature_emb, X_numeric=None):
        from .interaction import InnerProductLayer
        lr_out = LRLayer(self.spec, use_bias=self.use_bias,
                         retrieval_aggregation=self.lr_retrieval_aggregation,
                         name="lr_layer")(X_tokens, X_numeric)
        dot_sum = InnerProductLayer(output="product_sum_pooling")(feature_emb)
        return dot_sum + lr_out


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_normal)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, kernel_init=xavier_normal)(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class PreNorm(nn.Module):
    fn: Callable

    @nn.compact
    def __call__(self, x, **kwargs):
        return self.fn(nn.LayerNorm(epsilon=1e-5)(x), **kwargs)


class PreNormAttention(nn.Module):
    """LayerNorm -> Attention, with the attention params nested inside
    this module (predictable parameter paths)."""
    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        xn = nn.LayerNorm(epsilon=1e-5)(x)
        return Attention(self.dim, heads=self.heads, dim_head=self.dim_head,
                         dropout=self.dropout)(xn, train=train)


class PreNormFeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        xn = nn.LayerNorm(epsilon=1e-5)(x)
        return FeedForward(self.dim, self.hidden_dim,
                           dropout=self.dropout)(xn, train=train)


def _mhsa_batch_major(q, k, v, heads, scale):
    """Textbook [b, h, n, dh] einsum attention."""
    b, n, inner = q.shape
    dh = inner // heads
    q = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, inner)


def _mhsa_batch_minor(q, k, v, heads, scale):
    """Same math, laid out batch-MINOR for the RAT regime (tiny token
    count n, tiny dim_head, huge folded batch).

    XLA:TPU tiles the last two logical dims to (8, 128); the textbook
    [b, h, n, dh] / [b, h, i, j] layouts put (n, dh)=(6, 10) or
    (i, j)=(6, 6) in the tile, padding every attention temporary 17-28x
    (measured: the KKBox-shaped train step OOMs at 39 GB for ~2 GB of
    real data). Keeping b in the lane dimension makes the padding
    factor <2x. The contractions are written as broadcast-multiply-
    reduce on purpose: a dot_general with b as a batch dim would be
    relayouted back to batch-major by the dot lowering.
    """
    b, n, inner = q.shape
    dh = inner // heads

    def to_hndb(t):
        return t.reshape(b, n, heads, dh).transpose(2, 1, 3, 0)

    qT, kT, vT = to_hndb(q), to_hndb(k), to_hndb(v)      # [h, n, dh, b]
    dots = jnp.sum(qT[:, :, None] * kT[:, None], axis=3) * scale  # [h,i,j,b]
    attn = nn.softmax(dots, axis=2)
    out = jnp.sum(attn[:, :, :, None] * vT[:, None], axis=2)      # [h,i,dh,b]
    return out.transpose(3, 1, 0, 2).reshape(b, n, inner)


def _mhsa(q, k, v, heads, scale):
    """[b, n, h*dh] tensors -> multi-head attention output [b, n, h*dh].

    Dispatches on shape: the batch-minor layout wins whenever dim_head
    is far below the 128-lane tile and the folded batch is large enough
    to fill lanes; otherwise the textbook batched-matmul form (which
    uses the MXU) is better. The two layouts reassociate float sums
    differently, so a checkpoint evaluated at batch sizes straddling
    the b>=256 boundary can produce last-ulp-different logits;
    RAT_TPU_ATTN_LAYOUT=batch_major|batch_minor pins one layout for
    bit-reproducibility across batch sizes.
    """
    forced = os.environ.get("RAT_TPU_ATTN_LAYOUT", "auto")
    if forced == "batch_major":
        return _mhsa_batch_major(q, k, v, heads, scale)
    if forced == "batch_minor":
        return _mhsa_batch_minor(q, k, v, heads, scale)
    b, n, inner = q.shape
    dh = inner // heads
    if dh <= 32 and b >= 256:
        return _mhsa_batch_minor(q, k, v, heads, scale)
    return _mhsa_batch_major(q, k, v, heads, scale)


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (RAT_m0.py:163-191)."""
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner_dim = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        qkv = nn.Dense(inner_dim * 3, use_bias=False,
                       kernel_init=xavier_normal, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _mhsa(q, k, v, self.heads, self.dim_head ** -0.5)
        if project_out:
            out = nn.Dense(self.dim, kernel_init=xavier_normal, name="to_out")(out)
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out


class Transformer(nn.Module):
    """Pre-norm transformer with a final LayerNorm (RAT_m0.py:193-208)."""
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = PreNormAttention(self.dim, self.heads, self.dim_head,
                                 self.dropout, name=f"attn_{i}")(
                x, train=train) + x
            x = PreNormFeedForward(self.dim, self.mlp_dim, self.dropout,
                                   name=f"ff_{i}")(x, train=train) + x
        return nn.LayerNorm(epsilon=1e-5)(x)
