"""Attention / activation / sequence-pooling library components.

JAX re-implementations of:
- ScaledDotProductAttention, SqueezeExcitationLayer
  (fuxictr/pytorch/layers/attention.py:24-60)
- Dice activation (fuxictr/pytorch/layers/activation.py:20-29)
- DIN_Attention, MultiHeadTargetAttention
  (fuxictr/pytorch/layers/target_attention.py:25-121)
- KMaxPooling (fuxictr/pytorch/layers/sequence.py:43-50)

Library components: available to any CTR head built on the framework
(not consumed by the RAT variants themselves).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .initializers import xavier_normal
from .layers import MLPLayer, TorchBatchNorm


def scaled_dot_product_attention(Q, K, V, scale=None, mask=None,
                                 dropout_rate=0., deterministic=True,
                                 dropout_rng=None):
    """Returns (output, attention)."""
    scores = jnp.matmul(Q, jnp.swapaxes(K, -1, -2))
    if scale:
        scores = scores / scale
    if mask is not None:
        scores = jnp.where(mask == 0, -1.e9, scores)
    attention = nn.softmax(scores, axis=-1)
    if dropout_rate > 0 and not deterministic:
        import jax
        keep = jax.random.bernoulli(dropout_rng, 1 - dropout_rate,
                                    attention.shape)
        attention = jnp.where(keep, attention / (1 - dropout_rate), 0)
    return jnp.matmul(attention, V), attention


class SqueezeExcitationLayer(nn.Module):
    num_fields: int
    reduction_ratio: int = 3

    @nn.compact
    def __call__(self, feature_emb):
        reduced_size = max(1, int(self.num_fields / self.reduction_ratio))
        Z = jnp.mean(feature_emb, axis=-1)
        A = nn.relu(nn.Dense(reduced_size, use_bias=False,
                             kernel_init=xavier_normal)(Z))
        A = nn.relu(nn.Dense(self.num_fields, use_bias=False,
                             kernel_init=xavier_normal)(A))
        return feature_emb * A[..., None]


class Dice(nn.Module):
    """Data-adaptive activation; the BatchNorm is affine-free with
    torch's eps=1e-9, momentum 0.01 (activation.py:22-24)."""
    input_dim: int
    eps: float = 1e-9

    @nn.compact
    def __call__(self, X, train: bool = False):
        p = nn.sigmoid(TorchBatchNorm(use_running_average=not train,
                                      use_bias=False, use_scale=False,
                                      momentum=0.99, epsilon=self.eps)(X))
        alpha = self.param("alpha", nn.initializers.zeros, (self.input_dim,))
        return p * X + (1 - p) * alpha * X


class DIN_Attention(nn.Module):
    embedding_dim: int = 64
    attention_units: Sequence[int] = (32,)
    hidden_activations: str = "relu"
    output_activation: Optional[str] = None
    dropout_rate: float = 0
    batch_norm: bool = False
    use_softmax: bool = False

    @nn.compact
    def __call__(self, target_item, history_sequence, mask=None,
                 train: bool = False):
        seq_len = history_sequence.shape[1]
        target = jnp.broadcast_to(target_item[:, None, :],
                                  history_sequence.shape)
        attention_input = jnp.concatenate(
            [target, history_sequence, target - history_sequence,
             target * history_sequence], axis=-1)
        w = MLPLayer(input_dim=4 * self.embedding_dim, output_dim=1,
                     hidden_units=tuple(self.attention_units),
                     hidden_activations=self.hidden_activations,
                     output_activation=self.output_activation,
                     dropout_rates=self.dropout_rate,
                     batch_norm=self.batch_norm)(
            attention_input.reshape(-1, 4 * self.embedding_dim), train=train)
        w = w.reshape(-1, seq_len)
        if mask is not None:
            w = w * mask.astype(w.dtype)
        if self.use_softmax:
            if mask is not None:
                w = w + -1.e9 * (1 - mask.astype(w.dtype))
            w = nn.softmax(w, axis=-1)
        return jnp.sum(w[..., None] * history_sequence, axis=1)


class MultiHeadTargetAttention(nn.Module):
    input_dim: int = 64
    attention_dim: int = 64
    num_heads: int = 1
    dropout_rate: float = 0
    use_scale: bool = True
    use_qkvo: bool = True

    @nn.compact
    def __call__(self, target_item, history_sequence, mask=None):
        attention_dim = self.attention_dim if self.use_qkvo else self.input_dim
        assert attention_dim % self.num_heads == 0
        head_dim = attention_dim // self.num_heads
        scale = head_dim ** 0.5 if self.use_scale else None
        if self.use_qkvo:
            query = nn.Dense(attention_dim, use_bias=False,
                             kernel_init=xavier_normal, name="W_q")(target_item)
            key = nn.Dense(attention_dim, use_bias=False,
                           kernel_init=xavier_normal, name="W_k")(history_sequence)
            value = nn.Dense(attention_dim, use_bias=False,
                             kernel_init=xavier_normal, name="W_v")(history_sequence)
        else:
            query, key, value = target_item, history_sequence, history_sequence
        B = query.shape[0]
        query = query.reshape(B, 1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        key = key.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        value = value.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        if mask is not None:
            mask = mask.reshape(B, 1, 1, -1)  # broadcasts over heads/query
        out, _ = scaled_dot_product_attention(query, key, value, scale=scale,
                                              mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(-1, attention_dim)
        if self.use_qkvo:
            out = nn.Dense(self.input_dim, use_bias=False,
                           kernel_init=xavier_normal, name="W_o")(out)
        return out


def k_max_pooling(X, k, axis):
    """Top-k values along axis, kept in original order
    (sequence.py:43-50)."""
    import jax
    topk_idx = jax.lax.top_k(jnp.moveaxis(X, axis, -1), k)[1]
    topk_idx = jnp.sort(topk_idx, axis=-1)
    gathered = jnp.take_along_axis(jnp.moveaxis(X, axis, -1), topk_idx, axis=-1)
    return jnp.moveaxis(gathered, -1, axis)
