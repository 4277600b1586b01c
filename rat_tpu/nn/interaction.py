"""Feature-interaction layer library.

JAX re-implementations of the reference's interaction primitives
(fuxictr/pytorch/layers/interaction.py:23-231). These are library
components of the framework (usable by any CTR head); the RAT variants
themselves only consume InnerProductLayer indirectly through FM.
"""

from itertools import combinations
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .initializers import xavier_normal
from .layers import TorchBatchNorm


class InnerProductLayer(nn.Module):
    """Pairwise inner products with 4 output modes
    (interaction.py:23-61)."""
    num_fields: Optional[int] = None
    output: str = "product_sum_pooling"

    @nn.compact
    def __call__(self, feature_emb):
        # feature_emb: [B, F, d]
        if self.output in ("product_sum_pooling", "Bi_interaction_pooling"):
            sum_of_square = jnp.sum(feature_emb, axis=-2) ** 2
            square_of_sum = jnp.sum(feature_emb ** 2, axis=-2)
            bi = (sum_of_square - square_of_sum) * 0.5
            if self.output == "Bi_interaction_pooling":
                return bi
            return jnp.sum(bi, axis=-1, keepdims=True)
        elif self.output == "elementwise_product":
            assert self.num_fields is not None
            p, q = zip(*combinations(range(self.num_fields), 2))
            return feature_emb[:, list(p)] * feature_emb[:, list(q)]
        elif self.output == "inner_product":
            assert self.num_fields is not None
            p, q = zip(*combinations(range(self.num_fields), 2))
            return jnp.sum(feature_emb[:, list(p)] * feature_emb[:, list(q)],
                           axis=-1)
        raise ValueError("output={} is not supported.".format(self.output))


class BilinearInteractionLayer(nn.Module):
    """FiBiNET bilinear interactions (interaction.py:64-90)."""
    num_fields: int
    embedding_dim: int
    bilinear_type: str = "field_interaction"

    @nn.compact
    def __call__(self, feature_emb):
        d = self.embedding_dim
        pairs = list(combinations(range(self.num_fields), 2))
        if self.bilinear_type == "field_all":
            W = self.param("W", xavier_normal, (d, d))
            left = jnp.einsum("bfd,de->bfe", feature_emb, W)
            out = [left[:, i] * feature_emb[:, j] for i, j in pairs]
        elif self.bilinear_type == "field_each":
            W = self.param("W", xavier_normal, (self.num_fields * d, d)) \
                .reshape(self.num_fields, d, d)
            out = [jnp.einsum("bd,de->be", feature_emb[:, i], W[i]) *
                   feature_emb[:, j] for i, j in pairs]
        elif self.bilinear_type == "field_interaction":
            W = self.param("W", xavier_normal, (len(pairs) * d, d)) \
                .reshape(len(pairs), d, d)
            out = [jnp.einsum("bd,de->be", feature_emb[:, i], W[k]) *
                   feature_emb[:, j] for k, (i, j) in enumerate(pairs)]
        else:
            raise NotImplementedError(self.bilinear_type)
        return jnp.stack(out, axis=1)


class HolographicInteractionLayer(nn.Module):
    """Holographic interactions via circular correlation (FFT)
    (interaction.py:93-125)."""
    num_fields: int
    interaction_type: str = "circular_convolution"

    @nn.compact
    def __call__(self, feature_emb):
        p, q = zip(*combinations(range(self.num_fields), 2))
        emb1 = feature_emb[:, list(p)]
        emb2 = feature_emb[:, list(q)]
        if self.interaction_type == "hadamard_product":
            return emb1 * emb2
        elif self.interaction_type == "circular_convolution":
            f1 = jnp.fft.rfft(emb1)
            f2 = jnp.fft.rfft(emb2)
            return jnp.fft.irfft(f1 * f2, n=emb1.shape[-1])
        elif self.interaction_type == "circular_correlation":
            f1 = jnp.conj(jnp.fft.rfft(emb1))
            f2 = jnp.fft.rfft(emb2)
            return jnp.fft.irfft(f1 * f2, n=emb1.shape[-1])
        raise ValueError("interaction_type={} is not supported."
                         .format(self.interaction_type))


class CrossInteractionLayer(nn.Module):
    """One DCN cross step: x0 * (w.x_i) + b (interaction.py:141-150)."""
    input_dim: int

    @nn.compact
    def __call__(self, X_0, X_i):
        w = self.param("weight", xavier_normal, (self.input_dim, 1))
        b = self.param("bias", nn.initializers.zeros, (self.input_dim,))
        return X_0 * (X_i @ w) + b


class CrossNet(nn.Module):
    """DCN cross network (interaction.py:128-138)."""
    input_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, X_0):
        X_i = X_0
        for i in range(self.num_layers):
            X_i = X_i + CrossInteractionLayer(self.input_dim)(X_0, X_i)
        return X_i


class CompressedInteractionNet(nn.Module):
    """xDeepFM CIN (interaction.py:153-180)."""
    num_fields: int
    cin_layer_units: Sequence[int]
    output_dim: int = 1

    @nn.compact
    def __call__(self, feature_emb):
        pooling_outputs = []
        X_0 = feature_emb  # [B, F, d]
        X_i = X_0
        for i, units in enumerate(self.cin_layer_units):
            hadamard = jnp.einsum("bhd,bmd->bhmd", X_i, X_0)
            B, H, M, d = hadamard.shape
            flat = hadamard.reshape(B, H * M, d)
            # 1x1 conv over the H*M axis == dense mixing per output channel
            W = self.param(f"cin_w{i}", xavier_normal, (H * M, units))
            X_i = jnp.einsum("bnd,nu->bud", flat, W)
            pooling_outputs.append(jnp.sum(X_i, axis=-1))
        concat = jnp.concatenate(pooling_outputs, axis=-1)
        return nn.Dense(self.output_dim, kernel_init=xavier_normal,
                        name="fc")(concat)


class InteractionMachine(nn.Module):
    """IM higher-order interactions via power sums
    (interaction.py:183-231)."""
    embedding_dim: int
    order: int = 2
    batch_norm: bool = False

    @nn.compact
    def __call__(self, feature_emb, train: bool = False):
        assert 1 <= self.order <= 5, \
            "order={} is not supported.".format(self.order)
        out = []
        p1 = jnp.sum(feature_emb, axis=1)
        out.append(p1)
        if self.order >= 2:
            p2 = jnp.sum(feature_emb ** 2, axis=1)
            out.append((p1 ** 2 - p2) / 2)
        if self.order >= 3:
            p3 = jnp.sum(feature_emb ** 3, axis=1)
            out.append((p1 ** 3 - 3 * p1 * p2 + 2 * p3) / 6)
        if self.order >= 4:
            p4 = jnp.sum(feature_emb ** 4, axis=1)
            out.append((p1 ** 4 - 6 * p1 ** 2 * p2 + 3 * p2 ** 2
                        + 8 * p1 * p3 - 6 * p4) / 24)
        if self.order == 5:
            p2 = jnp.sum(feature_emb ** 2, axis=1)
            p3 = jnp.sum(feature_emb ** 3, axis=1)
            p4 = jnp.sum(feature_emb ** 4, axis=1)
            p5 = jnp.sum(feature_emb ** 5, axis=1)
            out.append((p1 ** 5 - 10 * p1 ** 3 * p2 + 20 * p1 ** 2 * p3
                        - 30 * p1 * p4 - 20 * p2 * p3 + 15 * p1 * p2 ** 2
                        + 24 * p5) / 120)
        y = jnp.concatenate(out, axis=-1)
        if self.batch_norm:
            y = TorchBatchNorm(use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)(y)
        return nn.Dense(1, kernel_init=xavier_normal)(y)
