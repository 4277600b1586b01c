"""Adaptive-parameter-generation (APG) layers and the v2-style MLP block.

JAX re-implementations of fuxictr/pytorch/layers/deep.py:25-306 and
mlp_block.py:23-66:

- APGLinear: a linear layer whose weight may be GENERATED per-example
  by a hypernetwork, optionally low-rank decomposed (U·W_gen·V) with
  over-parameterized factors;
- APGMLPLayer: an MLP whose linear layers take hypernetwork-generated
  weights under condition modes none / single / self / moe (mean, sum,
  max or attention expert aggregation);
- MLPBlock: FuxiCTR-v2-style MLP with batch_norm OR layer_norm placed
  before/after the activation.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .initializers import xavier_normal
from .layers import MLPLayer, TorchBatchNorm, get_activation


class APGLinear(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True
    is_weight_generated: bool = False
    decompose_rank: Optional[int] = None
    overparam_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inp, weight_tensor=None):
        if self.is_weight_generated:
            assert weight_tensor is not None
            if self.decompose_rank is not None:
                r = self.decompose_rank
                weight = weight_tensor.reshape(*weight_tensor.shape[:-1], r, r)
                if self.overparam_dim is None:
                    out = nn.Dense(r, use_bias=False, kernel_init=xavier_normal,
                                   name="U_matrix")(inp)
                else:
                    out = nn.Dense(self.overparam_dim, use_bias=False,
                                   kernel_init=xavier_normal, name="U_over")(inp)
                    out = nn.Dense(r, use_bias=False, kernel_init=xavier_normal,
                                   name="U_matrix")(out)
            else:
                weight = weight_tensor.reshape(*weight_tensor.shape[:-1],
                                               self.in_features, self.out_features)
                out = inp
            out = jnp.sum(out[..., :, None] * weight, axis=-2)
            if self.decompose_rank is not None:
                if self.overparam_dim is None:
                    out = nn.Dense(self.out_features, use_bias=False,
                                   kernel_init=xavier_normal, name="V_matrix")(out)
                else:
                    out = nn.Dense(self.overparam_dim, use_bias=False,
                                   kernel_init=xavier_normal, name="V_over")(out)
                    out = nn.Dense(self.out_features, use_bias=False,
                                   kernel_init=xavier_normal, name="V_matrix")(out)
        else:
            weight = self.param("weight", xavier_normal,
                                (self.in_features, self.out_features))
            out = jnp.sum(inp[..., :, None] * weight, axis=-2)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
            out = out + bias
        return out


class APGMLPLayer(nn.Module):
    """Hypernetwork-conditioned MLP (deep.py:144-306)."""
    input_dim: int
    output_dim: Optional[int] = None
    hidden_units: Sequence[int] = ()
    hidden_activations: str = "relu"
    output_activation: Optional[str] = None
    dropout_rates: float = 0.0
    batch_norm: bool = False
    use_bias: bool = True
    condition_mode: str = "none"   # none | single | moe | self
    decompose_ranks: Any = None
    overparam_dims: Any = None
    meta_net_configs: Any = None

    @nn.compact
    def __call__(self, inputs, conditions=None, condition_lens=None,
                 train: bool = False):
        assert self.condition_mode in ["none", "single", "moe", "self"]
        assert inputs.ndim == 2, "Require input shape like [Bxd]"
        n_linear = len(self.hidden_units) + (1 if self.output_dim is not None else 0)
        ranks = self.decompose_ranks
        if not isinstance(ranks, (list, tuple)):
            ranks = [ranks] * n_linear
        overs = self.overparam_dims
        if not isinstance(overs, (list, tuple)):
            overs = [overs] * n_linear
        drops = self.dropout_rates
        if not isinstance(drops, (list, tuple)):
            drops = [drops] * len(self.hidden_units)
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.hidden_units)

        metas = self.meta_net_configs
        if self.condition_mode != "none":
            assert metas is not None, "conditioning requires meta-net configs"
            if not isinstance(metas, list):
                metas = [dict(metas) for _ in range(n_linear)]

        units = [self.input_dim] + list(self.hidden_units)
        dims = list(zip(units[:-1], units[1:]))
        if self.output_dim is not None:
            dims.append((units[-1], self.output_dim))

        def gen_weight(layer_idx, in_f, out_f, outputs):
            cfg = dict(metas[layer_idx])
            num_experts = cfg.pop("num_experts", 1)
            aggregation = cfg.pop("aggregation", "mean")
            if self.condition_mode == "self":
                cfg["input_dim"] = in_f
            gen_dim = (ranks[layer_idx] ** 2 if ranks[layer_idx] is not None
                       else out_f * in_f)
            cfg["output_dim"] = gen_dim
            if self.condition_mode == "moe":
                experts = [MLPLayer(name=f"hyper_{layer_idx}_expert_{i}", **cfg)
                           for i in range(num_experts)]
                moe = jnp.stack([experts[i](conditions[:, i], train=train)
                                 for i in range(num_experts)], axis=-2)  # BxNexDl
                if aggregation == "attention":
                    query = nn.Dense(gen_dim, kernel_init=xavier_normal,
                                     name=f"hyper_{layer_idx}_query")(outputs)
                    w = jnp.sum(query[:, None, :] * moe, axis=-1)  # BxNe
                    if condition_lens is not None:
                        mask = (jnp.arange(num_experts)[None, :]
                                >= condition_lens[:, None])
                        w = jnp.where(mask, -jnp.inf, w)
                    w = nn.softmax(w, axis=-1)
                    w = jnp.nan_to_num(w)
                    return jnp.sum(moe * w[..., None], axis=-2)
                elif aggregation == "mean":
                    return jnp.mean(moe, axis=-2)
                elif aggregation == "sum":
                    return jnp.sum(moe, axis=-2)
                elif aggregation == "max":
                    return jnp.max(moe, axis=-2)
                raise NotImplementedError(aggregation)
            source = outputs if self.condition_mode == "self" else conditions
            return MLPLayer(name=f"hyper_{layer_idx}", **cfg)(source, train=train)

        outputs = inputs
        for idx, (in_f, out_f) in enumerate(dims):
            generated = self.condition_mode != "none"
            lin = APGLinear(in_f, out_f, use_bias=self.use_bias,
                            is_weight_generated=generated,
                            decompose_rank=ranks[idx],
                            overparam_dim=overs[idx],
                            name=f"linear_{idx}")
            if generated:
                wt = gen_weight(idx, in_f, out_f, outputs)
                outputs = lin(outputs, weight_tensor=wt)
            else:
                outputs = lin(outputs)
            is_hidden = idx < len(self.hidden_units)
            if is_hidden:
                if self.batch_norm:
                    outputs = TorchBatchNorm(use_running_average=not train,
                                             momentum=0.9, epsilon=1e-5)(outputs)
                outputs = get_activation(acts[idx])(outputs)
                if drops[idx] > 0:
                    outputs = nn.Dropout(rate=drops[idx],
                                         deterministic=not train)(outputs)
        if self.output_activation is not None:
            outputs = get_activation(self.output_activation)(outputs)
        return outputs


class MLPBlock(nn.Module):
    """FuxiCTR-v2-style MLP: batch_norm OR layer_norm, placed before or
    after the activation (mlp_block.py:23-66)."""
    input_dim: int
    hidden_units: Sequence[int] = ()
    hidden_activations: str = "relu"
    output_dim: Optional[int] = None
    output_activation: Optional[str] = None
    dropout_rates: float = 0.0
    batch_norm: bool = False
    layer_norm: bool = False
    norm_before_activation: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.hidden_units)
        drops = self.dropout_rates
        if not isinstance(drops, (list, tuple)):
            drops = [drops] * len(self.hidden_units)

        def norm(h):
            if self.batch_norm:
                return TorchBatchNorm(use_running_average=not train,
                                      momentum=0.9, epsilon=1e-5)(h)
            if self.layer_norm:
                return nn.LayerNorm(epsilon=1e-5)(h)
            return h

        for i, out_f in enumerate(self.hidden_units):
            x = nn.Dense(out_f, use_bias=self.use_bias,
                         kernel_init=xavier_normal)(x)
            if self.norm_before_activation:
                x = norm(x)
            x = get_activation(acts[i])(x)
            if not self.norm_before_activation:
                x = norm(x)
            if drops[i] > 0:
                x = nn.Dropout(rate=drops[i], deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias,
                         kernel_init=xavier_normal)(x)
        if self.output_activation is not None:
            x = get_activation(self.output_activation)(x)
        return x
