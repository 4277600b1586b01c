"""Parameter initializers matching the reference's reset_parameters
(fuxictr/pytorch/models/base_model.py:101-123):

- embedding tables: N(0, 1e-4) with the padding row kept at zero;
- Linear kernels: Xavier/Glorot *untruncated* normal, zero bias.

``jax.nn.initializers.glorot_normal`` draws truncated normals, so the
Xavier init here uses plain normal with the Glorot std for exact
distributional parity with ``torch.nn.init.xavier_normal_``.
"""

import jax
import jax.numpy as jnp
import numpy as np


def xavier_normal(key, shape, dtype=jnp.float32):
    """Glorot normal for a Dense kernel of shape [fan_in, fan_out]."""
    fan_in, fan_out = shape[0], shape[1]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(key, shape, dtype)


def embedding_init(std=1.e-4):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init
