"""Pallas fused cross/intra block: parity with the flax path.

On CPU the kernel runs in interpreter mode; on TPU the same test
exercises the compiled Mosaic kernel. Kernels must never change
numerics beyond tolerance (SURVEY.md §7.2 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rat_tpu.nn.encoders import CrossIntraEncoderBlock
from rat_tpu.ops.pallas import (cross_intra_block_reference,
                                fused_cross_intra_block)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU
# interpreter-mode compiles of the full fused kernel take minutes on
# small CPU hosts; the compiled-kernel tests run on TPU
needs_tpu = pytest.mark.skipif(not ON_TPU, reason="pallas kernel tests run on TPU")


def _flax_params_to_kernel(p):
    return {
        "ln1_scale": p["intra_attention"]["LayerNorm_0"]["scale"],
        "ln1_bias": p["intra_attention"]["LayerNorm_0"]["bias"],
        "w_qkv1": p["intra_attention"]["Attention_0"]["to_qkv"]["kernel"],
        "w_out1": p["intra_attention"]["Attention_0"]["to_out"]["kernel"],
        "b_out1": p["intra_attention"]["Attention_0"]["to_out"]["bias"],
        "ln2_scale": p["cross_attention"]["LayerNorm_0"]["scale"],
        "ln2_bias": p["cross_attention"]["LayerNorm_0"]["bias"],
        "w_qkv2": p["cross_attention"]["Attention_0"]["to_qkv"]["kernel"],
        "w_out2": p["cross_attention"]["Attention_0"]["to_out"]["kernel"],
        "b_out2": p["cross_attention"]["Attention_0"]["to_out"]["bias"],
        "ff_w1": p["mlp"]["Dense_0"]["kernel"],
        "ff_b1": p["mlp"]["Dense_0"]["bias"],
        "ff_w2": p["mlp"]["Dense_1"]["kernel"],
        "ff_b2": p["mlp"]["Dense_1"]["bias"],
    }


@pytest.fixture()
def block_setup(rng):
    d, heads, dim_head, hidden = 8, 2, 8, 16
    block = CrossIntraEncoderBlock(d, heads, dim_head, 0.0, hidden)
    x = rng.randn(8, 4, 5, d).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    kparams = _flax_params_to_kernel(variables["params"])
    return block, variables, jnp.asarray(x), kparams, heads, dim_head


def test_reference_math_matches_flax(block_setup):
    block, variables, x, kp, heads, dim_head = block_setup
    want = block.apply(variables, x, train=False)
    got = cross_intra_block_reference(x, kp, heads, dim_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@needs_tpu
def test_pallas_kernel_matches_flax(block_setup):
    block, variables, x, kp, heads, dim_head = block_setup
    want = block.apply(variables, x, train=False)
    got = fused_cross_intra_block(x, kp, heads, dim_head, block_b=4,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@needs_tpu
def test_pallas_kernel_gradients_match(block_setup):
    """custom path must be differentiable and agree with autodiff of the
    flax path (loss = sum of outputs)."""
    block, variables, x, kp, heads, dim_head = block_setup

    def loss_flax(x_):
        return jnp.sum(block.apply(variables, x_, train=False))

    def loss_kernel(x_):
        return jnp.sum(fused_cross_intra_block(x_, kp, heads, dim_head,
                                               block_b=4, interpret=INTERPRET))

    g1 = jax.grad(loss_flax)(x)
    g2 = jax.grad(loss_kernel)(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=2e-3, atol=1e-4)
