"""Microbenchmark: fused Pallas cross/intra block vs the XLA-fused
flax path, at the ML-Tag training shape (b=4096, t=1+5, s=F+1=4, d=10).

Run on TPU: python -m rat_tpu.ops.pallas.bench_kernel
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rat_tpu.nn.encoders import CrossIntraEncoderBlock
    from rat_tpu.ops.pallas.cross_intra_block import (_PARAM_ORDER,
                                                      fused_cross_intra_block)

    d, heads, dim_head, hidden = 10, 2, 10, 40
    B, t, s = 4096, 6, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, t, s, d).astype(np.float32))
    block = CrossIntraEncoderBlock(d, heads, dim_head, 0.0, hidden)
    variables = block.init(jax.random.PRNGKey(0), x[:2], train=False)
    p = variables["params"]
    kp = {
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

    flax_fn = jax.jit(lambda x_: block.apply(variables, x_, train=False))
    kernel_fn = jax.jit(lambda x_: fused_cross_intra_block(
        x_, kp, heads, dim_head, block_b=512))

    for name, fn in [("xla", flax_fn), ("pallas", kernel_fn)]:
        out = fn(x)
        jax.block_until_ready(out)
        n = 50
        tic = time.perf_counter()
        for _ in range(n):
            out = fn(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - tic) / n
        print(f"{name}: {dt*1e6:.1f} us/block  ({B/dt/1e6:.1f}M samples/s)")
    diff = np.abs(np.asarray(flax_fn(x)) - np.asarray(kernel_fn(x))).max()
    print("max diff:", diff)


if __name__ == "__main__":
    main()
