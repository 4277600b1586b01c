"""Characterize WHICH op class a degraded chip mode taxes.

Times the marginal per-op cost of each kernel family in the grid-minor
train step at the bench shape ([t=6, s=4, d=10, b=4096]): plain
elementwise (4-D vs flat control), LayerNorm, the broadcast-multiply-
reduce projection, the attention core, the entry/exit relayout, and the
embedding gather/scatter. Marginal = (time of 48 chained reps - time of
8 reps) / 40, so link latency and fixed dispatch cost cancel.

Usage: python scripts/tax_probe.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t, s, d, b = 6, 4, 10, 4096
    V, h, c = 90_000, 2, 10
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(t, s, d, b).astype(np.float32))
    flat0 = jnp.asarray(rng.rand(t * s * d * b).astype(np.float32))
    table0 = jnp.asarray(rng.rand(V, d).astype(np.float32))
    ids0 = jnp.asarray(rng.randint(0, V, 73728).astype(np.int32))
    wqkv = jnp.asarray(rng.rand(d, 3, h, c).astype(np.float32) * 0.1)
    wout = jnp.asarray(rng.rand(h, c, d).astype(np.float32) * 0.1)

    def ew(x):
        return x * 1.0000001 + 1e-7

    def ew_flat(x):
        return x * 1.0000001 + 1e-7

    def ln(x):
        m = x.mean(axis=2, keepdims=True)
        v = ((x - m) ** 2).mean(axis=2, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-5)

    def qkv_roundtrip(x):
        qkv = jnp.sum(x[:, :, :, None, None, None, :]
                      * wqkv[:, :, :, :, None], axis=2)  # [t,s,3,h,c,b]
        o = qkv[:, :, 0]                                  # [t,s,h,c,b]
        return jnp.sum(o[:, :, :, :, None, :] * wout[:, :, :, None], axis=(2, 3))

    def attn_core(x):
        qkv = jnp.sum(x[:, :, :, None, None, None, :]
                      * wqkv[:, :, :, :, None], axis=2)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dots = jnp.sum(q[:, :, None] * k[:, None], axis=4) * (c ** -0.5)
        attn = jax.nn.softmax(dots, axis=2)
        o = jnp.sum(attn[:, :, :, :, None, :] * v[:, None], axis=2)
        return jnp.sum(o[:, :, :, :, None, :] * wout[:, :, :, None], axis=(2, 3))

    def transpose_rt(x):
        y = jnp.transpose(x, (3, 0, 1, 2)) * 1.0000001
        # barrier the intermediate so the simplifier cannot commute the
        # multiply and cancel the transpose pair (which would make this
        # probe measure ~0 instead of relayout cost)
        (y,) = jax.lax.optimization_barrier((y,))
        return jnp.transpose(y, (1, 2, 3, 0))

    def gather(tab):
        g = tab[ids0]                                     # [73728, d]
        return tab + g.sum() * 1e-12

    def scatter(tab):
        return tab.at[ids0].add(1e-9)

    cases = [
        ("ew_grid      [6,4,10,4096]", ew, x0),
        ("ew_flat      [983040]", ew_flat, flat0),
        ("layernorm    axis=d", ln, x0),
        ("qkv+out_proj reduces", qkv_roundtrip, x0),
        ("attention    core fwd", attn_core, x0),
        ("transpose_rt b<->major", transpose_rt, x0),
        ("gather+redux 73728xd", gather, table0),
        ("scatter_add  73728xd", scatter, table0),
    ]

    def run(f, arg, n):
        @jax.jit
        def prog(a, salt):
            a = a + salt
            for _ in range(n):
                a = f(a)
            return a

        prog(arg, 1e-9).block_until_ready()  # compile
        best = float("inf")
        for i in range(3):
            tic = time.perf_counter()
            out = prog(arg, 1e-9 * (i + 2))
            float(jax.device_get(jnp.sum(out)))
            best = min(best, time.perf_counter() - tic)
        return best

    print(f"{'case':<30} {'us/op':>10}  (marginal, 48 vs 8 reps)")
    for name, f, arg in cases:
        t8 = run(f, arg, 8)
        t48 = run(f, arg, 48)
        per = (t48 - t8) / 40 * 1e6
        print(f"{name:<30} {per:>10.1f}")


if __name__ == "__main__":
    main()
