"""A/B prototype: grid-minor (transpose-free) CrossIntraEncoder.

The current m2 encoder alternates intra/cross attention by physically
transposing the stream ((b t) s d <-> (b s) t d) and each batch-minor
MHSA transposes q/k/v/out again — ~10 layout-change copies per block,
x4 depth, x2 for backward. The xplane trace (BENCH_RESULTS.md, r4
degradation note) shows exactly these copies carrying a ~30x tax in the
degraded worker mode, and they cost real time healthy too.

This prototype evaluates the SAME parameter tree with a fixed
[t, s, d, b] layout end to end: every op is a broadcast-multiply-reduce
that keeps b in the lane dimension, intra vs cross attention differ
only in which axis the reduction runs over, and the stream is never
transposed between blocks (one entry + one exit transpose total).

Run on the chip:  python scripts/gm_encoder_ab.py [--depth 4] [--b 4096]
Prints one JSON line: parity check + fwd+bwd step times for both paths.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ln(x, scale, bias, eps=1e-5):
    """LayerNorm over d for x [t, s, d, b]."""
    import jax.numpy as jnp
    m = jnp.mean(x, axis=2, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=2, keepdims=True)
    return (x - m) * (scale[:, None] / jnp.sqrt(v + eps)) + bias[:, None]


def _dense(x, kernel, bias=None):
    """x [t, s, d, b] @ kernel [d, e] -> [t, s, e, b], b kept minor.

    Written as broadcast-multiply-reduce, not dot_general: the dot
    lowering would relayout b back to batch-major (see
    nn/layers.py::_mhsa_batch_minor's contract note)."""
    import jax.numpy as jnp
    y = jnp.sum(x[:, :, :, None, :] * kernel[:, :, None], axis=2)
    if bias is not None:
        y = y + bias[:, None]
    return y


def _attention_gm(x, p, heads, dim_head, over_t):
    """Pre-norm MHSA on x [t, s, d, b] over the t axis (cross) or the
    s axis (intra); same math as PreNormAttention + _mhsa."""
    import jax.numpy as jnp
    from flax import linen as nn
    ln = p["LayerNorm_0"]
    att = p["Attention_0"]
    h = _ln(x, ln["scale"], ln["bias"])
    d = x.shape[2]
    inner = heads * dim_head
    wqkv = att["to_qkv"]["kernel"].reshape(d, 3, heads, dim_head)
    # [t, s, 3, h, c, b] in one fused reduce; no head-split reshape
    qkv = jnp.sum(h[:, :, :, None, None, None, :]
                  * wqkv[:, :, :, :, None], axis=2)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [t, s, h, c, b]
    scale = dim_head ** -0.5
    if over_t:
        dots = jnp.sum(q[:, None] * k[None], axis=4) * scale  # [i,j,s,h,b]
        attn = nn.softmax(dots, axis=1)
        out = jnp.sum(attn[:, :, :, :, None, :] * v[None], axis=1)
    else:
        dots = jnp.sum(q[:, :, None] * k[:, None], axis=4) * scale  # [t,i,j,h,b]
        attn = nn.softmax(dots, axis=2)
        out = jnp.sum(attn[:, :, :, :, None, :] * v[:, None], axis=2)
    # out [t, s, h, c, b]; merge heads + project in one reduce
    wo = att["to_out"]["kernel"].reshape(heads, dim_head, d)
    y = jnp.sum(out[:, :, :, :, None, :] * wo[:, :, :, None], axis=(2, 3))
    return y + att["to_out"]["bias"][:, None]


def _ff_gm(x, p):
    import jax.numpy as jnp
    from flax import linen as nn
    h = _dense(x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"])
    h = nn.gelu(h, approximate=False)
    return _dense(h, p["Dense_1"]["kernel"], p["Dense_1"]["bias"])


def encoder_gm(params, x, heads, dim_head, depth):
    """CrossIntraEncoder forward, grid-minor: x [b, t, s, d] in/out,
    [t, s, d, b] inside; identical math + parameter tree."""
    import jax.numpy as jnp
    h = jnp.transpose(x, (1, 2, 3, 0))
    for i in range(depth):
        blk = params[f"CrossIntraEncoderBlock_{i}"]
        h = _attention_gm(h, blk["intra_attention"], heads, dim_head,
                          over_t=False) + h
        h = _attention_gm(h, blk["cross_attention"], heads, dim_head,
                          over_t=True) + h
        h = _ff_gm(h, blk["mlp"]) + h
    return jnp.transpose(h, (3, 0, 1, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--t", type=int, default=6)
    ap.add_argument("--s", type=int, default=4)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--dim-head", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--scale-dim", type=int, default=4)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--parity", action="store_true",
                    help="also verify fwd/grad parity (adds one compile)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the axon sitecustomize "
                         "overrides JAX_PLATFORMS, so use jax.config)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from rat_tpu.nn.encoders import CrossIntraEncoder

    b, t, s, d = args.b, args.t, args.s, args.d
    hidden = args.scale_dim * d
    enc = CrossIntraEncoder(d, args.heads, args.dim_head, 0.0, args.depth,
                            hidden)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(b, t, s, d).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x0)
    params = variables["params"]

    def loss_ref(p, x):
        return jnp.sum(enc.apply({"params": p}, x) ** 2)

    def loss_gm(p, x):
        return jnp.sum(encoder_gm(p, x, args.heads, args.dim_head,
                                  args.depth) ** 2)

    # parity (forward + per-leaf relative gradient), one jitted program
    # each — eager op-by-op dispatch through a busy tunnel never returns
    fwd_err = g_err = None
    if args.parity:
        @jax.jit
        def parity(p, x):
            y_ref = enc.apply({"params": p}, x)
            y_gm = encoder_gm(p, x, args.heads, args.dim_head, args.depth)
            fe = jnp.max(jnp.abs(y_ref - y_gm))
            g_ref = jax.grad(loss_ref)(p, x)
            g_gm = jax.grad(loss_gm)(p, x)
            ge = jnp.max(jnp.stack([
                jnp.max(jnp.abs(a - b2)) / (jnp.max(jnp.abs(a)) + 1e-12)
                for a, b2 in zip(jax.tree_util.tree_leaves(g_ref),
                                 jax.tree_util.tree_leaves(g_gm))]))
            return fe, ge
        fe, ge = parity(params, x0)
        fwd_err, g_err = float(fe), float(ge)

    # fwd+bwd step timing, min over trials, salted inputs (remote
    # runtimes can serve repeated identical executions from cache)
    def bench(loss_fn):
        step = jax.jit(jax.value_and_grad(loss_fn))
        salt = [x0 * (1 + 1e-6 * i) for i in range(args.trials + 1)]
        v, g = step(params, salt[0])
        jax.block_until_ready(float(v))
        times = []
        for i in range(args.trials):
            tic = time.perf_counter()
            v, g = step(params, salt[i + 1])
            float(v)  # hard sync
            times.append(time.perf_counter() - tic)
        return min(times)

    t_ref = bench(loss_ref)
    t_gm = bench(loss_gm)
    print(json.dumps({
        "shape": [b, t, s, d], "depth": args.depth,
        "fwd_max_abs_err": fwd_err, "grad_max_abs_err": g_err,
        "ref_ms": round(t_ref * 1e3, 3), "gm_ms": round(t_gm * 1e3, 3),
        "speedup": round(t_ref / t_gm, 3)}))


if __name__ == "__main__":
    main()
