"""Pallas TPU kernel: fused cross/intra encoder block.

One RAT (m2) encoder block — intra attention over the F+1 feature
tokens, cross attention over the 1+K samples, feed-forward, all with
residuals (semantics of RAT_m2.py:204-236) — executed as a SINGLE
kernel over a block of samples held in VMEM.

Why fuse: the grid per sample is tiny ((1+K)(F+1) <= ~80 tokens,
d <= 40), so the unfused XLA graph is ~20 small HBM-round-tripping ops
per block. Fusing keeps each sample block plus all weights (a few KB)
in VMEM and performs both attentions + the FF without touching HBM.
The grid iterates over batch blocks only; weights are broadcast to
every program.

The kernel is numerically identical (up to float reassociation) to the
flax path; `cross_intra_block_reference` is the jnp oracle used by the
parity tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _attention(x, w_qkv, w_out, b_out, heads, dim_head, project_out):
    """x: [n_rows, seq, d] -> same; plain softmax attention."""
    n, s, d = x.shape
    qkv = jnp.einsum("nsd,de->nse", x, w_qkv,
                     preferred_element_type=jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    inner = q.shape[-1]
    dh = inner // heads
    # static per-head loop with lane slices: Mosaic's tpu.matmul allows
    # only one batch dim, and splitting the lane dim via reshape is an
    # unsupported shape cast — head counts here are tiny (2-32)
    scale = dim_head ** -0.5
    outs = []
    for hh in range(heads):
        qh = q[..., hh * dh:(hh + 1) * dh]
        kh = k[..., hh * dh:(hh + 1) * dh]
        vh = v[..., hh * dh:(hh + 1) * dh]
        dots = jnp.einsum("nid,njd->nij", qh, kh,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        outs.append(jnp.einsum("nij,njd->nid", attn, vh,
                               preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=-1) if heads > 1 else outs[0]
    if project_out:
        out = jnp.einsum("nse,ed->nsd", out, w_out,
                         preferred_element_type=jnp.float32) + b_out
    return out


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 —
    below float32 matmul noise). Mosaic has no erf primitive
    (KernelType.TC), so the kernel uses this; the jnp fallback keeps
    exact erf."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x, in_kernel=False):
    erf = _erf_approx if in_kernel else jax.lax.erf
    return 0.5 * x * (1.0 + erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _block_math(x, p, heads, dim_head, project_out, in_kernel=False):
    """The full block on a [bb, t, s, d] tile; p is the weights dict."""
    bb, t, s, d = x.shape
    h = x.reshape(bb * t, s, d)
    h = _attention(_layernorm(h, p["ln1_scale"], p["ln1_bias"]),
                   p["w_qkv1"], p["w_out1"], p["b_out1"],
                   heads, dim_head, project_out) + h
    h = h.reshape(bb, t, s, d).transpose(0, 2, 1, 3).reshape(bb * s, t, d)
    h = _attention(_layernorm(h, p["ln2_scale"], p["ln2_bias"]),
                   p["w_qkv2"], p["w_out2"], p["b_out2"],
                   heads, dim_head, project_out) + h
    ff = _gelu_exact(jnp.einsum("ntd,dk->ntk", h, p["ff_w1"],
                                preferred_element_type=jnp.float32) + p["ff_b1"],
                     in_kernel=in_kernel)
    ff = jnp.einsum("ntk,kd->ntd", ff, p["ff_w2"],
                    preferred_element_type=jnp.float32) + p["ff_b2"]
    h = ff + h
    return h.reshape(bb, s, t, d).transpose(0, 2, 1, 3)


_PARAM_ORDER = ("ln1_scale", "ln1_bias", "w_qkv1", "w_out1", "b_out1",
                "ln2_scale", "ln2_bias", "w_qkv2", "w_out2", "b_out2",
                "ff_w1", "ff_b1", "ff_w2", "ff_b2")


def cross_intra_block_reference(x, params, heads, dim_head, project_out=True):
    """jnp oracle (no pallas) — same math, used for parity tests and as
    the fallback path."""
    return _block_math(x, params, heads, dim_head, project_out)


def _kernel(x_ref, *refs, heads, dim_head, project_out):
    param_refs, out_ref = refs[:-1], refs[-1]
    p = {name: r[:] for name, r in zip(_PARAM_ORDER, param_refs)}
    out_ref[:] = _block_math(x_ref[:], p, heads, dim_head, project_out,
                             in_kernel=True)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_block_vjp(x, params, heads, dim_head, project_out, block_b,
                     interpret):
    return _fused_forward(x, params, heads, dim_head, project_out,
                          block_b, interpret)


def _fused_fwd(x, params, heads, dim_head, project_out, block_b, interpret):
    out = _fused_forward(x, params, heads, dim_head, project_out,
                         block_b, interpret)
    return out, (x, params)


def _fused_bwd(heads, dim_head, project_out, block_b, interpret,
               residuals, g):
    x, params = residuals
    _, vjp_fn = jax.vjp(
        lambda x_, p_: _block_math(x_, p_, heads, dim_head, project_out),
        x, params)
    return vjp_fn(g)


_fused_block_vjp.defvjp(_fused_fwd, _fused_bwd)


# Mosaic unrolls the per-sample batched attention matmuls over the
# bb*t leading dim, so kernel COMPILE time grows ~4x per block_b
# doubling (measured on a real chip at B=4096, t=6, s=4, d=10:
# block_b=8 -> 2.8 s, 16 -> 8.5 s, 32 -> 31 s, 64+ -> minutes to
# hours). 16 is the largest production-safe block; the batch grid
# supplies the parallelism instead.
_MAX_BLOCK_B = 16

# Scoped-VMEM budget for one kernel instance. The kernel's temporaries
# scale with block_b * t * s_pad * W where W is the widest padded lane
# width in play (the fused qkv, or d itself) — measured on v5e: the
# KKBox shape (t=6, s=14->16, d=40, 3*h*dh=240->256) wants 23.2 MB at
# block_b=8 against a 16 MB scoped limit, i.e. ~30 block-sized
# temporaries. Budget 12 MB with that constant and clamp block_b.
_VMEM_BUDGET_BYTES = 12_000_000
_VMEM_TEMPS = 32


def _auto_block_b(requested, t, s, d, heads, dim_head):
    def pad(x, m):
        return ((x + m - 1) // m) * m
    w = max(pad(d, 128), pad(3 * heads * dim_head, 128))
    per_row = _VMEM_TEMPS * t * pad(s, 8) * w * 4
    fit = max(1, _VMEM_BUDGET_BYTES // per_row)
    bb = 1
    while bb * 2 <= min(requested, _MAX_BLOCK_B, fit):
        bb *= 2
    return bb


def fused_cross_intra_block(x, params, heads, dim_head, project_out=True,
                            block_b=8, interpret=False):
    """Differentiable fused block: forward runs the Pallas kernel, the
    backward pass is the VJP of the (mathematically identical) jnp
    reference — XLA fuses it well, and a handwritten backward kernel can
    swap in later without touching callers."""
    _, t, s, d = x.shape
    block_b = _auto_block_b(block_b, t, s, d, heads, dim_head)
    return _fused_block_vjp(x, params, heads, dim_head, project_out,
                            block_b, interpret)


@partial(jax.jit, static_argnames=("heads", "dim_head", "project_out",
                                   "block_b", "interpret"))
def _fused_forward(x, params, heads, dim_head, project_out=True,
                   block_b=256, interpret=False):
    """x: [B, t, s, d]; params: dict of block weights (see _PARAM_ORDER).
    B must be a multiple of block_b (pad upstream; batch sizes are
    static in this framework)."""
    B, t, s, d = x.shape
    block_b = min(block_b, B)
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b,)
    param_list = [params[k] for k in _PARAM_ORDER]
    in_specs = [pl.BlockSpec((block_b, t, s, d),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for w in param_list:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n,
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        partial(_kernel, heads=heads, dim_head=dim_head,
                project_out=project_out),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, t, s, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *param_list)
