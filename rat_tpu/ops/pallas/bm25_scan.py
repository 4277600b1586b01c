"""Pallas TPU kernel: BM25 chunk scoring.

The BM25 pool scan's inner loop scores a query batch against one pool
chunk: ``scores[b, c] = sum_f 1[qry[b,f] == db[c,f]] * idf[b,f]``
(reference math at data_utils.py:1012; XLA path in
rat_tpu/retrieval/bm25.py::_scan_topk). This kernel fuses the
compare+weight+reduce for one (query-block, chunk-block) tile in VMEM,
iterating fields in SMEM-friendly unrolled form, with the pool chunk
grid-streamed HBM->VMEM by the pallas pipeline.

The top-k merge stays in XLA (`lax.top_k` over the scored tile) — at
K<=10 the merge is negligible next to the O(B*C*F) scoring.

Numerics are exact (integer compares + fp32 adds), so the kernel is
interchangeable with the XLA scorer; `bm25_score_chunk` dispatches to
Pallas on TPU and the jnp fallback elsewhere.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(qry_ref, idf_ref, db_ref, out_ref):
    """qry/idf: [BQ, F], db: [BC, F] -> out: [BQ, BC]."""
    F = qry_ref.shape[1]
    qry = qry_ref[:]
    idf = idf_ref[:]
    db = db_ref[:]
    acc = jnp.zeros((qry.shape[0], db.shape[0]), dtype=jnp.float32)
    # F is tiny (3-11 for the shipped datasets): unrolled field loop
    # keeps everything rank-2 for clean (sublane, lane) layouts
    for f in range(F):
        eq = qry[:, f][:, None] == db[:, f][None, :]
        acc = acc + eq.astype(jnp.float32) * idf[:, f][:, None]
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("block_q", "block_c", "interpret"))
def bm25_score_chunk_pallas(qry, qry_idf, db_chunk, block_q=512,
                            block_c=2048, interpret=False):
    """qry: [B, F] int32, qry_idf: [B, F] f32, db_chunk: [C, F] int32 ->
    [B, C] f32 scores. B % block_q == 0 and C % block_c == 0 (pad
    upstream; the engine's chunks are statically sized)."""
    B, F = qry.shape
    C = db_chunk.shape[0]
    block_q = min(block_q, B)
    block_c = min(block_c, C)
    assert B % block_q == 0 and C % block_c == 0, (B, block_q, C, block_c)
    grid = (B // block_q, C // block_c)
    return pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, F), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, F), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, F), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qry, qry_idf, db_chunk)


def bm25_score_chunk_reference(qry, qry_idf, db_chunk):
    """jnp oracle / non-TPU fallback — identical math."""
    return jnp.sum(
        (qry[:, None, :] == db_chunk[None, :, :]) * qry_idf[:, None, :],
        axis=-1)


def bm25_score_chunk(qry, qry_idf, db_chunk, use_kernel=None):
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel:
        return bm25_score_chunk_pallas(qry, qry_idf, db_chunk)
    return bm25_score_chunk_reference(qry, qry_idf, db_chunk)
