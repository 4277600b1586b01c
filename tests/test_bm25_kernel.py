"""Pallas BM25 chunk scorer: fallback parity everywhere, compiled-kernel
parity on TPU (the kernel is exact integer-compare math, so tolerance
is zero)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rat_tpu.ops.pallas.bm25_scan import (bm25_score_chunk,
                                          bm25_score_chunk_pallas,
                                          bm25_score_chunk_reference)

ON_TPU = jax.default_backend() == "tpu"
needs_tpu = pytest.mark.skipif(not ON_TPU,
                               reason="compiled-kernel test runs on TPU")


def _inputs(rng, B=64, C=256, F=3):
    qry = jnp.asarray(rng.randint(0, 50, (B, F)), jnp.int32)
    idf = jnp.asarray(rng.rand(B, F).astype(np.float32))
    db = jnp.asarray(rng.randint(0, 50, (C, F)), jnp.int32)
    return qry, idf, db


def test_reference_matches_engine_math(rng):
    """The oracle must equal the engine's inline scoring expression."""
    qry, idf, db = _inputs(rng)
    got = np.asarray(bm25_score_chunk_reference(qry, idf, db))
    want = np.asarray(jnp.sum(
        (qry[:, None, :] == db[None, :, :]) * idf[:, None, :], axis=-1))
    np.testing.assert_array_equal(got, want)


def test_dispatch_uses_fallback_off_tpu(rng):
    qry, idf, db = _inputs(rng)
    got = np.asarray(bm25_score_chunk(qry, idf, db, use_kernel=ON_TPU and False))
    want = np.asarray(bm25_score_chunk_reference(qry, idf, db))
    np.testing.assert_array_equal(got, want)


@needs_tpu
@pytest.mark.slow
def test_pallas_kernel_matches_reference(rng):
    qry, idf, db = _inputs(rng, B=256, C=2048)
    got = np.asarray(bm25_score_chunk_pallas(qry, idf, db,
                                             block_q=128, block_c=1024))
    want = np.asarray(bm25_score_chunk_reference(qry, idf, db))
    np.testing.assert_array_equal(got, want)


def _fused_case(rng, N, B, F, K, vocab, bc, variant="cmajor"):
    """Exact parity of the fused score+top-K kernels (interpret mode)
    against the XLA scan, including tie-breaking and padded pools.
    Both grid variants must agree bit-for-bit: the q-major production
    default and the opt-in chunk-major layout (RAT_TPU_BM25_CMAJOR=1,
    pool streamed once per batch; measured equal on-chip)."""
    from rat_tpu.ops.pallas.bm25_scan import (bm25_topk_fused_pallas_cmajor,
                                              bm25_topk_fused_pallas_qmajor)
    from rat_tpu.retrieval.bm25 import (_compute_idf_tables, _map_to_idf,
                                        _round_up, _scan_topk)
    bm25_topk_fused_pallas = (bm25_topk_fused_pallas_cmajor
                              if variant == "cmajor"
                              else bm25_topk_fused_pallas_qmajor)
    db = rng.randint(0, vocab, (N, F)).astype(np.int64)
    q = db[rng.randint(0, N, B)]
    qidf = _map_to_idf(q, _compute_idf_tables(db))
    chunk = max(256, K)
    dbp = np.zeros((_round_up(max(N, chunk), chunk), F), np.int32)
    dbp[:N] = db
    v1, i1 = _scan_topk(jnp.asarray(dbp), jnp.asarray(q, jnp.int32),
                        jnp.asarray(qidf), jnp.int32(N),
                        topk=K, chunk_size=chunk)
    dbp2 = np.zeros((_round_up(max(N, bc), bc), F), np.int32)
    dbp2[:N] = db
    v2, i2 = bm25_topk_fused_pallas(jnp.asarray(q, jnp.int32),
                                    jnp.asarray(qidf), jnp.asarray(dbp2.T),
                                    N, topk=K, block_q=32, block_c=bc,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("variant", ["cmajor", "qmajor"])
def test_fused_topk_parity_heavy_ties(rng, variant):
    _fused_case(rng, N=5000, B=64, F=3, K=5, vocab=50, bc=512,
                variant=variant)


@pytest.mark.parametrize("variant", ["cmajor", "qmajor"])
def test_fused_topk_parity_k_exceeds_pool(rng, variant):
    _fused_case(rng, N=8, B=16, F=3, K=10, vocab=5, bc=512, variant=variant)


@pytest.mark.parametrize("variant", ["cmajor", "qmajor"])
def test_fused_topk_parity_wide_fields(rng, variant):
    _fused_case(rng, N=2000, B=128, F=5, K=7, vocab=200, bc=256,
                variant=variant)


def test_dense_idf_lookup_matches_host_map(rng):
    from rat_tpu.retrieval.bm25 import (_compute_idf_tables,
                                        _idf_lookup_dense, _map_to_idf,
                                        _pack_idf_dense)
    db = rng.randint(0, 300, (4000, 4)).astype(np.int64)
    q = rng.randint(0, 400, (512, 4)).astype(np.int64)  # incl. unseen values
    tables = _compute_idf_tables(db)
    want = _map_to_idf(q, tables)
    pack = _pack_idf_dense(tables)
    got = np.asarray(_idf_lookup_dense(jnp.asarray(q, jnp.int32), *pack))
    # unseen values may map to anything scoring-equivalent; the dense
    # lookup contract still returns 0 for them, so exact equality holds
    np.testing.assert_allclose(got, want, rtol=1e-6)
