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
