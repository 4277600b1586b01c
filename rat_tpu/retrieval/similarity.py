"""Alternative retrieval utilities.

- jaccard_similarity: batched padding-aware Jaccard between ID-row
  matrices (reference: data_utils.py:59-93) — an alternative retrieval
  metric to BM25, kept for capability parity.
- map_indices: vectorized "index of each query value in keys" via
  argsort + searchsorted, missing -> -1 (data_utils.py:98-122).
"""

import jax
import jax.numpy as jnp
import numpy as np


def jaccard_similarity(u, v, padding_idx=0):
    """u: [X, D], v: [Y, D'] int arrays -> [X, Y] Jaccard scores.

    NOTE (reference contract): rows of ``u`` must not contain repeated
    values; intersection counts each u-token found anywhere in the
    v-row.
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    u_valid = (u != padding_idx)
    v_valid = (v != padding_idx)
    # [X,1,D,1] == [1,Y,1,D'] -> [X,Y,D,D']
    sims = (u[:, None, :, None] == v[None, :, None, :])
    count_intersection = jnp.sum(jnp.any(sims, axis=-1) * u_valid[:, None, :],
                                 axis=-1)
    count_union = (jnp.sum(u_valid, axis=-1, keepdims=True)
                   + jnp.sum(v_valid, axis=-1) - count_intersection)
    return count_intersection / (count_union + 1e-3)


def map_indices(keys, queries, missing=-1, is_key_sorted=False):
    """Index of each query value within keys; missing -> `missing`.
    Host-side numpy (used by graph building and dedup paths)."""
    keys = np.asarray(keys)
    queries = np.asarray(queries)
    assert keys.ndim == 1
    if is_key_sorted:
        sorter = np.arange(len(keys))
    else:
        sorter = np.argsort(keys, kind="mergesort")
    insertion = np.searchsorted(keys, queries, sorter=sorter)
    insertion = np.clip(insertion, 0, len(keys) - 1)
    indices = sorter[insertion]
    invalid = keys[indices] != queries
    indices = np.where(invalid, missing, indices)
    return indices
