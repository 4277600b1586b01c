"""Multi-host (multi-process) initialization and per-host input feeding.

The reference has no communication backend at all (SURVEY.md §2.8). On
TPU pods the recipe is:

1. every host calls ``initialize_distributed()`` (jax.distributed —
   coordinator discovery is automatic on TPU VMs);
2. build a global mesh over ``jax.devices()`` (all hosts' chips);
3. each host loads ITS shard of every batch and assembles the global
   array with ``host_local_batch_to_global`` — XLA then runs the same
   SPMD program as single-host, with gradient psums riding ICI/DCN.

Collectives are never written by hand: the shardings declared in
rat_tpu.parallel.mesh drive XLA to insert all-gather / psum /
reduce-scatter as needed.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Idempotent jax.distributed bring-up; no-op in single-process runs
    unless explicitly configured."""
    if coordinator_address is None and num_processes in (None, 1):
        # single-process (or TPU-VM auto-config) path
        if num_processes is None:
            try:
                jax.distributed.initialize()
            except Exception:
                pass  # already initialized or single-host without env config
        return jax.process_count(), jax.process_index()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count(), jax.process_index()


def host_local_batch_to_global(local_batch, mesh, axis="data"):
    """Assemble a globally-sharded array from each process's local rows.

    local_batch: numpy [B_local, ...] on this host; the global batch is
    the concatenation over processes, sharded over ``axis``.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def host_local_index_group_to_global(idx_group, mesh, axis="data"):
    """Assemble a [G, B] group of index batches as ONE globally-sharded
    array (scan axis replicated, batch axis sharded over ``axis``).

    ``idx_group`` is the GLOBAL group, computed identically on every
    host (the shuffle RNG is seed-deterministic); each process
    contributes its contiguous [G, B/k] column slice. This is what lets
    multi-process training dispatch scanned GROUPS of steps — the same
    dispatch-amortization single-process runs get — instead of
    assembling per-host index batches one step at a time.
    """
    k = jax.process_count()
    i = jax.process_index()
    G, B = idx_group.shape
    if B % k:
        raise ValueError(
            "batch of {} rows does not divide over {} processes; pick a "
            "batch_size that is a multiple of the process count".format(B, k))
    per = B // k
    local = np.ascontiguousarray(idx_group[:, i * per:(i + 1) * per])
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.make_array_from_process_local_data(sharding, local,
                                                  global_shape=(G, B))


def process_local_rows(n_global, batch_indices):
    """Split a global index batch into this process's contiguous slice.

    The batch must divide evenly over processes — silently dropping the
    remainder would train/eval on fewer rows than the step's ``valid``
    divisor assumes. The trainer pads every batch to ``batch_size``,
    which the mesh already requires to divide over all devices, so this
    only fires on misconfiguration.
    """
    k = jax.process_count()
    i = jax.process_index()
    if len(batch_indices) % k:
        raise ValueError(
            "batch of {} rows does not divide over {} processes; pick a "
            "batch_size that is a multiple of the process count".format(
                len(batch_indices), k))
    per = len(batch_indices) // k
    return batch_indices[i * per: (i + 1) * per]
