"""Full-train-state checkpointing.

The reference only checkpoints model weights on metric improvement
(base_model.py:275-284) — no optimizer state, no mid-run resume. Here
both levels exist:

- ``save_weights`` / ``load_weights`` on the Trainer: weights-only
  ``.model`` artifacts, reference-compatible workflow;
- ``save_train_state`` / ``restore_train_state``: the FULL TrainState
  (params + optimizer moments + step + monitor bookkeeping + host RNG)
  via Orbax, sharding-aware, enabling exact resume after preemption
  (SURVEY.md §5 checkpoint/resume).
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_train_state(path, state, extra=None):
    """state: TrainState pytree; extra: small JSON-able dict (monitor
    bookkeeping, epoch counters, numpy RNG state...).

    Single-process saves host copies (tunnel-safe); multi-process hands
    orbax the sharded jax arrays directly — device_get of a
    non-addressable leaf is impossible from one process, and orbax
    writes each shard exactly once to the (shared) checkpoint dir."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if jax.process_count() == 1:
        state = jax.device_get(state)
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    if extra is not None and jax.process_index() == 0:
        import json
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)


def restore_train_state(path, abstract_state):
    """abstract_state: a TrainState with the target structure AND
    device layout (e.g. freshly initialized via Trainer.init_state).
    Every leaf is restored straight into the template leaf's sharding
    (orbax abstract-array restore), so a mesh run resumes with its
    row-sharded tables in place — a bare device_put would silently
    discard the SPMD layout, and is outright wrong multi-host, where
    one process cannot place non-addressable shards."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    abstract = jax.tree_util.tree_map(as_abstract, abstract_state)
    state = ckptr.restore(os.path.join(path, "state"), abstract)
    extra = None
    extra_file = os.path.join(path, "extra.json")
    if os.path.exists(extra_file):
        import json
        with open(extra_file) as f:
            extra = json.load(f)
    return state, extra
