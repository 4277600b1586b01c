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
    bookkeeping, epoch counters, numpy RNG state...)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"),
               jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if extra is not None:
        import json
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)


def restore_train_state(path, abstract_state):
    """abstract_state: a TrainState with the target structure (e.g. a
    freshly initialized one); restored leaves adopt its shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"),
                          jax.device_get(abstract_state))
    extra = None
    extra_file = os.path.join(path, "extra.json")
    if os.path.exists(extra_file):
        import json
        with open(extra_file) as f:
            extra = json.load(f)
    return jax.device_put(state), extra
