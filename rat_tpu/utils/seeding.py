"""Determinism helpers.

JAX is functional, so device-side computation is deterministic once the
PRNG keys are fixed; the residual risk is host-side data order
(numpy shuffles) — seeded here. (Reference contract:
fuxictr/pytorch/torch_utils.py:26-32.)
"""

import os
import random

import numpy as np


def seed_everything(seed=1029):
    """Seed every host-side RNG the pipeline can touch."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    for seeder in (random.seed, np.random.seed):
        seeder(seed)
