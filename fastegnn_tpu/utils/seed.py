"""Seeding (reference ``utils/seed.py:7-15`` equivalent).

The reference seeds python/numpy/torch and flips cudnn to deterministic.
In JAX, device randomness is explicit (PRNG keys threaded through the
program), so determinism only needs the host-side generators seeded plus a
root key; ``fix_seed`` returns that key.
"""

from __future__ import annotations

import random

import numpy as np


def fix_seed(seed: int = 43):
    """Seed python + numpy and return a root ``jax.random`` key."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
