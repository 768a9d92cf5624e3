"""Determinism seeding (reference `monai.utils.set_determinism`,
`monai/utils/misc.py:316`, called with 123 at `3_train.py:20`).

JAX is functionally deterministic given PRNG keys; this seeds the host-side
numpy/python RNGs the data pipeline uses and records the global seed that
training threads into `jax.random.PRNGKey`.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

_GLOBAL_SEED: Optional[int] = None


def set_determinism(seed: Optional[int] = 123) -> None:
    global _GLOBAL_SEED
    _GLOBAL_SEED = seed
    if seed is not None:
        np.random.seed(seed % (2**32))
        random.seed(seed)


def get_seed() -> Optional[int]:
    return _GLOBAL_SEED
