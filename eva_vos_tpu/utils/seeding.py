"""Determinism helpers (reference ``util/dist.py:55-57``)."""

from __future__ import annotations

import random

import numpy as np

DEFAULT_SEED = 29102910


def seed_everything(seed: int = DEFAULT_SEED):
    np.random.seed(seed)
    random.seed(seed)
    return seed
