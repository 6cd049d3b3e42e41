"""Deterministic RNG plumbing.

The reference seeds python/numpy/torch with 123 everywhere
(common_utils/set_random_seed.py:6-10). Here host-side sampling uses
numpy Generators derived from a root seed, and device-side randomness uses
jax.random keys folded per step/epoch — fully reproducible and
parallelism-invariant.
"""

from __future__ import annotations

import random

import numpy as np

DEFAULT_SEED = 123


def set_host_seed(seed: int = DEFAULT_SEED) -> None:
    """Seed python + numpy global RNGs (legacy-compatible entry point)."""
    random.seed(seed)
    np.random.seed(seed)


def host_rng(seed: int = DEFAULT_SEED, *streams: int) -> np.random.Generator:
    """An independent numpy Generator for a named stream hierarchy, e.g.
    host_rng(123, epoch, worker_id)."""
    return np.random.default_rng(np.random.SeedSequence((seed, *streams)))


def jax_key(seed: int = DEFAULT_SEED, *folds: int):
    import jax

    key = jax.random.PRNGKey(seed)
    for f in folds:
        key = jax.random.fold_in(key, f)
    return key
