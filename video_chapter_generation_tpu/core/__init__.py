"""Core scaffolding: config tree, seeding, checkpointing, metric writers."""

from .config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from .seeding import DEFAULT_SEED, host_rng, jax_key, set_host_seed

__all__ = [
    "Config",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "DEFAULT_SEED",
    "host_rng",
    "jax_key",
    "set_host_seed",
]
