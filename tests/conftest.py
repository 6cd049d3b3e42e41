"""Test configuration: force an 8-device virtual CPU platform BEFORE any
test imports jax, so multi-chip sharding tests run anywhere (the TPU-world
analogue of the reference's gloo-on-CPU DDP fallback,
train_video_segment_ddp.py:64-67).

Note: this environment pre-sets jax_platforms="axon,cpu" (a tunneled TPU);
env vars alone don't override it, so we update jax.config directly before
the backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
