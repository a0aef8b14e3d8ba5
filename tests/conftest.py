"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md section 4's prescription: the reference never tested its
DDP path without real GPUs; we test multi-chip sharding on forced host
devices every run. (``jax.config.update`` is required because the axon TPU
plugin overrides the ``JAX_PLATFORMS`` env var.)
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
