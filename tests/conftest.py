"""Test harness: fake 8-device CPU platform + float64 for oracle parity.

Mirrors SURVEY.md section 4's test pyramid: golden-trace parity against the
NumPy oracle runs in float64 (bit-exactness), multi-chip sharding tests run
on 8 virtual CPU devices via --xla_force_host_platform_device_count.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel); the env
# var alone does not win against the plugin, so force CPU through the config.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
