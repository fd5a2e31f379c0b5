"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the standard JAX pattern for testing pjit/shard_map without a TPU
pod — SURVEY.md §4).

Note: on the axon box the JAX_PLATFORMS env var alone is overridden by the
TPU plugin; the jax.config.update after import is what actually pins CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from meta_interpolation_tpu.core.compile_cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()
