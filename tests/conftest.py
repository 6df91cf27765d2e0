"""Test configuration: run JAX on 8 virtual CPU devices so multi-chip
sharding paths are exercised without TPU hardware (the JAX-native way to test
an 8-way mesh).

Note: the environment's sitecustomize pre-imports jax and pins the 'axon'
TPU platform, so a plain env var is not enough — we must also update
jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# exact f32 matmuls for parity testing against torch (TPU runs may use
# bf16 DEFAULT precision for speed; tests pin numerics)
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: compiles dominate this suite's wall time on
# the 1-core CI host (the slow tier's CLI subprocesses recompile the same
# graphs every run). The cache is cross-process — CLI tests inherit it via
# the environment (subprocesses are launched with env=dict(os.environ, ...)).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/havatar_jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
