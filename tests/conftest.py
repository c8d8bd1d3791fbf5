"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Correctness tests run in f64 on a virtual 8-device CPU mesh (matching how the
driver dry-runs multi-chip sharding); TPU benchmarking is separate (bench.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's sitecustomize force-registers the axon TPU backend with
# jax_platforms="axon,cpu" (env JAX_PLATFORMS is overridden); force CPU here
# so correctness tests run in true f64 with fast local compiles
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the jitted step/solver programs are large and
# CPU XLA compiles are slow; cache them across test processes
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
