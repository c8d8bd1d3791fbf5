"""est_time_step reduction-strategy A/B at 256^3 (reductions only, no force).

Variant A (current): stack 9 fields, reshape, one max over axis 2 —
materializes the stacked array in HBM.
Variant B: per-field input-fused maxes (no stack materialization).
Usage: python exp_estdt.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=10, name=""):
    out = f(*args)
    _ = float(jnp.max(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.RandomState(0)
    vel = jnp.asarray(rng.rand(3, n, n, n), jnp.float32)
    tf = jnp.asarray(rng.rand(3, n, n, n), jnp.float32)
    gradp = jnp.asarray(rng.rand(3, n, n, n), jnp.float32)
    rho = jnp.asarray(1.0 + rng.rand(n, n, n), jnp.float32)

    @jax.jit
    def variant_a(vel, tf, gradp, rho):
        inv_rho = 1.0 / rho
        stacked = jnp.abs(jnp.stack([vel, (tf - gradp) * inv_rho,
                                     tf * inv_rho]))
        return jnp.max(stacked.reshape(3, 3, -1), axis=2)

    @jax.jit
    def variant_b(vel, tf, gradp, rho):
        inv_rho = 1.0 / rho
        ax = (1, 2, 3)
        m0 = jnp.max(jnp.abs(vel), axis=ax)
        m1 = jnp.max(jnp.abs((tf - gradp) * inv_rho), axis=ax)
        m2 = jnp.max(jnp.abs(tf * inv_rho), axis=ax)
        return jnp.stack([m0, m1, m2])

    ta = timeit(variant_a, vel, tf, gradp, rho, name="A stack+reshape max")
    tb = timeit(variant_b, vel, tf, gradp, rho, name="B per-field fused max")
    a = variant_a(vel, tf, gradp, rho)
    b = variant_b(vel, tf, gradp, rho)
    print("  match:", bool(jnp.allclose(a, b)), flush=True)


if __name__ == "__main__":
    main()
