"""Profile particle advection + spectral-step components on TPU at 256^3."""

import dataclasses
import os
import sys
import time

sys.setrecursionlimit(100000)

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=5, name=""):
    out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    npart = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    from __graft_entry__ import _make
    from iamr_tpu.ns.particles import advect_with_umac, from_positions

    cfg, state = _make(n, dim=3, dtype="float32")
    geom = cfg.geom
    rng = np.random.RandomState(7)
    parts = from_positions(
        jnp.asarray(rng.rand(npart, 3) - 0.5, cfg.jdtype), dtype=cfg.jdtype
    )
    umac = tuple(
        jnp.asarray(
            rng.rand(*[n + (1 if e == d else 0) for e in range(3)]) - 0.5,
            cfg.jdtype,
        )
        for d in range(3)
    )
    dt = 0.005

    adv = jax.jit(lambda p, u: advect_with_umac(p, u, dt, geom))
    timeit(adv, parts, umac, name=f"advect_with_umac {npart} particles")

    # spectral solve costs
    from iamr_tpu.solvers.spectral import (
        solve_cell_helmholtz,
        solve_nodal_poisson,
    )

    rhs = jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float32)
    dx = geom.dx
    cellp = jax.jit(lambda b: solve_cell_helmholtz(b, 0.0, 1.0, dx))
    timeit(cellp, rhs, name="spectral cell poisson")
    cellh = jax.jit(lambda b: solve_cell_helmholtz(b, 200.0, 1e-3, dx))
    timeit(cellh, rhs, name="spectral cell helmholtz")
    rhs_n = jnp.asarray(rng.rand(n + 1, n + 1, n + 1) - 0.5, jnp.float32)
    nod = jax.jit(lambda b: solve_nodal_poisson(b, 1.0, dx))
    timeit(nod, rhs_n, name="spectral nodal poisson")

    # batched 3-component helmholtz (velocity CN diffusion shape)
    rhs3 = jnp.stack([rhs, rhs, rhs])
    bat = jax.jit(
        lambda b: jax.vmap(lambda x: solve_cell_helmholtz(x, 200.0, 1e-3, dx))(b)
    )
    timeit(bat, rhs3, name="spectral helmholtz x3 (vmap)")


if __name__ == "__main__":
    main()
