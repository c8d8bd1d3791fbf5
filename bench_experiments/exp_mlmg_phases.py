"""Time the mixed-precision nodal MLMG-to-1e-11 solve phase by phase.

Diagnoses the round-2 regression: after the phase-B incremental-residual
restructure the bench MLMG number moved 2.3 s -> 13.3 s. Times each
component op (f64 residual apply, df32 residual, f32 V-cycle) and the full
solve, printing cycle counts. Run on the TPU: python exp_mlmg_phases.py [n]
(x64 process; IAMR_ENABLE_PALLAS/IAMR_FUSED forced off like bench.py).
"""

import os
import sys
import time

os.environ.setdefault("IAMR_ENABLE_PALLAS", "0")
os.environ.setdefault("IAMR_FUSED", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=3, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from iamr_tpu.ops.mg_nodal import (
        NodalBC, N_PERIODIC, div_cell_to_node, nodal_solve,
        build_nodal_hierarchy, _smooth2, _nodal_vcycle,
    )
    from iamr_tpu.ops.df32 import residual_nodal_df

    dx = (1.0 / n,) * 3
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    rng = np.random.RandomState(11)
    x = (np.arange(n) + 0.5) / n
    X, Y, _Z = np.meshgrid(x, x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    u = tuple(jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
              for _ in range(3))
    rhs = jax.jit(lambda uu: div_cell_to_node(uu, dx, bc))(u)
    jax.block_until_ready(rhs)

    levels = build_nodal_hierarchy(sigma, dx, bc)
    lev0 = levels[0]
    levels32 = build_nodal_hierarchy(sigma.astype(jnp.float32), dx, bc)

    phi = jnp.zeros(lev0.nshape, jnp.float64)

    # NOTE: rhs/sigma/hierarchy must be jit ARGUMENTS — captured as jit
    # constants they embed 134MB f64 literals in the HLO and the axon
    # remote-compile endpoint rejects the request (HTTP 413).
    f64res = jax.jit(lambda p, r, lv: _smooth2(p, r, lv, bc, 0, True)[1])
    dfres = jax.jit(lambda p, r, lv: residual_nodal_df(
        p, r, lv.sigma, lv.mask, lv.dx, bc))
    vcyc = jax.jit(lambda r, lvs: _nodal_vcycle(
        r.astype(jnp.float32), lvs, bc, 0, 2, 2, 40, None))

    timeit(f64res, phi, rhs, lev0, name="f64 residual apply (27pt FEM)")
    timeit(dfres, phi, rhs, lev0, name="df32 compensated residual")
    timeit(vcyc, rhs, levels32, name="f32 V-cycle (incl f64->f32 cast)")

    solve = jax.jit(lambda r, s: nodal_solve(
        r, s, dx, bc, rtol=1e-11, atol=0.0, mixed=True))
    phi1, res, it = solve(rhs, sigma)
    jax.block_until_ready(phi1)
    t0 = time.perf_counter()
    phi1, res, it = solve(rhs, sigma)
    jax.block_until_ready(phi1)
    dt = time.perf_counter() - t0
    bnorm = float(jnp.max(jnp.abs(rhs)))
    print(f"  full mixed solve: {dt:.2f} s, cycles={int(it)}, "
          f"rel={float(res)/bnorm:.2e}", flush=True)


if __name__ == "__main__":
    main()
