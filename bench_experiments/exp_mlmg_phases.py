"""Break the 256^3 mixed-precision nodal MLMG solve into its per-cycle
components and time each ON CHIP, jitted separately:

    vcycle_f32    one f32 V-cycle (smoothers, restrict/prolong, bottom)
    fmg_f32       the FMG opening F-cycle
    resid_df      compensated-f32 residual (phase-A driver)
    resid_f64     true f64 residual (emulated f64 on TPU)
    demean        invariant-sum mean projection (singular systems)
    maxabs        the while_loop's convergence-norm reduction

The tolerance solve (exp_mlmg_df32.py) runs ~8 cycles in ~1.2 s =
~150 ms/cycle, ~100x above the f32 V-cycle roofline (~1 GB of traffic)
— this attributes where the per-cycle time actually goes so the <0.6 s
target is optimization, not guessing.

Run: IAMR_ENABLE_PALLAS=0 IAMR_FUSED=0 python exp_mlmg_phases.py [n]
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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from iamr_tpu.ops.mg_nodal import (
    NodalBC,
    N_PERIODIC,
    _bottom_dense_inv_nodal,
    _nodal_fmg,
    _nodal_vcycle,
    _smooth2,
    build_nodal_hierarchy,
    div_cell_to_node,
)
from iamr_tpu.ops.df32 import residual_nodal_df
from iamr_tpu.parallel.reduce import invariant_sum


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # true sync: scalar device->host transfer
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dx = (1.0 / n,) * 3
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    rng = np.random.RandomState(11)
    x = (np.arange(n) + 0.5) / n
    X, Y, _ = np.meshgrid(x, x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    sigma64 = jnp.asarray(1.0 / rho, jnp.float64)
    u = tuple(
        jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64) for _ in range(3)
    )
    rhs64 = div_cell_to_node(u, dx, bc)
    rhs32 = rhs64.astype(jnp.float32)

    levels64 = build_nodal_hierarchy(sigma64, dx, bc, stop_dofs=1000)
    levels32 = build_nodal_hierarchy(
        sigma64.astype(jnp.float32), dx, bc, stop_dofs=1000
    )
    binv = _bottom_dense_inv_nodal(levels32[-1], bc)
    lev0_64 = levels64[0]

    phases = {
        "vcycle_f32": (jax.jit(
            lambda r: _nodal_vcycle(r, levels32, bc, 0, 2, 2, 40, binv)
        ), (rhs32,)),
        "fmg_f32": (jax.jit(
            lambda r: _nodal_fmg(r, levels32, bc, 2, 2, 40, binv)
        ), (rhs32,)),
        "resid_df": (jax.jit(
            lambda p: residual_nodal_df(
                p, rhs64, lev0_64.sigma, lev0_64.mask, lev0_64.dx, bc
            )
        ), (rhs64 * 0.1,)),
        "resid_f64": (jax.jit(
            lambda p: _smooth2(p, rhs64, lev0_64, bc, 0, True)[1]
        ), (rhs64 * 0.1,)),
        "demean_f64": (jax.jit(
            lambda r: r - invariant_sum(r) / float(np.prod(r.shape))
        ), (rhs64,)),
        "maxabs_f64": (jax.jit(lambda r: jnp.max(jnp.abs(r))), (rhs64,)),
        "maxabs_f32": (jax.jit(lambda r: jnp.max(jnp.abs(r))), (rhs32,)),
        "cast_f64_f32": (jax.jit(lambda r: r.astype(jnp.float32)), (rhs64,)),
    }
    for name, (f, args) in phases.items():
        try:
            t = timeit(f, *args)
            print(f"{name}: {t:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
