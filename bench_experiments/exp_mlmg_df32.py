"""Measure nodal MLMG 256^3 to rtol 1e-11 (mixed precision, df32 phase B).

Same configuration as bench.py's _mlmg_to_tolerance subprocess: x64 on,
Pallas/fused env toggles off (x64 + Mosaic don't mix in one program).
Run: IAMR_ENABLE_PALLAS=0 IAMR_FUSED=0 python exp_mlmg_df32.py [n]
"""

import json
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
    div_cell_to_node,
    nodal_solve,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dx = (1.0 / n,) * 3
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    rng = np.random.RandomState(11)
    x = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    u = tuple(jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64) for _ in range(3))
    rhs = div_cell_to_node(u, dx, bc)
    f = jax.jit(lambda r, s: nodal_solve(r, s, dx, bc, rtol=1e-11, atol=0.0,
                                         mixed=True))
    t_c = time.perf_counter()
    phi, res, it = f(rhs, sigma)
    jax.block_until_ready(phi)
    _ = float(res)
    print(f"compile+first: {time.perf_counter()-t_c:.1f}s", flush=True)
    t0 = time.perf_counter()
    phi, res, it = f(rhs, sigma)
    resf = float(res)
    secs = time.perf_counter() - t0
    bnorm = float(jnp.max(jnp.abs(rhs)))
    print("MLMG_JSON " + json.dumps(
        {"n": n, "seconds": secs, "cycles": int(it),
         "final_rel_resid": resf / bnorm}), flush=True)


if __name__ == "__main__":
    main()
