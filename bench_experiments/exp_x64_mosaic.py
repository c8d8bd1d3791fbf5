"""Probe: does Mosaic lowering of pure-f32 kernels still break with x64
enabled in-process (the convert_element_type recursion that gated
IAMR_ENABLE_PALLAS off in every x64 subprocess — pallas_mg.pallas_ok,
bench.py _mlmg_to_tolerance)? And if it works, how fast is the mixed
nodal_solve at 256^3 rtol 1e-11 with the fused Pallas smoothers ON?

Also measures: df32 residual accuracy IN-CONTEXT (compiled into a larger
module) vs the true f64 residual on TPU — the df32 module docstring only
documents the XLA:CPU degradation; if TPU keeps it exact we can retire
the per-solve f64 applies from the timed path.

Usage: python exp_x64_mosaic.py [n]
"""

import os
import sys
import time

sys.setrecursionlimit(100000)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def _force_pallas_despite_x64():
    """Monkeypatch pallas_ok's x64 gate away (probe only)."""
    import iamr_tpu.ops.pallas_mg as pm

    orig = pm.pallas_ok

    def patched(shape, dtype, force=False):
        if jnp.dtype(dtype) != jnp.float32:
            return False
        if int(np.prod(shape)) < 16384 or shape[0] < 8:
            return False
        if len(shape) == 2 and int(np.prod(shape)) > (1 << 19):
            return False
        try:
            return jax.default_backend() not in ("cpu",)
        except Exception:
            return False

    pm.pallas_ok = patched
    return orig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    os.environ["IAMR_ENABLE_PALLAS"] = "1"
    _force_pallas_despite_x64()

    from iamr_tpu.ops.mg_nodal import (
        NodalBC, N_PERIODIC, _jacobi, _nodal_residual, build_nodal_hierarchy,
        div_cell_to_node, nodal_solve, _smooth2,
    )

    # --- probe 1: the f32 Pallas nodal sweep under x64 (small) ----------
    dxs = (1.0 / 64,) * 3
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    sig_s = jnp.ones((64, 64, 64), jnp.float32)
    levs = build_nodal_hierarchy(sig_s, dxs, bc)
    phi_s = jnp.zeros(levs[0].nshape, jnp.float32)
    rhs_s = jnp.sin(jnp.arange(65 * 65 * 65, dtype=jnp.float32)
                    ).reshape(65, 65, 65)
    try:
        out = _jacobi(phi_s, rhs_s, levs[0], bc, 2)
        out.block_until_ready()
        r = _nodal_residual(out, rhs_s, levs[0], bc)
        r.block_until_ready()
        print("PROBE1 mosaic-under-x64: OK", float(jnp.max(jnp.abs(r))))
    except Exception as e:  # noqa: BLE001
        print("PROBE1 mosaic-under-x64: FAIL", type(e).__name__, str(e)[:300])
        return

    # --- probe 2: mixed nodal_solve with Pallas forced ON ---------------
    dxn = (1.0 / n,) * 3
    rng = np.random.RandomState(11)
    x = (np.arange(n) + 0.5) / n
    X, Y, _ = np.meshgrid(x, x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    u = tuple(jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
              for _ in range(3))
    rhs = div_cell_to_node(u, dxn, bc)
    f = jax.jit(lambda r, s: nodal_solve(r, s, dxn, bc, rtol=1e-11, atol=0.0,
                                         mixed=True))
    try:
        phi, res, it = f(rhs, sigma)
        jax.block_until_ready(phi)
        resf = float(res)
        t0 = time.perf_counter()
        phi, res, it = f(rhs, sigma)
        jax.block_until_ready(phi)
        resf = float(res)
        secs = time.perf_counter() - t0
        bnorm = float(jnp.max(jnp.abs(rhs)))
        print(f"PROBE2 mlmg pallas-on: {secs:.3f} s, cycles={int(it)}, "
              f"rel={resf / bnorm:.3e}")
    except Exception as e:  # noqa: BLE001
        print("PROBE2 mlmg pallas-on: FAIL", type(e).__name__, str(e)[:300])

    # --- probe 3: df32 residual accuracy in a compiled context on TPU ---
    from iamr_tpu.ops.df32 import residual_nodal_df

    levels = build_nodal_hierarchy(sigma, dxn, bc)
    lev0 = levels[0]
    phi0 = jnp.asarray(
        rng.rand(*lev0.nshape) - 0.5, jnp.float64)

    def both(phi):
        rdf = residual_nodal_df(phi, rhs, lev0.sigma, lev0.mask, lev0.dx, bc)
        rf64 = _smooth2(phi, rhs, lev0, bc, 0, True)[1]
        # fold in extra work so the module is "large" like a solver
        s = phi
        for _ in range(4):
            s = s + 0.1 * _smooth2(s, rhs, lev0, bc, 0, True)[1]
        return rdf, rf64, jnp.max(jnp.abs(s))

    try:
        rdf, rf64, _ = jax.jit(both)(phi0)
        err = float(jnp.max(jnp.abs(rdf - rf64)))
        bnorm = float(jnp.max(jnp.abs(rhs)))
        print(f"PROBE3 df32-vs-f64 in-context: max|d|/bnorm = {err/bnorm:.3e}")
    except Exception as e:  # noqa: BLE001
        print("PROBE3 df32: FAIL", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
