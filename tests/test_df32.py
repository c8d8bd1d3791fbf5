"""Compensated-f32 (df32) residuals: accuracy against the native-f64
residuals, and end-to-end mixed-precision solves reaching reference
tolerances (nodal_proj rtol 1e-12 scale, Source/Projection.cpp:18-20) with
the df32 outer residual in the loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iamr_tpu.ops.mg import (DIRICHLET, NEUMANN, PERIODIC, PoissonBC,
                             _pad_phi, apply_op, mg_solve)
from iamr_tpu.ops.mg_nodal import (N_DIRICHLET, N_PERIODIC, NodalBC,
                                   apply_nodal, build_nodal_hierarchy,
                                   div_cell_to_node, nodal_solve)

jax.config.update("jax_enable_x64", True)


def _hit_like(n, seed=3):
    rng = np.random.RandomState(seed)
    x = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    u = tuple(jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
              for _ in range(3))
    return rho, u


def test_nodal_df32_residual_matches_f64():
    from iamr_tpu.ops.df32 import residual_nodal_df

    n = 64
    dx = (1.0 / n,) * 3
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    rho, u = _hit_like(n)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    rhs = div_cell_to_node(u, dx, bc)
    phi, _, _ = nodal_solve(rhs, sigma, dx, bc, rtol=1e-8, atol=0.0,
                            mixed=False)
    lev = build_nodal_hierarchy(sigma, dx, bc)[0]
    r64 = lev.mask * (rhs - apply_nodal(phi, sigma, dx, bc))
    rdf = residual_nodal_df(phi, rhs, sigma, lev.mask, dx, bc)
    bnorm = float(jnp.max(jnp.abs(rhs)))
    err = float(jnp.max(jnp.abs(rdf - r64)))
    assert err / bnorm < 1e-12, err / bnorm


def test_nodal_df32_residual_dirichlet_outflow():
    from iamr_tpu.ops.df32 import residual_nodal_df

    n = 32
    dx = (1.0 / n,) * 3
    bc = NodalBC((N_PERIODIC, N_PERIODIC, N_PERIODIC),
                 (N_PERIODIC, N_PERIODIC, N_DIRICHLET))
    rho, u = _hit_like(n, seed=5)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    rhs = div_cell_to_node(u, dx, bc)
    phi, _, _ = nodal_solve(rhs, sigma, dx, bc, rtol=1e-8, atol=0.0,
                            mixed=False)
    lev = build_nodal_hierarchy(sigma, dx, bc)[0]
    r64 = lev.mask * (rhs - apply_nodal(phi, sigma, dx, bc))
    rdf = residual_nodal_df(phi, rhs, sigma, lev.mask, dx, bc)
    bnorm = float(jnp.max(jnp.abs(rhs)))
    assert float(jnp.max(jnp.abs(rdf - r64))) / bnorm < 1e-12


def test_cell_df32_residual_matches_f64():
    from iamr_tpu.ops.df32 import residual_cell_df

    n = 48
    dx = (1.0 / n, 1.2 / n, 0.8 / n)
    bc = PoissonBC((PERIODIC, DIRICHLET, NEUMANN),
                   (PERIODIC, DIRICHLET, NEUMANN))
    rng = np.random.RandomState(9)
    alpha = jnp.asarray(1.0 + rng.rand(n, n, n), jnp.float64)
    beta = tuple(
        jnp.asarray(0.5 + rng.rand(*shp), jnp.float64)
        for shp in ((n + 1, n, n), (n, n + 1, n), (n, n, n + 1))
    )
    phi = jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
    rhs = jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
    a, b = 1.0, 0.37
    r64 = rhs - apply_op(_pad_phi(phi, bc), alpha, beta, a, b, dx,
                         (n, n, n))
    rdf = residual_cell_df(phi, rhs, alpha, beta, a, b, dx, bc)
    scale = float(jnp.max(jnp.abs(r64)) + jnp.max(jnp.abs(rhs)))
    assert float(jnp.max(jnp.abs(rdf - r64))) / scale < 1e-12
    # traced-scalar b (the CN theta*dt path)
    rdf2 = residual_cell_df(phi, rhs, alpha, beta, a,
                            jnp.asarray(b, jnp.float64), dx, bc)
    assert float(jnp.max(jnp.abs(rdf2 - r64))) / scale < 1e-12


@pytest.mark.slow
def test_mixed_solves_reach_tolerance_with_df32_residual():
    # nodal: variable-sigma periodic projection solve to rtol 1e-11
    n = 64
    dx = (1.0 / n,) * 3
    nbc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    rho, u = _hit_like(n, seed=11)
    sigma = jnp.asarray(1.0 / rho, jnp.float64)
    rhs = div_cell_to_node(u, dx, nbc)
    phi, res, it = nodal_solve(rhs, sigma, dx, nbc, rtol=1e-11, atol=0.0,
                               mixed=True)
    lev = build_nodal_hierarchy(sigma, dx, nbc)[0]
    true_res = float(jnp.max(jnp.abs(
        lev.mask * (rhs - apply_nodal(phi, sigma, dx, nbc)))))
    bnorm = float(jnp.max(jnp.abs(rhs)))
    assert true_res / bnorm < 2e-11, (true_res / bnorm, int(it))

    # cell: ABecLap solve to rtol 1e-11, mixed with df32 residual
    cbc = PoissonBC((PERIODIC, DIRICHLET, NEUMANN),
                    (PERIODIC, DIRICHLET, NEUMANN))
    rng = np.random.RandomState(13)
    alpha = jnp.asarray(1.0 + rng.rand(n, n, n), jnp.float64)
    beta = tuple(
        jnp.asarray(0.5 + rng.rand(*shp), jnp.float64)
        for shp in ((n + 1, n, n), (n, n + 1, n), (n, n, n + 1))
    )
    crhs = jnp.asarray(rng.rand(n, n, n) - 0.5, jnp.float64)
    a, b = 1.0, 0.01
    cphi, cres, cit = mg_solve(crhs, alpha, beta, a, b, dx, cbc,
                               rtol=1e-11, atol=0.0, mixed=True)
    r = crhs - apply_op(_pad_phi(cphi, cbc), alpha, beta, a, b, dx,
                        (n, n, n))
    cb = float(jnp.max(jnp.abs(crhs)))
    assert float(jnp.max(jnp.abs(r))) / cb < 2e-11, int(cit)
