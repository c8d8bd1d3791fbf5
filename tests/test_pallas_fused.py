"""Exactness tests for the fused multi-sweep Pallas smoothers.

The fused kernels (ops/pallas_fused.py) must reproduce the XLA reference
smoothers (mg._smooth_rb + mg._residual, mg_nodal._jacobi +
mg_nodal._nodal_residual) to f32 roundoff in BOTH placements (whole-array
and overlapping-slab), for every BC kind, with and without the alpha
stream. Run in Pallas interpret mode on CPU (same arithmetic as Mosaic).

Reference smoothers being fused: AMReX MLMG GSRB (MLABecLaplacian,
Source/Diffusion.cpp:345-352) and Jacobi (MLNodeLaplacian,
Source/Projection.cpp:2512).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iamr_tpu.ops import mg
from iamr_tpu.ops import mg_nodal as mn
from iamr_tpu.ops.mg import (
    DIRICHLET,
    NEUMANN,
    PERIODIC,
    PoissonBC,
    build_hierarchy,
)
from iamr_tpu.ops.mg_nodal import (
    N_DIRICHLET,
    N_NEUMANN,
    N_PERIODIC,
    NodalBC,
    build_nodal_hierarchy,
)
from iamr_tpu.ops.pallas_fused import cell_smooth_fused, nodal_smooth_fused

P, D, N = PERIODIC, DIRICHLET, NEUMANN


def _mkbeta(rng, shape, bc):
    dim = len(shape)
    out = []
    for d in range(dim):
        bshape = [s + (1 if d == e else 0) for e, s in enumerate(shape)]
        bd = (0.5 + rng.rand(*bshape)).astype(np.float32)
        if bc.lo[d] == PERIODIC:
            # production face arrays are periodic-consistent (built from
            # wrap ghosts): face n == face 0
            idx_hi = [slice(None)] * dim
            idx_hi[d] = -1
            idx_lo = [slice(None)] * dim
            idx_lo[d] = 0
            bd[tuple(idx_hi)] = bd[tuple(idx_lo)]
        out.append(jnp.asarray(bd))
    return tuple(out)


CELL_CASES = [
    ((16, 16, 16), PoissonBC((P, P, P), (P, P, P)), 0.0, 2, "whole"),
    ((16, 16, 16), PoissonBC((D, N, P), (N, D, P)), 1.0, 2, "whole"),
    ((16, 16), PoissonBC((D, P), (N, P)), 1.0, 1, "whole"),
    ((32, 16, 16), PoissonBC((P, P, P), (P, P, P)), 0.0, 2, "slab"),
    ((32, 16, 16), PoissonBC((D, N, D), (N, D, N)), 1.0, 2, "slab"),
    ((32, 16, 16), PoissonBC((D, P, P), (D, P, P)), 0.0, 1, "slab"),
    ((48, 16, 16), PoissonBC((N, P, D), (D, P, N)), 1.0, 2, "slab"),
]


@pytest.mark.parametrize("shape,bc,a,nsweeps,mode", CELL_CASES)
def test_cell_fused_matches_xla(shape, bc, a, nsweeps, mode):
    rng = np.random.RandomState(0)
    dx = tuple(1.0 / s for s in shape)
    phi = jnp.asarray(rng.rand(*shape), jnp.float32)
    rhs = jnp.asarray(rng.rand(*shape), jnp.float32)
    alpha = (
        jnp.asarray(1.0 + rng.rand(*shape), jnp.float32) if a != 0 else None
    )
    beta = _mkbeta(rng, shape, bc)
    b = 0.7
    alpha_ref = alpha if alpha is not None else jnp.zeros(shape, jnp.float32)
    lev = build_hierarchy(alpha_ref, beta, a, b, dx, bc)[0]
    pr = mg._smooth_rb(phi, rhs, lev, a, b, bc, nsweeps)
    rr = mg._residual(pr, rhs, lev, a, b, bc)
    pf, rf = cell_smooth_fused(
        phi, rhs, alpha, beta, a, b, dx, bc.lo, bc.hi,
        nsweeps, True, interpret=True, mode=mode,
    )
    assert float(jnp.max(jnp.abs(pf - pr))) < 1e-5
    assert float(jnp.max(jnp.abs(rf - rr))) < 2e-3


NODAL_CASES = [
    ((16, 16, 16), NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3), 2, "whole"),
    (
        (16, 16, 16),
        NodalBC((N_NEUMANN, N_DIRICHLET, N_PERIODIC),
                (N_DIRICHLET, N_NEUMANN, N_PERIODIC)),
        2,
        "whole",
    ),
    ((16, 16), NodalBC((N_NEUMANN, N_PERIODIC), (N_DIRICHLET, N_PERIODIC)),
     3, "whole"),
    ((32, 16, 16), NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3), 2, "slab"),
    (
        (32, 16, 16),
        NodalBC((N_NEUMANN, N_DIRICHLET, N_NEUMANN),
                (N_DIRICHLET, N_NEUMANN, N_DIRICHLET)),
        2,
        "slab",
    ),
    (
        (48, 16, 16),
        NodalBC((N_NEUMANN, N_PERIODIC, N_DIRICHLET),
                (N_NEUMANN, N_PERIODIC, N_DIRICHLET)),
        3,
        "slab",
    ),
]


@pytest.mark.parametrize("cshape,bc,nsweeps,mode", NODAL_CASES)
def test_nodal_fused_matches_xla(cshape, bc, nsweeps, mode):
    rng = np.random.RandomState(1)
    dim = len(cshape)
    nshape = tuple(c + 1 for c in cshape)
    dx = tuple(1.0 / c for c in cshape)
    sigma = jnp.asarray(0.5 + rng.rand(*cshape), jnp.float32)
    phi = jnp.asarray(rng.rand(*nshape), jnp.float32)
    rhs = jnp.asarray(rng.rand(*nshape), jnp.float32)
    # periodic dims: duplicated-DOF consistency (phi[0] == phi[-1])
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            iL = [slice(None)] * dim
            iL[d] = 0
            iH = [slice(None)] * dim
            iH[d] = -1
            phi = phi.at[tuple(iH)].set(phi[tuple(iL)])
            rhs = rhs.at[tuple(iH)].set(rhs[tuple(iL)])
    lev = build_nodal_hierarchy(sigma, dx, bc)[0]
    pr = mn._jacobi(phi, rhs, lev, bc, nsweeps)
    rr = mn._nodal_residual(pr, rhs, lev, bc)
    # lev.omega: the divergence-safe damping (< 0.85 on the anisotropic
    # cases here) — must match what _jacobi used
    pf, rf = nodal_smooth_fused(
        phi, sigma, rhs, dx, bc.lo, bc.hi, lev.omega,
        nsweeps, True, interpret=True, mode=mode,
    )
    scale = max(float(jnp.max(jnp.abs(rr))), 1.0)
    assert float(jnp.max(jnp.abs(pf - pr))) < 1e-5
    assert float(jnp.max(jnp.abs(rf - rr))) < 1e-3 * scale


def test_fused_forced_mg_solve_converges(monkeypatch):
    """End-to-end: mg_solve with the fused path forced (interpret mode)
    converges on a manufactured periodic Poisson problem in f32."""
    monkeypatch.setenv("IAMR_FUSED", "1")
    n = 32
    shape = (n, n, n)
    dx = tuple(1.0 / n for _ in range(3))
    x = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    phi_ex = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y) * np.sin(
        2 * np.pi * Z
    )
    rhs = 3 * (2 * np.pi) ** 2 * phi_ex
    bc = PoissonBC((P,) * 3, (P,) * 3)
    beta = tuple(
        jnp.ones(
            tuple(nn + (1 if d == e else 0) for e, nn in enumerate(shape)),
            jnp.float32,
        )
        for d in range(3)
    )
    # rtol 1e-5: the pure-f32 roundoff floor at 32^3 is ~1.5e-6 relative
    # (mixed-precision iterative refinement handles tighter tolerances)
    phi, res, it = mg.mg_solve(
        jnp.asarray(rhs, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        beta, 0.0, 1.0, dx, bc, rtol=1e-5,
    )
    err = float(
        jnp.max(jnp.abs(phi - jnp.mean(phi) - (phi_ex - phi_ex.mean())))
    )
    assert float(res) < 1e-5 * float(jnp.max(jnp.abs(jnp.asarray(rhs))))
    assert err < 5e-3  # discretization error at 32^3


def test_mixed_precision_cell_reaches_f64_tolerance():
    """Iterative refinement: f32 V-cycles with f64 residual/correction
    reach rtol 1e-11 on an f64 variable-coefficient problem (the
    tolerance the pure-f32 path stalls 5 decades short of)."""
    n = 32
    shape = (n, n, n)
    dx = tuple(1.0 / n for _ in range(3))
    rng = np.random.RandomState(5)
    x = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    rhs = jnp.asarray(
        np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) * np.sin(2 * np.pi * Z),
        jnp.float64,
    )
    alpha = jnp.asarray(1.0 + rng.rand(*shape), jnp.float64)
    bc = PoissonBC((P, D, N), (P, N, D))
    beta = []
    for d in range(3):
        bshape = [s + (1 if d == e else 0) for e, s in enumerate(shape)]
        bd = (0.5 + rng.rand(*bshape)).astype(np.float64)
        if d == 0:
            bd[-1] = bd[0]
        beta.append(jnp.asarray(bd))
    phi, res, it = mg.mg_solve(
        rhs, alpha, tuple(beta), 1.0, 0.1, dx, bc, rtol=1e-11, mixed=True,
    )
    bnorm = float(jnp.max(jnp.abs(rhs)))
    assert float(res) < 1e-11 * bnorm, (float(res), int(it))
    assert phi.dtype == jnp.float64


def test_mixed_precision_nodal_reaches_f64_tolerance():
    from iamr_tpu.ops.mg_nodal import nodal_solve

    n = 32
    cshape = (n, n, n)
    nshape = (n + 1,) * 3
    dx = tuple(1.0 / n for _ in range(3))
    rng = np.random.RandomState(6)
    sigma = jnp.asarray(0.5 + rng.rand(*cshape), jnp.float64)
    rhs = jnp.asarray(rng.rand(*nshape) - 0.5, jnp.float64)
    bc = NodalBC((N_NEUMANN, N_DIRICHLET, N_NEUMANN),
                 (N_DIRICHLET, N_NEUMANN, N_DIRICHLET))
    phi, res, it = nodal_solve(rhs, sigma, dx, bc, rtol=1e-11, mixed=True)
    # nodal_solve masks the rhs; compare against the masked norm
    from iamr_tpu.ops.mg_nodal import build_nodal_hierarchy

    mask = build_nodal_hierarchy(sigma, dx, bc)[0].mask
    bnorm = float(jnp.max(jnp.abs(mask * rhs)))
    assert float(res) < 1e-11 * bnorm, (float(res), int(it))
    assert phi.dtype == jnp.float64


SR_CASES = [
    ((32, 16, 16), NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3), 2, True),
    (
        (32, 16, 16),
        NodalBC((N_NEUMANN, N_DIRICHLET, N_NEUMANN),
                (N_DIRICHLET, N_NEUMANN, N_DIRICHLET)),
        2,
        True,
    ),
    (
        (24, 16, 16),
        NodalBC((N_NEUMANN, N_PERIODIC, N_DIRICHLET),
                (N_NEUMANN, N_PERIODIC, N_DIRICHLET)),
        3,
        False,
    ),
    ((32, 16, 16), NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3), 0, True),
]


@pytest.mark.parametrize("cshape,bc,nsweeps,wr", SR_CASES)
def test_nodal_sr_matches_xla(cshape, bc, nsweeps, wr):
    """The production scratch-ref fused nodal kernel reproduces the XLA
    smoother + masked residual exactly (interpret mode)."""
    from iamr_tpu.ops.pallas_fused import nodal_smooth_sr

    rng = np.random.RandomState(2)
    dim = len(cshape)
    nshape = tuple(c + 1 for c in cshape)
    dx = tuple(1.0 / c for c in cshape)
    sigma = jnp.asarray(0.5 + rng.rand(*cshape), jnp.float32)
    phi = jnp.asarray(rng.rand(*nshape), jnp.float32)
    rhs = jnp.asarray(rng.rand(*nshape), jnp.float32)
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            iL = [slice(None)] * dim
            iL[d] = 0
            iH = [slice(None)] * dim
            iH[d] = -1
            phi = phi.at[tuple(iH)].set(phi[tuple(iL)])
            rhs = rhs.at[tuple(iH)].set(rhs[tuple(iL)])
    lev = build_nodal_hierarchy(sigma, dx, bc)[0]
    omega = 0.85
    pr = mn._jacobi(phi, rhs, lev, bc, nsweeps, omega)
    rr = mn._nodal_residual(pr, rhs, lev, bc)
    upd = omega * lev.mask / lev.diag
    pf, rf = nodal_smooth_sr(
        phi, sigma, rhs, upd, lev.mask, dx, bc.lo, nsweeps, wr,
        interpret=True,
    )
    scale = max(float(jnp.max(jnp.abs(rr))), 1.0)
    assert float(jnp.max(jnp.abs(pf - pr))) < 1e-5
    if wr:
        assert float(jnp.max(jnp.abs(rf - rr))) < 1e-3 * scale
