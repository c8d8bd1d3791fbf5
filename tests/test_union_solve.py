"""Level-wide union-of-boxes solves (the multi-box fine-level solve).

The reference's MLMG solves each AMR level across its whole BoxArray
(SURVEY.md section 2.2); here the union of boxes embeds in the bounding
box with interior Dirichlet 'hole' data, as a pure coefficient transform
(mg.union_dirichlet_coeffs) / node-mask extension (mg_nodal mask0).

Each test assembles the EXACT intended linear system densely (operator
columns on the union, identity on holes, rhs lifted by the hole data) and
checks the MG union solve against the direct numpy solution to ~1e-10.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iamr_tpu.ops import mg
from iamr_tpu.ops import mg_nodal as mn


def _l_mask(shape, dtype):
    """L-shaped union: [0:nx, 0:ny/2] + [0:nx/2, ny/2:ny]."""
    m = np.zeros(shape)
    m[:, : shape[1] // 2] = 1.0
    m[: shape[0] // 2, shape[1] // 2:] = 1.0
    return jnp.asarray(m, dtype)


def _rand_beta(shape, rng, dtype):
    out = []
    for d in range(len(shape)):
        shp = list(shape)
        shp[d] += 1
        out.append(jnp.asarray(0.5 + rng.random(shp), dtype))
    return tuple(out)


@pytest.mark.parametrize("a", [1.0, 0.0])
def test_cell_union_matches_dense(a):
    rng = np.random.default_rng(3)
    shape = (16, 16)
    dx = (1.0 / 16, 1.0 / 16)
    dtype = jnp.float64
    mask = _l_mask(shape, dtype)
    alpha = jnp.asarray(0.5 + rng.random(shape), dtype)
    beta = _rand_beta(shape, rng, dtype)
    bc = mg.PoissonBC(lo=(mg.DIRICHLET, mg.DIRICHLET),
                      hi=(mg.DIRICHLET, mg.DIRICHLET))
    rhs = jnp.asarray(rng.standard_normal(shape), dtype) * mask
    g = jnp.asarray(rng.standard_normal(shape), dtype)  # hole Dirichlet data

    phi, res, it = mg.mg_solve(
        rhs, alpha, beta, a, 1.0, dx, bc, rtol=1e-13, atol=1e-16,
        interior_mask=mask, interior_vals=g,
    )

    # dense assembly of the intended system: union rows of the full
    # (bc-ghosted) operator with hole columns zeroed + identity holes
    ndof = shape[0] * shape[1]
    eye = jnp.eye(ndof, dtype=dtype).reshape((ndof,) + shape)
    cols = jax.vmap(
        lambda e: (mask * mg.apply_op(
            mg._pad_phi(mask * e, bc), alpha, beta, a, 1.0, dx, shape
        )).ravel()
    )(eye)
    A = np.asarray(cols.T)
    A = A + np.diag(1.0 - np.asarray(mask).ravel())
    g_ext = (1.0 - mask) * g
    b_eff = mask * (rhs - mg.apply_op(
        mg._pad_phi(g_ext, bc), alpha, beta, a, 1.0, dx, shape
    ))
    x = np.linalg.solve(A, np.asarray(b_eff).ravel()).reshape(shape)
    want = x + np.asarray(g_ext)

    err = np.max(np.abs(np.asarray(phi) - want))
    assert err < 1e-10, (err, float(res), int(it))


def test_cell_union_full_mask_is_plain_solve():
    """mask == all ones must reproduce the unmasked solve exactly."""
    rng = np.random.default_rng(5)
    shape = (16, 16)
    dx = (1.0 / 16, 1.0 / 16)
    dtype = jnp.float64
    alpha = jnp.asarray(0.5 + rng.random(shape), dtype)
    beta = _rand_beta(shape, rng, dtype)
    bc = mg.PoissonBC(lo=(mg.DIRICHLET, mg.NEUMANN),
                      hi=(mg.DIRICHLET, mg.DIRICHLET))
    rhs = jnp.asarray(rng.standard_normal(shape), dtype)
    phi0, _, _ = mg.mg_solve(rhs, alpha, beta, 1.0, 1.0, dx, bc, rtol=1e-13)
    phi1, _, _ = mg.mg_solve(
        rhs, alpha, beta, 1.0, 1.0, dx, bc, rtol=1e-13,
        interior_mask=jnp.ones(shape, dtype),
        interior_vals=jnp.zeros(shape, dtype),
    )
    assert np.max(np.abs(np.asarray(phi0) - np.asarray(phi1))) < 1e-12


def test_nodal_union_matches_dense():
    rng = np.random.default_rng(7)
    cshape = (16, 16)
    nshape = (17, 17)
    dx = (1.0 / 16, 1.0 / 16)
    dtype = jnp.float64
    cellmask = _l_mask(cshape, dtype)
    sigma = jnp.asarray(0.5 + rng.random(cshape), dtype) * cellmask
    bc = mn.NodalBC(lo=(mn.N_DIRICHLET, mn.N_DIRICHLET),
                    hi=(mn.N_DIRICHLET, mn.N_DIRICHLET))
    # interior nodes: every adjacent cell is a union cell
    mp = np.pad(np.asarray(cellmask), 1, constant_values=0.0)
    nmask = np.ones(nshape)
    for tx in (0, 1):
        for ty in (0, 1):
            nmask *= mp[tx:tx + 17, ty:ty + 17]
    nmask = jnp.asarray(nmask, dtype)
    rhs = jnp.asarray(rng.standard_normal(nshape), dtype) * nmask
    phi_bc = jnp.asarray(rng.standard_normal(nshape), dtype)

    phi, res, it = mn.nodal_solve(
        rhs, sigma, dx, bc, rtol=1e-13, atol=1e-16,
        phi_bc=phi_bc, interior_mask=nmask,
    )

    # dense assembly: bc mask AND interior mask
    full_mask = mn._dirichlet_mask(nshape, bc, dtype) * nmask
    ndof = nshape[0] * nshape[1]
    eye = jnp.eye(ndof, dtype=dtype).reshape((ndof,) + nshape)
    cols = jax.vmap(
        lambda e: (full_mask * mn.apply_nodal(
            full_mask * e, sigma, dx, bc
        )).ravel()
    )(eye)
    A = np.asarray(cols.T)
    A = A + np.diag(1.0 - np.asarray(full_mask).ravel())
    phi_b = (1.0 - full_mask) * phi_bc
    b_eff = full_mask * (rhs - mn.apply_nodal(phi_b, sigma, dx, bc))
    x = np.linalg.solve(A, np.asarray(b_eff).ravel()).reshape(nshape)
    want = x + np.asarray(phi_b)

    err = np.max(np.abs(np.asarray(phi) - want))
    assert err < 1e-10, (err, float(res), int(it))
