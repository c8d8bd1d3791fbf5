"""Pallas MG kernels vs the XLA reference implementations (interpret mode
on CPU; the same kernels compile for TPU in production)."""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.ops import mg, mg_nodal
from iamr_tpu.ops.mg import PERIODIC, DIRICHLET, NEUMANN, PoissonBC
from iamr_tpu.ops.mg_nodal import N_NEUMANN, N_PERIODIC, NodalBC
from iamr_tpu.ops.pallas_mg import cell_sweep, fem_K_table, nodal_sweep


def _beta(shape, rng):
    out = []
    for d in range(len(shape)):
        s = list(shape)
        s[d] += 1
        out.append(jnp.asarray(rng.uniform(0.5, 2.0, s), dtype=jnp.float32))
    return tuple(out)


def test_cell_sweep_matches_xla_3d():
    rng = np.random.default_rng(0)
    shape = (16, 12, 8)
    dx = (0.1, 0.2, 0.3)
    bc = PoissonBC(lo=(PERIODIC, NEUMANN, DIRICHLET), hi=(PERIODIC, NEUMANN, DIRICHLET))
    phi = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.5, 1.5, shape), dtype=jnp.float32)
    beta = _beta(shape, rng)
    a, b = 2.0, 0.7
    diag = mg._diag(alpha, beta, a, b, dx, bc, shape, jnp.float32)
    from iamr_tpu.ops.stencil import checkerboard

    mask = checkerboard(shape, 0, jnp.float32)
    phip = mg._pad_phi(phi, bc)

    # XLA reference: one color update
    r_x = rhs - mg.apply_op(phip, alpha, beta, a, b, dx, shape)
    expect = phi + mask * r_x / diag

    got = cell_sweep(
        phip, rhs, a * alpha, diag, beta, mask, b, dx, update=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=3e-5, atol=1e-4)

    # residual mode
    got_r = cell_sweep(
        phip, rhs, a * alpha, diag, beta, mask, b, dx, update=False, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(r_x), rtol=3e-5, atol=1e-4)


def test_cell_sweep_matches_xla_2d():
    rng = np.random.default_rng(1)
    shape = (16, 8)
    dx = (0.1, 0.2)
    bc = PoissonBC(lo=(NEUMANN, PERIODIC), hi=(DIRICHLET, PERIODIC))
    phi = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    alpha = jnp.zeros(shape, dtype=jnp.float32)
    beta = _beta(shape, rng)
    a, b = 0.0, 1.0
    diag = mg._diag(alpha, beta, a, b, dx, bc, shape, jnp.float32)
    from iamr_tpu.ops.stencil import checkerboard

    mask = checkerboard(shape, 1, jnp.float32)
    phip = mg._pad_phi(phi, bc)
    r_x = rhs - mg.apply_op(phip, alpha, beta, a, b, dx, shape)
    expect = phi + mask * r_x / diag
    got = cell_sweep(
        phip, rhs, a * alpha, diag, beta, mask, b, dx, update=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=3e-5, atol=1e-4)


def _nodal_setup(shape, dx, bc, rng):
    nshape = tuple(n + 1 for n in shape)
    sigma = jnp.asarray(rng.uniform(0.5, 2.0, shape), dtype=jnp.float32)
    phi = jnp.asarray(rng.standard_normal(nshape), dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(nshape), dtype=jnp.float32)
    return sigma, phi, rhs


def _pad_sig_for_kernel(sigma, bc):
    sp = mg_nodal._pad_cells(sigma, bc, sigma.ndim)  # cells+2 = nodes+1
    pad = [(0, 1)] * sigma.ndim
    return jnp.pad(sp, pad, mode="edge")  # -> nodes+2 (extra row unread)


def test_nodal_sweep_matches_xla_2d():
    rng = np.random.default_rng(2)
    shape = (16, 8)
    dx = (0.1, 0.25)
    bc = NodalBC(lo=(N_NEUMANN, N_PERIODIC), hi=(N_NEUMANN, N_PERIODIC))
    sigma, phi, rhs = _nodal_setup(shape, dx, bc, rng)
    diag = mg_nodal.nodal_diag(sigma, dx, bc)
    mask = mg_nodal._dirichlet_mask(phi.shape, bc, jnp.float32)
    omega = 0.85
    upd = (omega * mask / diag).astype(jnp.float32)

    L = mg_nodal.apply_nodal(phi, sigma, dx, bc)
    expect = phi + upd * (rhs - L)

    phip = mg_nodal._pad_nodes(phi, bc)
    sigp = _pad_sig_for_kernel(sigma, bc)
    vol = float(np.prod(dx))
    got = nodal_sweep(
        phip, sigp, rhs, upd, fem_K_table(dx), vol, update=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=3e-5, atol=3e-5)


def test_nodal_sweep_matches_xla_3d():
    rng = np.random.default_rng(3)
    shape = (8, 8, 8)
    dx = (0.1, 0.2, 0.15)
    bc = NodalBC(lo=(N_PERIODIC,) * 3, hi=(N_PERIODIC,) * 3)
    sigma, phi, rhs = _nodal_setup(shape, dx, bc, rng)
    # enforce duplicated-DOF invariant for periodic dims
    for d in range(3):
        idx_lo = [slice(None)] * 3
        idx_lo[d] = slice(0, 1)
        idx_hi = [slice(None)] * 3
        idx_hi[d] = slice(-1, None)
        phi = phi.at[tuple(idx_hi)].set(phi[tuple(idx_lo)])
        rhs = rhs.at[tuple(idx_hi)].set(rhs[tuple(idx_lo)])
    diag = mg_nodal.nodal_diag(sigma, dx, bc)
    mask = mg_nodal._dirichlet_mask(phi.shape, bc, jnp.float32)
    upd = (0.85 * mask / diag).astype(jnp.float32)
    L = mg_nodal.apply_nodal(phi, sigma, dx, bc)
    expect_r = mask * (rhs - L)
    phip = mg_nodal._pad_nodes(phi, bc)
    sigp = _pad_sig_for_kernel(sigma, bc)
    got_r = nodal_sweep(
        phip, sigp, rhs, mask, fem_K_table(dx), float(np.prod(dx)),
        update=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(expect_r), rtol=3e-5, atol=3e-5
    )
