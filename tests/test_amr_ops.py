"""Unit tests for the AMR transfer operators: prolongation conservation and
exactness, restriction, fill_patch geometry, reflux conservation."""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import (
    LevelSpec,
    avg_down,
    fill_patch_from_coarse,
    prolong_cell,
    reflux_correct,
    restrict_cell,
    restrict_node,
)
from iamr_tpu.core.geometry import Geometry


def test_prolong_conservative():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((8, 6)))
    f = prolong_cell(c, 2)
    assert f.shape == (16, 12)
    # conservation: mean of each 2x2 block == coarse value
    blocks = np.asarray(f).reshape(8, 2, 6, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(blocks, np.asarray(c), rtol=1e-13)


def test_prolong_exact_for_linear():
    # linear field: limited-slope interp must reproduce it exactly (interior)
    x = (np.arange(8) + 0.5)[:, None] * np.ones((8, 8))
    y = (np.arange(8) + 0.5)[None, :] * np.ones((8, 8))
    c = jnp.asarray(2.0 * x - 3.0 * y)
    f = prolong_cell(c, 2)
    xf = (np.arange(16) + 0.5) / 2.0
    Xf, Yf = np.meshgrid(xf, xf, indexing="ij")
    exact = 2.0 * Xf - 3.0 * Yf
    np.testing.assert_allclose(np.asarray(f)[2:-2, 2:-2], exact[2:-2, 2:-2], rtol=1e-12)


def test_restrict_roundtrip():
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.standard_normal((6, 4)))
    f = prolong_cell(c, 2)
    back = restrict_cell(f, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), rtol=1e-13)


def test_restrict_node_injection():
    f = jnp.arange(9.0)[:, None] * jnp.ones((9, 9))
    c = restrict_node(f, 2)
    assert c.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(c[:, 0]), [0, 2, 4, 6, 8])


def test_avg_down_region():
    crse = jnp.zeros((8, 8))
    spec = LevelSpec(lo=(4, 4), ncell=(8, 8), ratio=2)
    fine = jnp.ones((8, 8)) * 5.0
    out = avg_down(crse, fine, spec)
    np.testing.assert_allclose(np.asarray(out[2:6, 2:6]), 5.0)
    assert float(out[0, 0]) == 0.0


def test_fill_patch_geometry():
    # coarse = linear field; fine patch filled from coarse must be linear in
    # the ghost region and keep fine interior intact
    n = 16
    x = (np.arange(n) + 0.5)[:, None] * np.ones((n, n))
    crse = jnp.asarray(3.0 * x)
    spec = LevelSpec(lo=(8, 8), ncell=(16, 16), ratio=2)
    fine = jnp.full((16, 16), -7.0)
    g = fill_patch_from_coarse(fine, crse, spec, ng=3)
    assert g.shape == (22, 22)
    np.testing.assert_allclose(np.asarray(g[3:-3, 3:-3]), -7.0)
    # ghost at fine index -1 (global fine idx 7): x_f = (7+0.5)/2 = 3.75
    np.testing.assert_allclose(float(g[2, 10]), 3.0 * 3.75, rtol=1e-12)


def test_reflux_restores_conservation():
    # conservative advection on a 2-level hierarchy: with reflux, total mass
    # over uncovered-coarse + fine must be conserved exactly
    rng = np.random.default_rng(2)
    nc = 16
    r = 2
    spec = LevelSpec(lo=(8, 8), ncell=(16, 16), ratio=r)

    # random divergence-free-ish fluxes (any fluxes work for this identity)
    crse_flux = (
        jnp.asarray(rng.standard_normal((nc + 1, nc))),
        jnp.asarray(rng.standard_normal((nc, nc + 1))),
    )
    nf = 16
    fine_flux = (
        jnp.asarray(rng.standard_normal((nf + 1, nf))),
        jnp.asarray(rng.standard_normal((nf, nf + 1))),
    )
    dxc = 1.0 / nc
    dxf = dxc / r
    dt = 0.01

    s_crse = jnp.asarray(rng.uniform(1, 2, (nc, nc)))
    s_fine = prolong_cell(s_crse, r)[
        tuple(slice(spec.lo[d], spec.lo[d] + 16) for d in range(2))
    ]

    def divergence(flux, dx):
        return (flux[0][1:, :] - flux[0][:-1, :]) / dx + (
            flux[1][:, 1:] - flux[1][:, :-1]
        ) / dx

    s_crse_new = s_crse - dt * divergence(crse_flux, dxc)
    s_fine_new = s_fine - dt * divergence(fine_flux, dxf)

    s_crse_new = avg_down(s_crse_new, s_fine_new, spec)
    s_refluxed = reflux_correct(
        s_crse_new, crse_flux, fine_flux, spec, (dt / dxc, dt / dxc)
    )

    # conservation: total = sum over coarse cells * dxc^2 must change only by
    # the flux through the DOMAIN boundary (computed from coarse fluxes on
    # uncovered boundary + they're all coarse here since patch is interior)
    vol_c = dxc * dxc
    total_before = float(jnp.sum(s_crse)) * vol_c
    boundary_flux = (
        float(jnp.sum(crse_flux[0][0, :]) - jnp.sum(crse_flux[0][-1, :]))
        + float(jnp.sum(crse_flux[1][:, 0]) - jnp.sum(crse_flux[1][:, -1]))
    ) * dxc * dt
    total_after = float(jnp.sum(s_refluxed)) * vol_c
    np.testing.assert_allclose(
        total_after, total_before + boundary_flux, rtol=1e-11
    )
    # without reflux it does NOT balance (sanity that the test is sharp)
    total_noreflux = float(jnp.sum(s_crse_new)) * vol_c
    assert abs(total_noreflux - (total_before + boundary_flux)) > 1e-8


def test_fine_geom_and_domain_touch():
    g = Geometry(ncell=(16, 16), prob_lo=(0.0, 0.0), prob_hi=(1.0, 1.0),
                 periodic=(False, False))
    spec = LevelSpec(lo=(0, 8), ncell=(16, 16), ratio=2)
    fg = spec.fine_geom(g)
    np.testing.assert_allclose(fg.prob_lo, (0.0, 0.25))
    np.testing.assert_allclose(fg.prob_hi, (0.5, 0.75))
    np.testing.assert_allclose(fg.dx, (1.0 / 32, 1.0 / 32))
    assert spec.touches_domain(g, 0, 0) and not spec.touches_domain(g, 0, 1)
    assert not spec.touches_domain(g, 1, 0) and not spec.touches_domain(g, 1, 1)
