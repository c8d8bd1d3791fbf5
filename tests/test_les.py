"""LES closure tests: Smagorinsky oracle on a known shear, Sigma model
properties, and a forced-turbulence smoke run with LES on."""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.bcprovider import PhysBCProvider
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.les import eddy_viscosity_faces, mut_sigma, mut_smagorinsky
from iamr_tpu.ns.state import config_from_inputs


def _cfg2(n=16, extra=""):
    return config_from_inputs(ParmParse.from_string(f"""
max_step = 5
amr.n_cell = {n} {n}
ns.cfl = 0.5
ns.do_LES = 1
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
{extra}
"""))


def test_smagorinsky_pure_shear_oracle():
    # u = (gamma*y, 0): S12 = gamma/2, |S| = sqrt(2*2*(gamma/2)^2) = gamma
    # mu_t = (Cs dx)^2 * gamma
    n = 16
    cfg = _cfg2(n)
    bcp = PhysBCProvider(cfg)
    gamma = 3.0
    y = cfg.geom.cell_centers()[1]
    vel = jnp.stack([jnp.asarray(gamma * y), jnp.zeros((n, n))])
    mut = mut_smagorinsky(cfg, bcp, vel, cfg.smago_cs)
    expect = (0.18 / n) ** 2 * gamma
    # interior cells (periodic wrap makes the boundary rows see the jump)
    np.testing.assert_allclose(np.asarray(mut)[:, 2:-2], expect, rtol=1e-10)


def test_sigma_vanishes_for_solid_rotation():
    # Sigma model returns 0 for solid-body rotation (its design property)
    n = 8
    cfg3 = config_from_inputs(ParmParse.from_string(f"""
max_step = 1
amr.n_cell = {n} {n} {n}
ns.cfl = 0.5
ns.do_LES = 1
ns.LES_model = Sigma
geometry.is_periodic = 1 1 1
ns.lo_bc = 0 0 0
ns.hi_bc = 0 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
"""))
    bcp = PhysBCProvider(cfg3)
    X = cfg3.geom.cell_centers()
    # solid rotation about z: u = (-omega*y, omega*x, 0) -> sigma2 = sigma1,
    # d_sigma = 0. Use small amplitude so periodic wrap effects stay tiny.
    om = 1e-3
    vel = jnp.stack([
        jnp.asarray(-om * (X[1] - 0.5)),
        jnp.asarray(om * (X[0] - 0.5)),
        jnp.zeros(cfg3.geom.ncell),
    ])
    mut = mut_sigma(cfg3, bcp, vel, cfg3.sigma_cs)
    interior = np.asarray(mut)[2:-2, 2:-2, :]
    assert np.max(np.abs(interior)) < 1e-12


def test_les_step_smoke():
    cfg = _cfg2(16, extra="ns.vel_visc_coef = 1e-3")
    assert cfg.do_les
    state = initialize(cfg)
    ke0 = float(jnp.sum(state.vel**2))
    step = make_step(cfg)
    for _ in range(3):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    # eddy viscosity adds dissipation: KE decays faster than molecular alone
    assert float(jnp.sum(state.vel**2)) < ke0


def test_eddy_viscosity_faces_shapes():
    cfg = _cfg2(16)
    bcp = PhysBCProvider(cfg)
    state = initialize(cfg)
    mut = eddy_viscosity_faces(cfg, bcp, state.vel)
    assert mut[0].shape == (17, 16) and mut[1].shape == (16, 17)
    assert bool(jnp.all(mut[0] >= 0))


def test_tensor_cross_terms_vanish_for_constant_mu_divfree():
    # T_i = sum_j d_j(mu d_i u_j) = mu d_i(div u) for constant mu ->
    # O(h^2)-small for an analytic solenoidal field
    import numpy as np
    import jax.numpy as jnp
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.state import config_from_inputs
    from iamr_tpu.ns.bcprovider import PhysBCProvider
    from iamr_tpu.ns.les import tensor_cross_terms
    from iamr_tpu.ns.advance import mu_faces

    errs = []
    for n in (32, 64):
        pp = ParmParse.from_string(
            f"""
            ns.cfl = 0.5
            ns.vel_visc_coef = 0.01
            amr.n_cell = {n} {n}
            geometry.is_periodic = 1 1
            prob.probtype = 1
            """
        )
        cfg = config_from_inputs(pp)
        bcp = PhysBCProvider(cfg)
        x = (np.arange(n) + 0.5) / n
        X, Y = np.meshgrid(x, x, indexing="ij")
        u = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        v = -np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
        vel = jnp.stack([jnp.asarray(u), jnp.asarray(v)])
        T = tensor_cross_terms(cfg, bcp, vel, mu_faces(cfg))
        errs.append(float(jnp.max(jnp.abs(T))))
    # exact discrete cancellation (up to roundoff) for constant mu
    assert max(errs) < 1e-10, errs


def test_tensor_cross_fluxes_divergence_matches_cross_terms():
    """The register cross fluxes (ns/les.py tensor_cross_fluxes) must be
    the FLUX FORM of tensor_cross_terms: -sum_j d_j(F^i_j)/dx_j ==
    X_i(u), so refluxing with them corrects exactly the cross part of the
    stress divergence (reference computeExtensiveFluxes on the tensor
    solve, Diffusion.cpp:1463-1539)."""
    from iamr_tpu.ns.advance import mu_faces
    from iamr_tpu.ns.les import tensor_cross_fluxes, tensor_cross_terms
    from iamr_tpu.ops.stencil import diff

    n = 24
    pp = ParmParse.from_string(
        f"""
        ns.cfl = 0.5
        ns.vel_visc_coef = 0.01
        amr.n_cell = {n} {n}
        geometry.is_periodic = 1 1
        prob.probtype = 1
        """
    )
    cfg = config_from_inputs(pp)
    bcp = PhysBCProvider(cfg)
    rng = np.random.RandomState(7)
    vel = jnp.asarray(rng.standard_normal((2, n, n)))
    # variable viscosity so the cross part is nonzero
    mu_f = tuple(
        m * (1.0 + 0.5 * jnp.asarray(rng.rand(*m.shape)))
        for m in mu_faces(cfg)
    )
    X = tensor_cross_terms(cfg, bcp, vel, mu_f)
    F = tensor_cross_fluxes(cfg, bcp, vel, mu_f)
    dx = cfg.geom.dx
    for i in range(2):
        div = sum(diff(F[i][j], j) / dx[j] for j in range(2))
        err = float(jnp.max(jnp.abs(-div - X[i])))
        assert err < 1e-12, (i, err)
