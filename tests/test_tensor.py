"""Implicit tensor-viscosity solve (MLTensorOp equivalent;
reference Source/Diffusion.cpp:713-958) — VERDICT round-2 item 3.

The defining property: the returned velocity satisfies the FULL
Crank-Nicolson tensor system

    alpha U - theta dt div tau(U) = alpha U* + (1-theta) dt div tau(U^n)

with tau = mu (grad u + grad u^T), cross terms INSIDE the implicit
operator (not lagged explicitly as in round 1).
"""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.bcprovider import PhysBCProvider
from iamr_tpu.ns.state import config_from_inputs
from iamr_tpu.solvers.tensor import (
    cross_terms,
    diffuse_tensor_velocity,
    diffuse_vsync,
    tensor_visc_terms,
)

INPUTS_2D = """
max_step = 1
amr.n_cell = {n} {n}
ns.cfl = 0.5
ns.vel_visc_coef = 0.01
ns.do_LES = 1
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
"""


def _setup(n=32):
    cfg = config_from_inputs(ParmParse.from_string(INPUTS_2D.format(n=n)))
    bcp = PhysBCProvider(cfg)
    rng = np.random.RandomState(3)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    v = -np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    vel = jnp.asarray(np.stack([u, v]))
    # smooth variable viscosity (periodic-consistent faces)
    mu = 0.01 + 0.005 * np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)

    def to_face(m, d):
        mp = np.concatenate([m[-1:], m, m[:1]], axis=0) if d == 0 else \
             np.concatenate([m[:, -1:], m, m[:, :1]], axis=1)
        if d == 0:
            return jnp.asarray(0.5 * (mp[:-1] + mp[1:]))
        return jnp.asarray(0.5 * (mp[:, :-1] + mp[:, 1:]))

    mu_f = (to_face(mu, 0), to_face(mu, 1))
    rho = jnp.asarray(1.0 + 0.1 * np.cos(2 * np.pi * X))
    return cfg, bcp, vel, mu_f, rho


def test_tensor_solve_satisfies_full_cn_system():
    cfg, bcp, vel, mu_f, rho = _setup()
    dt, theta = 0.01, 0.5
    vel_star = vel * 1.05  # provisional post-advection velocity
    u = diffuse_tensor_velocity(
        cfg, bcp, vel_star, vel, rho, mu_f, dt, theta, rtol=1e-12, n_outer=8
    )
    div_tau_new = tensor_visc_terms(cfg, bcp, u, mu_f)
    div_tau_old = tensor_visc_terms(cfg, bcp, vel, mu_f)
    lhs = rho * u - theta * dt * div_tau_new
    rhs = rho * vel_star + (1.0 - theta) * dt * div_tau_old
    res = float(jnp.max(jnp.abs(lhs - rhs)))
    scale = float(jnp.max(jnp.abs(rhs)))
    assert res < 1e-8 * scale, f"tensor CN residual {res:.2e} (scale {scale:.2e})"


def test_tensor_matches_scalar_for_constant_mu_divfree():
    """Constant mu + div-free U: cross terms are a discrete residue ->
    tensor and componentwise solves agree closely."""
    from iamr_tpu.solvers import diffusion as diff

    cfg, bcp, vel, _, rho = _setup()
    n = vel.shape[1]
    mu_c = tuple(
        jnp.full(tuple(nn + (1 if d == e else 0) for e, nn in enumerate((n, n))),
                 0.01, dtype=vel.dtype)
        for d in range(2)
    )
    dt, theta = 0.01, 0.5
    vel_star = vel * 1.05
    u_t = diffuse_tensor_velocity(
        cfg, bcp, vel_star, vel, rho, mu_c, dt, theta, rtol=1e-12, n_outer=6
    )
    comps = []
    for c in range(2):
        vbc, vbv = bcp.vel_diff_bc(c)
        u_c, _ = diff.diffuse_scalar(
            vel_star[c], vel[c], rho, rho, mu_c, dt, cfg.geom.dx, None,
            theta=theta, rtol=1e-12, poisson_bc=vbc, poisson_bvals=vbv,
        )
        comps.append(u_c)
    u_s = jnp.stack(comps)
    err = float(jnp.max(jnp.abs(u_t - u_s)))
    # cross terms ~ mu * d(div u)/dx * dt / rho: small but nonzero discretely
    assert err < 5e-5, f"tensor vs scalar for constant mu: {err:.2e}"


def test_vsync_implicit_solve_contracts():
    """diffuse_Vsync damps the correction like (I + theta dt L/rho)^-1."""
    cfg, bcp, vel, mu_f, rho = _setup()
    v = diffuse_vsync(cfg, bcp, vel, rho, mu_f, 0.01, 0.5, rtol=1e-10)
    # high-wavenumber content must shrink, solve must preserve scale
    assert float(jnp.max(jnp.abs(v))) < float(jnp.max(jnp.abs(vel)))
    assert float(jnp.max(jnp.abs(v))) > 0.5 * float(jnp.max(jnp.abs(vel)))


def test_les_step_with_tensor_solve_runs_stably():
    """LES-on TaylorGreen advances with the implicit tensor path at a dt
    5x the round-1 explicit-cross-term comfort zone."""
    from iamr_tpu.ns.advance import make_step
    from iamr_tpu.ns.probs import init_state

    cfg = config_from_inputs(ParmParse.from_string(INPUTS_2D.format(n=32)))
    state = init_state(cfg)
    state = state._replace(dt=jnp.asarray(0.025, cfg.jdtype))  # CFL ~0.8
    step = make_step(cfg, fixed_mg_cycles=6)
    for _ in range(5):
        state = step(state._replace(dt=jnp.asarray(0.025, cfg.jdtype)))
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert float(jnp.max(jnp.abs(state.vel))) < 2.0
