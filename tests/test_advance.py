"""End-to-end single-level physics tests (the reference's validation
problems, SURVEY.md section 4): Taylor-Green decay vs the exact solution
(Tutorials/TaylorGreen/benchmarks/EXACT_2D.F:33-38), lid-driven cavity
smoke + divergence control."""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.driver import initialize, run
from iamr_tpu.ns.state import config_from_inputs
from iamr_tpu.ops.mg_nodal import div_cell_to_node
from iamr_tpu.solvers.nodal_proj import nodal_bc


TG_INPUTS = """
max_step = 10
stop_time = -1
amr.n_cell = {n} {n}
ns.cfl = 0.5
ns.init_shrink = 1.0
ns.init_iter = 2
ns.vel_visc_coef = {nu}
ns.scal_diff_coefs = 0.0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
"""


def _tg_exact(n, t, nu):
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    decay = np.exp(-2.0 * (2 * np.pi) ** 2 * nu * t)
    u = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) * decay
    v = -np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y) * decay
    return u, v


def _run_tg(n, nu, nsteps):
    pp = ParmParse.from_string(TG_INPUTS.format(n=n, nu=nu))
    cfg = config_from_inputs(pp)
    state = initialize(cfg)
    step = make_step(cfg)
    for _ in range(nsteps):
        state = step(state)
    return cfg, state


def test_taylor_green_decay_accuracy():
    n, nu, nsteps = 32, 1e-2, 10
    cfg, state = _run_tg(n, nu, nsteps)
    t = float(state.time)
    u_ex, v_ex = _tg_exact(n, t, nu)
    err_u = np.max(np.abs(np.asarray(state.vel[0]) - u_ex))
    assert err_u < 0.02, err_u
    # kinetic energy decay rate
    ke = 0.5 * float(jnp.sum(state.vel[0] ** 2 + state.vel[1] ** 2)) / n**2
    ke_ex = 0.25 * np.exp(-4.0 * (2 * np.pi) ** 2 * nu * t)
    assert abs(ke - ke_ex) / ke_ex < 0.02, (ke, ke_ex)


def test_taylor_green_convergence():
    nu = 1e-2
    errs = []
    for n in (16, 32):
        cfg, state = _run_tg(n, nu, 8)
        t = float(state.time)
        u_ex, _ = _tg_exact(n, t, nu)
        errs.append(np.max(np.abs(np.asarray(state.vel[0]) - u_ex)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.5, (order, errs)


def test_projection_reduces_divergence():
    # the APPROXIMATE projection (L != D sigma G by design, like the
    # reference's MLNodeLaplacian-based projector) drives the nodal
    # divergence to truncation level, not solver tolerance: check a large
    # reduction factor plus post-projection smallness relative to |grad U|
    import numpy as np
    from iamr_tpu.solvers.nodal_proj import initial_velocity_project

    cfg, state = _run_tg(32, 1e-2, 0)
    rng = np.random.default_rng(0)
    n = cfg.geom.ncell
    # pollute a smooth div-free field with a smooth gradient component
    dx = cfg.geom.dx
    x = (np.arange(n[0]) + 0.5) * dx[0]
    X, Y = np.meshgrid(x, x, indexing="ij")
    gphi = np.stack(
        [np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y),
         np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)]
    )
    vel0 = state.vel + 0.3 * jnp.asarray(gphi)
    bc = nodal_bc(cfg.dom)
    d0 = float(jnp.max(jnp.abs(
        div_cell_to_node(tuple(vel0[i] for i in range(2)), dx, bc))))
    vel1, _ = initial_velocity_project(vel0, state.rho, cfg.dom, dx)
    d1 = float(jnp.max(jnp.abs(
        div_cell_to_node(tuple(vel1[i] for i in range(2)), dx, bc))))
    assert d1 < d0 / 50.0, (d0, d1)
    assert d1 < 0.05, d1


def test_density_conservation_and_positivity():
    # inviscid TG with variable density: rho stays positive, mass conserved
    pp = ParmParse.from_string(TG_INPUTS.format(n=32, nu=0.0))
    cfg = config_from_inputs(pp)
    state = initialize(cfg)
    m0 = float(jnp.sum(state.rho))
    step = make_step(cfg)
    for _ in range(5):
        state = step(state)
    assert float(jnp.min(state.rho)) > 0.0
    np.testing.assert_allclose(float(jnp.sum(state.rho)), m0, rtol=1e-12)


CAVITY_INPUTS = """
max_step = 10
stop_time = -1
ns.init_dt = 0.05
amr.n_cell = 32 32
ns.cfl = 0.9
ns.init_shrink = 0.3
ns.vel_visc_coef = 0.001
ns.scal_diff_coefs = 0.0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 0 0
ns.lo_bc = 5 5
ns.hi_bc = 5 5
yhi.velocity = 1. 0. 0.
prob.probtype = 1
"""


def test_lid_driven_cavity_smoke():
    pp = ParmParse.from_string(CAVITY_INPUTS)
    cfg = config_from_inputs(pp)
    state = initialize(cfg)
    step = make_step(cfg)
    for _ in range(10):
        state = step(state)
    u = np.asarray(state.vel[0])
    assert np.all(np.isfinite(u))
    # lid drags the fluid: near-lid u positive, interior backflow develops
    assert u[:, -1].mean() > 0.01
    assert float(jnp.max(jnp.abs(state.vel))) < 2.0  # bounded by lid speed-ish
