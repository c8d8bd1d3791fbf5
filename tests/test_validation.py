"""Validation-problem catalog tests (SURVEY.md section 4 acceptance suite):
Poiseuille analytic profile, ConvectedVortex translation, DoubleShearLayer
smoke, steady-state stopping."""

import pytest
import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.driver import initialize, run
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow


def test_poiseuille_profile():
    # gravity-driven channel: walls at x=0,1 (no-slip), periodic in y,
    # steady v(x) = g x (1-x) / (2 nu) (reference Poiseuille tutorial,
    # analytic solution in Docs Tutorials.rst)
    nu, g = 0.1, 1.0
    n = 32
    cfg = config_from_inputs(ParmParse.from_string(f"""
max_step = 400
amr.n_cell = {n} {n}
ns.cfl = 0.9
ns.init_dt = 0.002
ns.vel_visc_coef = {nu}
ns.gravity = {g}
ns.stop_when_steady = 1
ns.steady_tol = 1.0e-7
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 0 1
ns.lo_bc = 5 0
ns.hi_bc = 5 0
prob.probtype = 1
"""))
    state = run(cfg, verbose=False)
    x = cfg.geom.cell_centers()[0][:, 0]
    v_exact = g * x * (1.0 - x) / (2.0 * nu)
    v = np.asarray(state.vel[1]).mean(axis=1)
    err = np.max(np.abs(v - v_exact)) / v_exact.max()
    assert err < 0.01, err


def test_convected_vortex_translation():
    # isentropic vortex in a periodic box with mean flow: the vortex core
    # translates at the mean speed (analytic solution)
    n = 64
    cfg = config_from_inputs(ParmParse.from_string(f"""
max_step = 1000
amr.n_cell = {n} {n}
ns.cfl = 0.5
ns.init_iter = 1
ns.vel_visc_coef = 0.0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 8
prob.xvort = 0.5
prob.yvort = 0.5
prob.rvort = 0.07
prob.forcevort = 6.0
prob.meanFlowDir = 1
prob.meanFlowMag = 1.0
"""))
    state = initialize(cfg)
    step = make_step(cfg)
    T = 0.25
    while float(state.time) < T - 1e-12:
        state = state._replace(dt=jnp.minimum(state.dt, T - state.time))
        state = step(state)
    from iamr_tpu.ns.derive import mag_vort

    w = np.asarray(mag_vort(cfg, state))
    iy, ix = np.unravel_index(np.argmax(w), w.shape)
    x_core = (iy + 0.5) / n  # first axis is x
    expect = (0.5 + 1.0 * T) % 1.0
    assert abs(x_core - expect) < 0.05, (x_core, expect)
    # y position unchanged
    y_core = (ix + 0.5) / n
    assert abs(y_core - 0.5) < 0.05


def test_double_shear_layer_smoke():
    cfg = config_from_inputs(ParmParse.from_string("""
max_step = 5
amr.n_cell = 32 32
ns.cfl = 0.5
ns.init_iter = 1
ns.vel_visc_coef = 1e-4
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 5
prob.density_ic = 1.0
prob.perturbation_amplitude = 0.05
"""))
    state = initialize(cfg)
    step = make_step(cfg)
    for _ in range(5):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert 0.9 < float(jnp.max(jnp.abs(state.vel[0]))) <= 1.1


def test_lid_driven_cavity_ghia_re100():
    """Lid-driven cavity at Re=100 vs the Ghia, Ghia & Shin (1982) benchmark:
    u along the vertical centerline after driving toward steady state from
    the REFERENCE inputs file (Tutorials/LidDrivenCavity + Re override)."""
    import numpy as np

    from iamr_tpu.ns.driver import run_from_inputs

    state = run_from_inputs(
        "/root/reference/Tutorials/LidDrivenCavity/inputs.2d.lid_driven_cavity",
        overrides=(
            "ns.vel_visc_coef=0.01", "ns.steady_tol=2e-5", "max_step=1500",
            "amr.plot_int=-1", "amr.check_int=-1",
        ),
    )
    n = 64
    u = np.asarray(state.vel[0])
    uc = 0.5 * (u[n // 2 - 1, :] + u[n // 2, :])
    y = (np.arange(n) + 0.5) / n
    ghia = {0.5: -0.20581, 0.7344: 0.00332, 0.9531: 0.68717, 0.2813: -0.15662}
    for yy, ur in ghia.items():
        ui = float(np.interp(yy, y, uc))
        assert abs(ui - ur) < 0.03, (yy, ui, ur)
