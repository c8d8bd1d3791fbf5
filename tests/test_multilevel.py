"""Two-level composite-step tests: TG accuracy vs single level, mass
conservation with reflux, C-F boundary smoothness."""

import pytest
import numpy as np
import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import LevelSpec, crse_region
from iamr_tpu.amr.multilevel import (
    MLState,
    advance_two_level,
    init_fine_from_coarse,
    make_fine_config,
    make_two_level_step,
)
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.probs import init_state
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow

TG = """
max_step = 5
amr.n_cell = {n} {n}
ns.cfl = 0.5
ns.init_iter = 0
ns.vel_visc_coef = {nu}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
"""


def _setup(n=32, nu=1e-2, spec=None):
    cfg = config_from_inputs(ParmParse.from_string(TG.format(n=n, nu=nu)))
    spec = spec or LevelSpec(lo=(n // 2, n // 2), ncell=(n, n), ratio=2)
    crse = init_state(cfg)
    crse = crse._replace(dt=jnp.asarray(0.2 / n, dtype=cfg.jdtype))
    fine = init_fine_from_coarse(cfg, spec, crse)
    # exact ICs on the fine patch (init_fine interp is only 2nd order)
    cfg_f = make_fine_config(cfg, spec)
    fine_exact = init_state(cfg_f)
    fine = fine._replace(vel=fine_exact.vel, rho=fine_exact.rho)
    return cfg, spec, MLState(crse=crse, fine=fine)


def test_two_level_runs_and_stays_finite():
    cfg, spec, ml = _setup()
    step = make_two_level_step(cfg, spec)
    for _ in range(3):
        ml = step(ml)
    assert bool(jnp.all(jnp.isfinite(ml.crse.vel)))
    assert bool(jnp.all(jnp.isfinite(ml.fine.vel)))
    assert float(jnp.max(jnp.abs(ml.fine.vel))) < 2.0


def test_two_level_tg_accuracy():
    # fine-level solution must track the exact TG decay about as well as a
    # single-level run at the fine resolution
    n, nu = 32, 1e-2
    cfg, spec, ml = _setup(n, nu)
    step = make_two_level_step(cfg, spec)
    for _ in range(5):
        ml = step(ml)
    t = float(ml.fine.time)
    # fine patch covers [0.25, 0.75]^2 at dx = 1/64
    xf = 0.25 + (np.arange(32) + 0.5) / 64.0
    Xf, Yf = np.meshgrid(xf, xf, indexing="ij")
    decay = np.exp(-2.0 * (2 * np.pi) ** 2 * nu * t)
    uex = np.sin(2 * np.pi * Xf) * np.cos(2 * np.pi * Yf) * decay
    err = np.max(np.abs(np.asarray(ml.fine.vel[0]) - uex))
    assert err < 0.05, err


def test_two_level_mass_conservation():
    # inviscid, conservative rho: total mass (uncovered coarse + fine,
    # volume-weighted) must be conserved by avgDown + reflux
    n = 32
    cfg, spec, ml = _setup(n, nu=0.0)
    vol_c = cfg.geom.cell_volume

    def total_mass(ml):
        # after avgDown the covered coarse region IS the restricted fine, so
        # summing the coarse level suffices
        return float(jnp.sum(ml.crse.rho)) * vol_c

    m0 = total_mass(ml)
    step = make_two_level_step(cfg, spec)
    for _ in range(4):
        ml = step(ml)
    m1 = total_mass(ml)
    np.testing.assert_allclose(m1, m0, rtol=1e-11)


def test_avg_down_consistency():
    # after a composite step the covered coarse region equals restricted fine
    from iamr_tpu.amr.hierarchy import restrict_cell

    cfg, spec, ml = _setup()
    step = make_two_level_step(cfg, spec)
    ml = step(ml)
    reg = crse_region(spec)
    np.testing.assert_allclose(
        np.asarray(ml.crse.rho[reg]),
        np.asarray(restrict_cell(ml.fine.rho, spec.ratio)),
        rtol=1e-12,
    )


def test_subcycled_two_level():
    # subcycled advance: fine takes ratio steps per coarse step; TG accuracy
    # + mass conservation with time-averaged reflux
    n, nu = 32, 1e-2
    cfg, spec, ml = _setup(n, nu)
    step = make_two_level_step(cfg, spec, subcycle=True)
    for _ in range(4):
        ml = step(ml)
    assert bool(jnp.all(jnp.isfinite(ml.fine.vel)))
    # fine time caught up with coarse time
    np.testing.assert_allclose(float(ml.fine.time), float(ml.crse.time), rtol=1e-12)
    t = float(ml.fine.time)
    xf = 0.25 + (np.arange(32) + 0.5) / 64.0
    Xf, Yf = np.meshgrid(xf, xf, indexing="ij")
    decay = np.exp(-2.0 * (2 * np.pi) ** 2 * nu * t)
    uex = np.sin(2 * np.pi * Xf) * np.cos(2 * np.pi * Yf) * decay
    err = np.max(np.abs(np.asarray(ml.fine.vel[0]) - uex))
    assert err < 0.05, err


def test_subcycled_mass_conservation():
    cfg, spec, ml = _setup(32, nu=0.0)
    vol_c = cfg.geom.cell_volume
    m0 = float(jnp.sum(ml.crse.rho)) * vol_c
    step = make_two_level_step(cfg, spec, subcycle=True)
    for _ in range(3):
        ml = step(ml)
    m1 = float(jnp.sum(ml.crse.rho)) * vol_c
    np.testing.assert_allclose(m1, m0, rtol=1e-11)


@pytest.mark.slow
def test_post_init_press_two_level():
    """Composite initial pressure iterations (post_init_press +
    initialSyncProject, NavierStokes.cpp:1305-1432): the 2-level start
    builds a CONSISTENT composite pressure — covered coarse nodes carry
    the restricted fine pressure, and the coarse field agrees with the
    single-level initial-iteration pressure to truncation size."""
    from iamr_tpu.amr.hierarchy import avg_down_node
    from iamr_tpu.amr.multilevel import (
        init_fine_from_coarse,
        post_init_press_two_level,
    )
    from iamr_tpu.ns.driver import default_fine_spec, initialize

    pp = ParmParse.from_string(
        """
        max_step = 1
        amr.n_cell = 32 32
        amr.max_level = 1
        ns.cfl = 0.5
        ns.init_iter = 2
        ns.vel_visc_coef = 1e-3
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        ns.lo_bc = 0 0
        ns.hi_bc = 0 0
        prob.probtype = 11
        prob.velocity_factor = 1.0
        """
    )
    cfg = config_from_inputs(pp)
    crse0 = initialize(cfg, fixed_mg_cycles=None, init_iters=0)
    spec = default_fine_spec(cfg)
    fine0 = init_fine_from_coarse(cfg, spec, crse0)
    crse, fine = post_init_press_two_level(cfg, spec, crse0, fine0)

    # velocities / scalars untouched (only pressure carries, resetState)
    np.testing.assert_allclose(
        np.asarray(crse.vel), np.asarray(crse0.vel), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(fine.rho), np.asarray(fine0.rho), atol=1e-14
    )

    # composite consistency: covered coarse nodes == restricted fine p
    pc = np.asarray(crse.p)
    pr = np.asarray(avg_down_node(crse.p, fine.p, spec))
    r = spec.ratio
    cov = tuple(
        slice(spec.crse_lo[d] + 1, spec.crse_lo[d] + spec.ncell[d] // r)
        for d in range(2)
    )
    scale = max(1.0, np.abs(pc).max())
    assert np.max(np.abs((pc - pr)[cov])) / scale < 5e-2

    # coarse pressure ~ single-level initial-iteration pressure (the fine
    # level only refines truncation error on this smooth field)
    ref = initialize(cfg, fixed_mg_cycles=None, init_iters=2)
    dp = np.abs(np.asarray(crse.p) - np.asarray(ref.p))
    assert dp.max() / scale < 5e-2, dp.max()


@pytest.mark.slow
def test_debug_toggles_do_reflux_sync_proj():
    """ns.do_reflux / ns.do_sync_proj / ns.do_mac_proj debugging toggles
    (NavierStokesBase::read_params): turning each off changes the answer
    (they gate real machinery) and keeps the step finite."""
    import dataclasses

    from iamr_tpu.amr.multilevel import advance_two_level_subcycled
    from iamr_tpu.ns.driver import default_fine_spec, initialize

    pp = ParmParse.from_string(TG.format(n=16, nu=1e-3))
    cfg = config_from_inputs(pp)
    crse = initialize(cfg, fixed_mg_cycles=4, init_iters=0)
    spec = default_fine_spec(cfg)
    fine = init_fine_from_coarse(cfg, spec, crse)
    ml = MLState(crse=crse, fine=fine)

    def run1(c):
        import jax

        return jax.jit(
            lambda m: advance_two_level_subcycled(m, c, spec,
                                                  fixed_mg_cycles=4)
        )(ml)

    base = run1(cfg)
    for flag in ("do_reflux", "do_sync_proj"):
        out = run1(dataclasses.replace(cfg, **{flag: False}))
        d = float(jnp.max(jnp.abs(out.crse.vel - base.crse.vel)))
        assert np.isfinite(d) and d > 0.0, (flag, d)
        assert bool(jnp.all(jnp.isfinite(out.crse.vel)))


@pytest.mark.slow
def test_mom_diff_multilevel_sync_units():
    """ns.do_mom_diff=1 with LARGE density: the multilevel Vsync is
    momentum-units (conservative rho*U advection in mac_sync_compute,
    MacProj.cpp:601,686; momentum reflux) and must be divided by rho^{n+1}
    before it corrects the velocity (NavierStokes.cpp:1529-1546,
    reflux comment cpp:1751-1756). Before the round-5 fix the division was
    missing, so any do_mom_diff multilevel run with rho != 1 blew up
    within 2 coarse steps (found by regression/sweep.py on
    regtest.3d.rayleightaylor: rho ~ 1.5e7, g = 1e9 -> NaN). Lock: the
    reference regtest config itself, 2 coarse steps at reduced size, stays
    finite at the problem's physical velocity scale."""
    import jax.numpy as jnp

    from iamr_tpu.ns.driver import run_from_inputs

    st = run_from_inputs(
        "/root/reference/Exec/run3d/regtest.3d.rayleightaylor",
        overrides=(
            "amr.n_cell=16 16 16", "amr.max_level=1", "max_step=2",
            "amr.blocking_factor=8", "amr.max_grid_size=1024",
            "amr.plot_int=-1", "amr.check_int=-1", "ns.sum_interval=-1",
        ),
    )
    leaves = [st] if hasattr(st, "vel") else [s for s in st if hasattr(s, "vel")]
    assert leaves
    for s in leaves:
        assert bool(jnp.all(jnp.isfinite(s.vel)))
    # physical scale ~ sqrt(Atwood * g * L) ~ 1e4..1e5; the broken
    # momentum-as-velocity sync reached 1e15 within 2 steps
    umax = max(float(jnp.max(jnp.abs(s.vel))) for s in leaves)
    assert umax < 1e7, umax
