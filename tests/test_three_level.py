"""Three-level subcycled hierarchy (the Amr::timeStep recursion at depth 2):
nested patches, per-level dt = dt0/r^lev, coupling (avgDown/reflux/sync) at
every parent/child pair, exact mass conservation across all levels."""

import pytest
import jax.numpy as jnp
import numpy as np

from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.multilevel import (
    advance_hierarchy_subcycled,
    hierarchy_configs,
    init_fine_from_coarse,
)
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow


def _setup():
    pp = ParmParse.from_string(
        """
        ns.cfl = 0.5
        ns.init_iter = 1
        amr.n_cell = 16 16
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        prob.probtype = 5
        prob.density_ic = 1.0
        """
    )
    cfg = config_from_inputs(pp)
    # level-1 patch: central 16^2 coarse cells -> 32^2 fine;
    # level-2 patch: central 16^2 of LEVEL-1 cells -> 32^2 finer
    specs = [
        LevelSpec(lo=(8, 8), ncell=(16, 16), ratio=2),
        LevelSpec(lo=(8, 8), ncell=(16, 16), ratio=2),
    ]
    cfgs = hierarchy_configs(cfg, specs)
    s0 = initialize(cfg, fixed_mg_cycles=4)
    s1 = init_fine_from_coarse(cfg, specs[0], s0)
    s2 = init_fine_from_coarse(cfgs[1], specs[1], s1)
    return cfg, cfgs, specs, (s0, s1, s2)


def test_three_level_subcycled():
    cfg, cfgs, specs, states = _setup()

    def total_mass(states):
        # composite mass: coarse cells replaced by their fine coverage
        m = 0.0
        for lev, st in enumerate(states):
            vol = cfgs[lev].geom.cell_volume
            rho = np.asarray(st.rho, dtype=np.float64).copy()
            if lev < len(specs):
                sp = specs[lev]
                sl = tuple(
                    slice(sp.crse_lo[d], sp.crse_lo[d] + sp.crse_ncell[d])
                    for d in range(2)
                )
                rho[sl] = 0.0
            m += vol * rho.sum()
        return m

    import jax

    step = jax.jit(
        lambda sts: advance_hierarchy_subcycled(sts, cfg, specs, fixed_mg_cycles=4)
    )
    m0 = total_mass(states)
    out = step(states)
    for lev, st in enumerate(out):
        assert bool(jnp.all(jnp.isfinite(st.vel))), f"level {lev} velocities"
        assert bool(jnp.all(st.rho > 0.0)), f"level {lev} density"
    # dt hierarchy: dt_l = dt_0 / 2^l
    np.testing.assert_allclose(float(out[1].dt), float(out[0].dt) / 2, rtol=1e-12)
    np.testing.assert_allclose(float(out[2].dt), float(out[0].dt) / 4, rtol=1e-12)
    # composite mass conservation (periodic domain)
    m1 = total_mass(out)
    np.testing.assert_allclose(m1, m0, rtol=1e-9)


def test_run_hierarchy_from_inputs():
    """amr.max_level=2 drives the 3-level subcycled hierarchy."""
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.driver import run_hierarchy
    from iamr_tpu.ns.state import config_from_inputs

    pp = ParmParse.from_string(
        """
        max_step = 1
        ns.cfl = 0.5
        ns.init_iter = 1
        amr.n_cell = 16 16
        amr.max_level = 2
        geometry.is_periodic = 1 1
        prob.probtype = 5
        prob.density_ic = 1.0
        """
    )
    cfg = config_from_inputs(pp)
    out = run_hierarchy(cfg, max_steps=1, fixed_mg_cycles=4)
    assert len(out) == 3
    for st in out:
        assert bool(jnp.all(jnp.isfinite(st.vel)))


@pytest.mark.slow
def test_hierarchy_dynamic_regrid_tracks_vortex():
    """3-level dynamic regridding (Amr::regrid, lbase=0): when the tagged
    feature moves, every level's patch moves with it, nesting stays valid,
    and the overlap data carries over; a short subcycled run with
    regrid_int=1 stays finite through recompiles."""
    from iamr_tpu.amr.multilevel import hierarchy_configs
    from iamr_tpu.amr.tagging import ErrorTag, regrid_hierarchy
    from iamr_tpu.ns.driver import run_hierarchy
    from iamr_tpu.ns.probs import init_state

    INP = """
        max_step = 3
        amr.n_cell = 32 32
        amr.max_level = 2
        ns.cfl = 0.5
        ns.init_iter = 0
        ns.vel_visc_coef = 0.0
        geometry.is_periodic = 1 1
        ns.lo_bc = 0 0
        ns.hi_bc = 0 0
        prob.probtype = 8
        prob.xvort = {x}
        prob.yvort = 0.5
        prob.rvort = 0.07
        prob.forcevort = 6.0
        prob.meanFlowDir = 1
        prob.meanFlowMag = 1.0
    """
    tags = [ErrorTag(field="mag_vort", test="vorticity_greater",
                     values=(8.0, 16.0))]

    def states_for(x, specs):
        cfg = config_from_inputs(ParmParse.from_string(INP.format(x=x)))
        cfgs = hierarchy_configs(cfg, specs)
        sts = [init_state(cfg)]
        for lev, sp in enumerate(specs):
            sts.append(init_fine_from_coarse(cfgs[lev], sp, sts[-1]))
        return cfg, cfgs, tuple(sts)

    # default centered specs; vortex at x=0.3 -> regrid pulls patches left
    r = 2
    specs0 = [
        LevelSpec(lo=(16, 16), ncell=(32, 32), ratio=r),
        LevelSpec(lo=(16, 16), ncell=(32, 32), ratio=r),
    ]
    cfg, cfgs, states = states_for(0.30, specs0)
    specs1, states1, _bl1 = regrid_hierarchy(cfg, cfgs, specs0, states, tags)
    # then the vortex "moves" to x=0.60: patches must follow
    cfg2, cfgs1, _ = states_for(0.60, specs1)
    st2 = list(states1)
    st2[0] = init_state(cfg2)  # coarse field now tags around x=0.6
    specs2, states2, _bl2 = regrid_hierarchy(cfg2, cfgs1, specs1, tuple(st2), tags)

    def abs_center_x(specs):
        # absolute center of the FINEST patch, in physical coords
        A = (0, 0)
        h = 1.0 / 32.0
        for sp in specs:
            A = tuple(r * a + l for a, l in zip(A, sp.lo))
            h /= r
        return (A[0] + specs[-1].ncell[0] / 2.0) * h

    c1 = abs_center_x(specs1)
    c2 = abs_center_x(specs2)
    assert abs(c1 - 0.30) < 0.15, c1
    assert abs(c2 - 0.60) < 0.15, c2
    assert c2 > c1 + 0.15
    # nesting valid: each child patch inside its parent
    parent_n = (32, 32)
    for sp in specs2:
        for d in range(2):
            assert sp.lo[d] >= 0
            assert sp.lo[d] + sp.ncell[d] <= r * parent_n[d]
        parent_n = sp.ncell
    for s in states2:
        assert bool(jnp.all(jnp.isfinite(s.vel)))

    # short integration with regrid_int=1 (recompile-on-regrid path)
    out = run_hierarchy(cfg, max_steps=3, error_tags=tags, regrid_int=1)
    assert len(out) == 3
    for s in out:
        assert bool(jnp.all(jnp.isfinite(s.vel)))
        assert bool(jnp.all(jnp.isfinite(s.p)))
