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
