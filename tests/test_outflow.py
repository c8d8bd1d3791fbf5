"""Outflow BC machinery: hydrostatic phi strips (Projection
set_outflow_bcs/computeRhoG) and probtype 3 (jump IC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.driver import run
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow


def test_hydrostatic_rest_with_lateral_outflow():
    """Fluid at rest under gravity with a LATERAL outflow face must stay at
    rest: the hydrostatic phi strip balances the body force (without it the
    phi=0 outflow Dirichlet spuriously sucks fluid out the side)."""
    pp = ParmParse.from_string(
        """
        max_step = 3
        ns.cfl = 0.5
        ns.init_iter = 2
        ns.gravity = -9.8
        amr.n_cell = 32 32
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 0 0
        ns.lo_bc = 4 5
        ns.hi_bc = 2 4
        prob.probtype = 1
        prob.density_ic = 1.0
        """
    )
    cfg = config_from_inputs(pp)
    state = run(cfg, max_steps=3)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    # velocities stay at rest to solver/truncation accuracy
    assert float(jnp.max(jnp.abs(state.vel))) < 2e-3


def test_bottom_outflow_with_gravity_aborts():
    from iamr_tpu.core.bc import DomainBC, PhysBC
    from iamr_tpu.core.geometry import Geometry
    from iamr_tpu.solvers.nodal_proj import hydrostatic_phi_bc

    geom = Geometry((8, 8), (0.0, 0.0), (1.0, 1.0), (False, False), 0)
    dom = DomainBC(
        phys_lo=(PhysBC.SlipWall, PhysBC.Outflow),
        phys_hi=(PhysBC.SlipWall, PhysBC.SlipWall),
        bc_values={},
    )
    with pytest.raises(NotImplementedError):
        hydrostatic_phi_bc(geom, dom, jnp.ones((8, 8)), -9.8)


def test_probtype3_jump():
    pp = ParmParse.from_string(
        """
        max_step = 2
        ns.cfl = 0.5
        ns.init_iter = 1
        amr.n_cell = 32 32
        geometry.is_periodic = 1 1
        prob.probtype = 3
        prob.blob_center = 0.5 0.5
        prob.blob_radius = 0.2
        prob.density_ic = 3.0
        prob.velocity_ic = 1.0 0.0
        """
    )
    cfg = config_from_inputs(pp)
    state = run(cfg, max_steps=2)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert float(jnp.max(state.rho)) > 2.0 and float(jnp.min(state.rho)) > 0.9


def test_initial_pressure_project_hydrostatic_balance():
    """initialPressureProject (Projection.cpp:841-969): with gravity and
    constant density, p is hydrostatic (Gp = rho g z-hat) and a quiescent
    state stays at rest with NO initial pressure iterations."""
    import numpy as np
    import jax.numpy as jnp
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.driver import initialize, run
    from iamr_tpu.ns.state import config_from_inputs

    pp = ParmParse.from_string(
        """
        max_step = 2
        amr.n_cell = 16 16
        ns.cfl = 0.5
        ns.init_iter = 0
        ns.init_dt = 0.01
        ns.gravity = -9.8
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 0 0
        ns.lo_bc = 4 4
        ns.hi_bc = 4 4
        prob.probtype = 4
        prob.density_ic = 1.0
        """
    )
    cfg = config_from_inputs(pp)
    state = initialize(cfg)
    # Gp = rho * g in the vertical component
    gp = np.asarray(state.gradp)
    assert abs(gp[1].mean() - (-9.8)) < 1e-8
    assert np.abs(gp[0]).max() < 1e-8
    out = run(cfg, state, verbose=False)
    assert float(jnp.max(jnp.abs(out.vel))) < 1e-10
