"""RZ (axisymmetric) coordinate support: radius-weighted divergences and
projection scaling (reference Projection.cpp:1238-1505 scaleVar/radMult;
HotSpot_rz regtest config Exec/run2d/regtest.2d.hotspot_rz)."""

import pytest
import jax.numpy as jnp
import numpy as np

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.core.bc import DomainBC, PhysBC
from iamr_tpu.core.geometry import Geometry
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow


def _rz_div(umac, rz, dx):
    r_cell, r_face = rz
    fr = r_face * umac[0]
    return (fr[1:, :] - fr[:-1, :]) / dx[0] / r_cell + (
        umac[1][:, 1:] - umac[1][:, :-1]
    ) / dx[1]


def test_rz_mac_projection_divfree():
    from iamr_tpu.solvers.mac import mac_project

    n = (32, 64)
    geom = Geometry(n, (0.0, 0.0), (0.5, 1.0), (False, False), 1)
    rc, rf = geom.rz_radii()
    rz = (jnp.asarray(rc), jnp.asarray(rf))
    dom = DomainBC(
        phys_lo=(PhysBC.Symmetry, PhysBC.SlipWall),
        phys_hi=(PhysBC.SlipWall, PhysBC.Outflow),
        bc_values={},
    )
    rng = np.random.RandomState(0)
    umac = (jnp.asarray(rng.randn(33, 64)), jnp.asarray(rng.randn(32, 65)))
    rho = jnp.ones(n) * 1.3
    un, phi, (res, it) = mac_project(umac, rho, dom, geom.dx, rz=rz)
    div = _rz_div(un, rz, geom.dx)
    assert float(jnp.max(jnp.abs(div))) < 1e-8


def test_rz_uniform_axial_flow_preserved():
    # uniform w in z with u_r = 0 is RZ-divergence-free; the nodal
    # projection must leave it alone
    from iamr_tpu.solvers.nodal_proj import initial_velocity_project

    n = (16, 32)
    geom = Geometry(n, (0.0, 0.0), (0.5, 1.0), (False, True), 1)
    rc, rf = geom.rz_radii()
    rz = (jnp.asarray(rc), jnp.asarray(rf))
    dom = DomainBC(
        phys_lo=(PhysBC.Symmetry, PhysBC.Interior),
        phys_hi=(PhysBC.SlipWall, PhysBC.Interior),
        bc_values={},
    )
    vel = jnp.stack([jnp.zeros(n), jnp.full(n, 0.7)])
    rho = jnp.ones(n)
    out, _ = initial_velocity_project(vel, rho, dom, geom.dx, rz=rz)
    np.testing.assert_allclose(np.asarray(out[1]), 0.7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-9)


def test_hotspot_rz_reference_inputs():
    """3 steps of the reference HotSpot RZ regtest (single level): RZ +
    temperature + thermal divu, finite and bubble rising."""
    from iamr_tpu.ns.driver import run_from_inputs

    state = run_from_inputs(
        "/root/reference/Exec/run2d/regtest.2d.hotspot_rz",
        overrides=(
            "max_step=3", "stop_time=-1", "amr.max_level=0",
            "ns.init_iter=1", "amr.plot_int=-1", "amr.check_int=-1",
            "amr.n_cell=32 64",
        ),
    )
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert bool(jnp.all(jnp.isfinite(state.temp)))
    assert float(jnp.max(state.temp)) > 1.0  # hot bubble present
