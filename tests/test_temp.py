"""Temperature / thermal-divergence path: HotSpot-style hot rising bubble
(reference Tutorials/HotSpot inputs.2d.average_hotspot: probtype 6,
ns.do_temp=1, gravity -9.8)."""

import pytest
import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow

HOTSPOT = """
max_step = 5
amr.n_cell = 32 32
ns.cfl = 0.5
ns.init_iter = 1
ns.init_dt = 0.002
ns.do_temp = 1
ns.temp_cond_coef = 1.e-4
ns.vel_visc_coef = 0.001
ns.scal_diff_coefs = 0.001
ns.gravity = -9.8
geometry.prob_lo = -0.5 0.
geometry.prob_hi = 0.5 1.
geometry.is_periodic = 1 0
ns.lo_bc = 0 5
ns.hi_bc = 0 2
prob.probtype = 6
prob.blob_center = 0.0 0.35
prob.blob_radius = 0.2
prob.density_ic = 2.0
prob.interface_width = 0.05
"""


def test_hotspot_config():
    cfg = config_from_inputs(ParmParse.from_string(HOTSPOT))
    assert cfg.do_temp and cfg.temp_cond_coef == 1e-4
    assert cfg.prob_param("blob_y") == 0.35
    assert cfg.prob_param("density_ic") == 2.0


def test_hot_bubble_rises():
    cfg = config_from_inputs(ParmParse.from_string(HOTSPOT))
    state = initialize(cfg)
    # hot bubble: temp = 1/rho > 1 inside, density < 1 inside
    assert float(jnp.max(state.temp)) > 1.5
    assert float(jnp.min(state.rho)) < 0.6
    y = cfg.geom.cell_centers()[1]

    def bubble_height(s):
        w = np.maximum(np.asarray(s.temp) - 1.001, 0.0)
        return float((w * y).sum() / max(w.sum(), 1e-30))

    h0 = bubble_height(state)
    step = make_step(cfg)
    for _ in range(5):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert bool(jnp.all(jnp.isfinite(state.temp)))
    h1 = bubble_height(state)
    # buoyant rise: the hot region's center of mass moves up
    assert h1 > h0 + 1e-5, (h0, h1)
    # vertical velocity develops upward in the bubble
    assert float(jnp.max(state.vel[1])) > 0.01


def test_divu_source_active():
    # with conduction on, the velocity field is NOT divergence-free: the
    # projection enforces div u = S. Check S is nonzero where temp varies.
    cfg = config_from_inputs(ParmParse.from_string(HOTSPOT))
    state = initialize(cfg)
    from iamr_tpu.ns.bcprovider import PhysBCProvider
    from iamr_tpu.ns.advance import beta_faces
    from iamr_tpu.solvers import diffusion as diff

    bcp = PhysBCProvider(cfg)
    lam = beta_faces(cfg, cfg.temp_cond_coef)
    tbc, tbv = bcp.temp_diff_bc()
    lapT = diff.visc_terms_component(
        state.temp, lam, cfg.geom.dx, bcp._temp_rec,
        poisson_bc=tbc, poisson_bvals=tbv,
    )
    S = lapT / (state.rho * state.temp)
    assert float(jnp.max(jnp.abs(S))) > 1e-6
