"""The user-problem plug-in seam (SURVEY.md 2.2b: the six NS_* extension
points the reference implements by VPATH source overrides)."""

import numpy as np
import jax.numpy as jnp

import iamr_tpu.plugins as plug
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.state import config_from_inputs

BASE = """
max_step = 1
amr.n_cell = 16 16
ns.cfl = 0.5
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = {pt}
"""


def _cfg(pt, extra=()):
    return config_from_inputs(
        ParmParse.from_string(BASE.format(pt=pt), overrides=list(extra))
    )


def test_problem_ic_registry():
    @plug.problem_ic(777)
    def my_ic(cfg, X, fields):
        fields["vel"][0] = np.sin(2 * np.pi * X[1])
        fields["rho"][...] = 2.5

    try:
        from iamr_tpu.ns.probs import init_state

        st = init_state(_cfg(777))
        assert float(jnp.max(st.rho)) == 2.5
        assert float(jnp.max(jnp.abs(st.vel[0]))) > 0.9
    finally:
        plug.PROBLEM_ICS.pop(777)


def test_forcing_registry():
    from types import SimpleNamespace

    @plug.forcing("test_updraft")
    def make(cfg):
        def ev(geom, time, dtype):
            f = jnp.zeros((geom.dim,) + geom.ncell, dtype)
            return f.at[1].set(3.0)

        return SimpleNamespace(eval=ev)

    try:
        from iamr_tpu.ns.advance import get_force, make_hit_forcing

        cfg = _cfg(1, ("prob.forcing=test_updraft",))
        assert cfg.forcing == "test_updraft"
        hit = make_hit_forcing(cfg)
        f = get_force(cfg, jnp.ones(cfg.geom.ncell), time=0.0, hit=hit)
        assert float(jnp.max(f[1])) == 3.0
    finally:
        plug.FORCINGS.pop("test_updraft")


def test_derive_and_tagging_registry():
    @plug.derive_field("rho_excess")
    def rx(cfg, state):
        return state.rho - 1.0

    try:
        from iamr_tpu.amr.tagging import ErrorTag, tag_cells
        from iamr_tpu.ns.derive import derive
        from iamr_tpu.ns.probs import init_state

        cfg = _cfg(4, ("prob.blob_radius=0.2", "prob.density_ic=1.0"))
        st = init_state(cfg)
        st = st._replace(rho=st.rho + st.trac[0])  # blob of rho=2
        d = derive(cfg, st, "rho_excess")
        assert float(jnp.max(d)) == 1.0
        tag = ErrorTag(field="rho_excess", test="value_greater",
                       values=(0.5,))
        tags = tag_cells(cfg, st, [tag])
        assert bool(jnp.any(tags)) and not bool(jnp.all(tags))
    finally:
        plug.DERIVES.pop("rho_excess")


def test_eb_geometry_registry():
    @plug.eb_geometry("test_ball")
    def mk(pp, dim):
        from iamr_tpu.eb.geom import sphere_if

        return sphere_if((0.5,) * dim, 0.2, fluid_inside=False)

    try:
        from iamr_tpu.eb.geom import psi_from_inputs

        pp = ParmParse.from_string(
            BASE.format(pt=1) + "\neb2.geom_type = test_ball\n"
        )
        psi = psi_from_inputs(pp, 2)
        assert psi(0.5, 0.5) < 0.0  # body at center (fluid-positive IF)
        assert psi(0.05, 0.05) > 0.0
    finally:
        plug.EB_GEOMETRIES.pop("test_ball")
