"""Multilevel sync machinery (iamr_tpu.amr.sync): MAC register mismatch,
mac_sync solve, sync projection (reference MacProj.cpp:359-789,
Projection::MLsyncProject)."""

import pytest
import jax.numpy as jnp
import numpy as np

from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.sync import (
    interface_delta_umac,
    mac_sync_velocity,
    sync_project,
)
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.state import config_from_inputs
from iamr_tpu.ops.stencil import mac_div

pytestmark = pytest.mark.slow


def _cfg(n=32):
    pp = ParmParse.from_string(
        f"""
        ns.cfl = 0.5
        amr.n_cell = {n} {n}
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        prob.probtype = 1
        """
    )
    return config_from_inputs(pp)


def _spec():
    return LevelSpec(lo=(16, 16), ncell=(32, 32), ratio=2)


def test_consistent_umac_gives_zero_register():
    # fine u_mac that exactly restricts to the coarse u_mac -> zero mismatch
    cfg = _cfg(32)
    spec = _spec()
    rng = np.random.RandomState(0)
    cu = (jnp.asarray(rng.randn(33, 32)), jnp.asarray(rng.randn(32, 33)))
    # fine faces: every coarse interface face value replicated on its 2
    # children
    fu0 = jnp.repeat(jnp.repeat(cu[0], 2, 1), 2, 0)[16:49][:, 32 - 16 : 64 - 16]
    # build exact-restriction fine fields only at the patch boundary faces
    fx = jnp.zeros((33, 32))
    fx = fx.at[0, :].set(jnp.repeat(cu[0][8, 8:24], 2))
    fx = fx.at[-1, :].set(jnp.repeat(cu[0][24, 8:24], 2))
    fy = jnp.zeros((32, 33))
    fy = fy.at[:, 0].set(jnp.repeat(cu[1][8:24, 8], 2))
    fy = fy.at[:, -1].set(jnp.repeat(cu[1][8:24, 24], 2))
    deltas = interface_delta_umac(cu, (fx, fy), spec)
    for d in deltas:
        assert float(jnp.max(jnp.abs(d))) < 1e-14


def test_mac_sync_velocity_matches_defect():
    cfg = _cfg(32)
    spec = _spec()
    rng = np.random.RandomState(1)
    # manufactured mismatch on the interface faces only
    deltas = [jnp.zeros((33, 32)), jnp.zeros((32, 33))]
    deltas[0] = deltas[0].at[8, 8:24].set(rng.randn(16) * 0.1)
    deltas[0] = deltas[0].at[24, 8:24].set(rng.randn(16) * 0.1)
    deltas = tuple(deltas)
    rho = jnp.ones((32, 32)) * 1.7
    ucorr, (res, it) = mac_sync_velocity(cfg, rho, deltas, spec)
    dx = cfg.geom.dx
    defect = mac_div(deltas, dx).at[
        tuple(slice(8, 24) for _ in range(2))
    ].set(0.0)
    # demean (periodic solvability)
    defect = defect - jnp.mean(defect)
    got = mac_div(ucorr, dx)
    got = got - jnp.mean(got)
    assert float(jnp.max(jnp.abs(got - defect))) < 1e-7


def test_sync_project_removes_divergence():
    cfg = _cfg(32)
    spec = _spec()
    # smooth compressive field: pure gradient, fully projectable (the nodal
    # projection is APPROXIMATE — high-frequency content only reduces at
    # truncation order, like the reference's MLNodeLaplacian projection)
    x = (np.arange(32) + 0.5) / 32
    X, Y = np.meshgrid(x, x, indexing="ij")
    vsync = jnp.asarray(
        np.stack(
            [np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) * 0.01,
             np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y) * 0.01]
        )
    )
    rho = jnp.ones((32, 32))
    out, phi = sync_project(cfg, vsync, rho, 0.05, spec)
    from iamr_tpu.ops.mg_nodal import div_cell_to_node
    from iamr_tpu.solvers.nodal_proj import nodal_bc

    bc = nodal_bc(cfg.dom)
    d0 = float(jnp.max(jnp.abs(div_cell_to_node(tuple(vsync), cfg.geom.dx, bc))))
    d1 = float(
        jnp.max(jnp.abs(div_cell_to_node(tuple(out), cfg.geom.dx, bc)))
    )
    assert d1 < 0.02 * d0, (d0, d1)
