"""Congruent box-batch execution (amr/boxbatch.py UnionBoxExec).

The per-box hyperbolic phases (gather -> vmapped Godunov kernels ->
scatter) must reproduce the bbox-wide union advance to fp round-off:
every per-box window carries identical bbox data and the stencils are
identical arithmetic (reference: amrex iterates kernels box-by-box over
the BoxArray, Docs Software.rst:356-401; the bbox-wide path was the
round-2 stand-in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iamr_tpu.amr.boxbatch import UnionBoxExec, congruent, congruent_chop
from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.multilevel import (
    _interp_states,
    init_fine_from_coarse,
    make_fine_config,
)
from iamr_tpu.amr.multipatch import _box_slices, union_bbox_spec
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import advance
from iamr_tpu.ns.bcprovider import UnionBCProvider
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs


def _cfg(text):
    return config_from_inputs(ParmParse.from_string(text))


def _union_setup(cfg, specs, fixed=4):
    """Coarse step + bbox fine state + union provider for subcycle 0."""
    crse = initialize(cfg, fixed_mg_cycles=fixed)
    crse_new, crse_aux = advance(crse, cfg, fixed, return_aux=True)
    bbox = union_bbox_spec(specs)
    cfg_u = make_fine_config(cfg, bbox)
    u = init_fine_from_coarse(cfg_u, bbox, crse)
    r = specs[0].ratio
    bcp = UnionBCProvider(
        cfg_u, bbox, specs, cfg.geom,
        _interp_states(crse, crse_new, 0.0),
        _interp_states(crse, crse_new, 1.0 / r),
        crse_p=crse_new.p, crse_mac_phi=crse_aux["mac_phi"],
        crse_umac=crse_aux["umac"],
    )
    return crse, u._replace(dt=crse.dt / r), cfg_u, bbox, bcp


def _compare_on_boxes(a, b, specs, bbox, tol, node=False, lead=False,
                      face_dim=None):
    for sp in specs:
        cs = _box_slices(sp, bbox, node=node, face_dim=face_dim)
        if lead:
            cs = (slice(None),) + cs
        np.testing.assert_allclose(
            np.asarray(a[cs]), np.asarray(b[cs]), atol=tol, rtol=0,
            err_msg=f"box {sp.lo}",
        )


def _run_both(cfg, specs, fixed=4, batch_solves=False):
    crse, u0, cfg_u, bbox, bcp = _union_setup(cfg, specs, fixed)
    ref, aux_ref = advance(u0, cfg_u, fixed, bcp=bcp, return_aux=True)
    bexec = UnionBoxExec(cfg.geom, specs, bbox=bbox)
    # bitwise tests pin the hyperbolic phases against the bbox-wide path;
    # the batched elliptic solvers converge to the same solution but along
    # different iterates, so they get their own tolerance-mode test
    bexec.solve_elliptic = batch_solves
    out, aux_bb = advance(
        u0, cfg_u, fixed, bcp=bcp, return_aux=True, boxes=bexec
    )
    return ref, out, aux_ref, aux_bb, bbox


VISC_SHEAR = """
ns.cfl = 0.5
ns.init_iter = 1
ns.vel_visc_coef = 0.001
ns.scal_diff_coefs = 0.002
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
prob.probtype = 5
prob.density_ic = 1.0
"""


def test_tiling_boxes_bitwise_parity():
    """Two congruent boxes that TILE their bbox (no holes): the box-batched
    advance must equal the bbox-wide advance to f64 round-off everywhere,
    including the MAC velocities and fluxes."""
    cfg = _cfg(VISC_SHEAR)
    specs = (
        LevelSpec(lo=(16, 16), ncell=(16, 32), ratio=2),
        LevelSpec(lo=(32, 16), ncell=(16, 32), ratio=2),
    )
    ref, out, aux_ref, aux_bb, bbox = _run_both(cfg, specs)
    tol = 1e-12
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(out.trac), np.asarray(ref.trac), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p), atol=tol, rtol=0)
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(aux_bb["umac"][d]), np.asarray(aux_ref["umac"][d]),
            atol=tol, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(aux_bb["flux_rho"][d]), np.asarray(aux_ref["flux_rho"][d]),
            atol=tol, rtol=0,
        )
    assert float(jnp.max(jnp.abs(out.dt - ref.dt))) < 1e-12


def test_scattered_boxes_parity_on_box_cells():
    """Separated boxes (holes in the bbox): box cells must still match the
    union advance — inviscid, so hole-cell state differences cannot leak
    through elliptic coefficients; holes themselves carry pasted coarse
    data instead of the union's evolved values (by design)."""
    cfg = _cfg(VISC_SHEAR.replace("ns.vel_visc_coef = 0.001", "ns.vel_visc_coef = 0.0")
               .replace("ns.scal_diff_coefs = 0.002", "ns.scal_diff_coefs = 0.0"))
    specs = (
        LevelSpec(lo=(8, 12), ncell=(20, 12), ratio=2),
        LevelSpec(lo=(36, 40), ncell=(20, 12), ratio=2),
    )
    ref, out, aux_ref, aux_bb, bbox = _run_both(cfg, specs)
    tol = 1e-12
    _compare_on_boxes(out.rho, ref.rho, specs, bbox, tol)
    _compare_on_boxes(out.vel, ref.vel, specs, bbox, tol, lead=True)
    _compare_on_boxes(out.trac, ref.trac, specs, bbox, tol, lead=True)


def test_domain_touching_groups_walls():
    """Boxes touching a no-slip wall get the physical BCRec on exactly
    their touching sides (the group machinery): parity vs the bbox-wide
    advance, which pins the same domain faces."""
    cfg = _cfg(
        """
        ns.cfl = 0.5
        ns.init_iter = 1
        ns.vel_visc_coef = 0.001
        amr.n_cell = 32 32
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 0
        ns.lo_bc = 0 5
        ns.hi_bc = 0 5
        prob.probtype = 5
        prob.density_ic = 1.0
        """
    )
    # both boxes touch the ylo wall; one also wraps to xlo
    specs = (
        LevelSpec(lo=(0, 0), ncell=(24, 16), ratio=2),
        LevelSpec(lo=(24, 0), ncell=(24, 16), ratio=2),
    )
    ref, out, aux_ref, aux_bb, bbox = _run_both(cfg, specs)
    tol = 1e-12
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho), atol=tol, rtol=0)


def test_tiling_boxes_3d():
    """3D tiling parity (exercises the 3D extrap/advect under vmap)."""
    cfg = _cfg(
        """
        ns.cfl = 0.5
        ns.init_iter = 1
        ns.vel_visc_coef = 0.001
        amr.n_cell = 16 16 16
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 6.283185307179586 6.283185307179586 6.283185307179586
        geometry.is_periodic = 1 1 1
        prob.probtype = 11
        prob.density_ic = 1.0
        """
    )
    specs = (
        LevelSpec(lo=(8, 8, 8), ncell=(8, 16, 16), ratio=2),
        LevelSpec(lo=(16, 8, 8), ncell=(8, 16, 16), ratio=2),
    )
    ref, out, aux_ref, aux_bb, bbox = _run_both(cfg, specs)
    tol = 1e-12
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho), atol=tol, rtol=0)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(aux_bb["umac"][d]), np.asarray(aux_ref["umac"][d]),
            atol=tol, rtol=0,
        )


def test_congruent_chop():
    """Arbitrary boxes re-chop onto a fixed lattice; congruence holds."""
    boxes = [((0, 8), (24, 16)), ((40, 40), (64, 56))]
    out = congruent_chop(boxes, (8, 8))
    specs = [LevelSpec(lo=lo, ncell=tuple(h - l for l, h in zip(lo, hi)), ratio=2)
             for lo, hi in out]
    assert congruent(specs)
    # every input cell is covered
    cov = np.zeros((64, 64), bool)
    for lo, hi in out:
        cov[lo[0]:hi[0], lo[1]:hi[1]] = True
    for lo, hi in boxes:
        assert cov[lo[0]:hi[0], lo[1]:hi[1]].all()


def test_batched_elliptic_solves_match_union():
    """With tolerance-mode solves, the batched elliptic path (BatchPoisson
    MAC + diffusion, BatchNodal projection; ops/mg_batch.py) reproduces the
    masked-union advance on box cells to solver tolerance — same pinned
    systems, batch-sized memory."""
    cfg = _cfg(VISC_SHEAR)
    specs = (
        LevelSpec(lo=(8, 12), ncell=(20, 12), ratio=2),
        LevelSpec(lo=(36, 36), ncell=(20, 12), ratio=2),
    )
    # tolerance mode: fixed=None -> both paths converge to ~proj_tol
    ref, out, aux_ref, aux_bb, bbox = _run_both(
        cfg, specs, fixed=None, batch_solves=True
    )
    tol = 2e-8
    _compare_on_boxes(out.rho, ref.rho, specs, bbox, tol)
    _compare_on_boxes(out.vel, ref.vel, specs, bbox, tol, lead=True)
    _compare_on_boxes(out.trac, ref.trac, specs, bbox, tol, lead=True)
    _compare_on_boxes(out.p, ref.p, specs, bbox, 1e-6, node=True)
    for d in range(2):
        _compare_on_boxes(
            aux_bb["umac"][d], aux_ref["umac"][d], specs, bbox, tol,
            face_dim=d,
        )
