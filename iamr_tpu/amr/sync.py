"""Multilevel synchronization: mac_sync + sync projection.

TPU-native equivalent of the reference's post-subcycle sync machinery
(SURVEY.md section 3.3):
  * MAC flux-register mismatch (MacProj mac_reg CrseInit/FineAdd,
    MacProj.cpp:304-348): the time-averaged fine interface MAC velocity
    minus the coarse MAC velocity, living on coarse C-F interface faces.
  * mac_sync_solve (MacProj.cpp:359-478): an elliptic solve spreads that
    interface divergence defect into a smooth correction velocity
    Ucorr = beta grad(phi_sync) with div(Ucorr) = the defect.
  * mac_sync_compute (MacProj.cpp:490-789): re-advect the coarse states
    with Ucorr as the fluxing velocity -> Vsync/Ssync corrections.
  * sync projection (Projection::MLsyncProject, Projection.cpp:457-614):
    project the velocity correction and add the pressure correction to
    both levels (phi interpolated to the fine level, SyncProjInterp).

Deviations from the reference (documented):
  * the sync projection solves on the COARSE level only (the reference's
    MLsyncProject is a genuine 2-level composite solve); the fine level
    receives the interpolated correction. For ref_ratio 2 and smooth
    sigma this differs at the fine level's truncation order.
  * viscous sync solves (diffuse_Vsync/Ssync) are not applied; sync
    corrections are treated explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import LevelSpec, crse_region, prolong_cell
from iamr_tpu.ns.state import NSConfig
from iamr_tpu.ops import mg
from iamr_tpu.ops.stencil import mac_div, sl


def _restrict_face(ff, d, spec: LevelSpec):
    """Average a fine face array's boundary faces onto coarse interface
    faces: transverse mean over ratio^(dim-1) fine faces."""
    dim = ff.ndim
    r = spec.ratio
    out = {}
    for side in (0, 1):
        f = sl(ff, d, 0, 1) if side == 0 else sl(ff, d, -1, None)
        for e in range(dim):
            if e == d:
                continue
            m = f.shape[e] // r
            acc = None
            for k in range(r):
                idx = [slice(None)] * dim
                idx[e] = slice(k, k + r * m, r)
                t = f[tuple(idx)]
                acc = t if acc is None else acc + t
            f = acc / r
        out[side] = jnp.squeeze(f, axis=d)
    return out


def interface_delta_umac(crse_umac, fine_umac_avg, spec: LevelSpec):
    """delta[d]: coarse face arrays, nonzero ONLY on C-F interface faces,
    holding (restricted time-avg fine u_mac) - (coarse u_mac) — the MAC
    flux register content."""
    dim = len(crse_umac)
    deltas = []
    for d in range(dim):
        delta = jnp.zeros_like(crse_umac[d])
        fr = _restrict_face(fine_umac_avg[d], d, spec)
        for side in (0, 1):
            cf = (
                spec.crse_lo[d]
                if side == 0
                else spec.crse_lo[d] + spec.crse_ncell[d]
            )
            if cf <= 0 or cf >= crse_umac[d].shape[d] - 1:
                continue  # interface on the domain boundary
            idx = [
                slice(spec.crse_lo[e], spec.crse_lo[e] + spec.crse_ncell[e])
                for e in range(dim)
            ]
            idx[d] = cf
            mismatch = fr[side] - crse_umac[d][tuple(idx)]
            delta = delta.at[tuple(idx)].set(mismatch)
        deltas.append(delta)
    return tuple(deltas)


def mac_sync_velocity(
    cfg: NSConfig,
    rho,
    deltas,
    spec: LevelSpec,
    fixed_cycles: Optional[int] = None,
):
    """mac_sync_solve: correction velocity Ucorr with
    div(Ucorr) = div(delta) on uncovered cells (the interface defect).

    Solves -div(beta grad phi) = -defect with beta = 1/rho and returns
    Ucorr = beta grad(phi) (face arrays)."""
    from iamr_tpu.solvers.mac import beta_from_rho, mac_poisson_bc

    dim = rho.ndim
    dx = cfg.geom.dx
    rhs = mac_div(deltas, dx)
    # zero under the fine patch (reference zeroes the Reflux there)
    rhs = rhs.at[crse_region(spec)].set(0.0)
    bc = mac_poisson_bc(cfg.dom)
    beta = beta_from_rho(rho, cfg.dom)
    phi, res, it = mg.mg_solve(
        -rhs, jnp.zeros_like(rho), beta, 0.0, 1.0, dx, bc,
        rtol=1e-10, atol=1e-14, fixed_cycles=fixed_cycles,
    )
    corr = mg.get_fluxes(phi, beta, 1.0, dx, bc)  # -beta grad phi
    return tuple(-c for c in corr), (res, it)


def sync_aofs(cfg: NSConfig, s, ucorr, scomp: int, iconserv: bool):
    """Advective tendency of s with Ucorr as the fluxing velocity
    (mac_sync_compute semantics)."""
    from iamr_tpu.ns.advance import fill_scal
    from iamr_tpu.ops.godunov import (
        compute_edge_states,
        compute_fluxes_and_aofs,
        grow_umac_transverse,
    )

    periodic = tuple(cfg.geom.periodic)
    s_g = fill_scal(cfg, s, 3, scomp)
    ug = grow_umac_transverse(ucorr, periodic)
    # dt enters the predictor only through the time-centering terms; the
    # sync correction uses the same machinery with the coarse dt
    edges = compute_edge_states(
        s_g, ug, 0.0, cfg.geom.dx, cfg.geom.ncell, iconserv=iconserv,
        periodic=periodic,
    )
    _, a = compute_fluxes_and_aofs(edges, ucorr, cfg.geom.dx, iconserv, s_cc=s)
    return a


def sync_aofs_vel(cfg: NSConfig, vel, ucorr):
    from iamr_tpu.ns.advance import fill_vel
    from iamr_tpu.ops.godunov import (
        compute_edge_states,
        compute_fluxes_and_aofs,
        grow_umac_transverse,
    )

    periodic = tuple(cfg.geom.periodic)
    vel_g = fill_vel(cfg, vel, 3)
    ug = grow_umac_transverse(ucorr, periodic)
    out = []
    for c in range(cfg.dim):
        edges = compute_edge_states(
            vel_g[c], ug, 0.0, cfg.geom.dx, cfg.geom.ncell, iconserv=False,
            periodic=periodic,
        )
        _, a = compute_fluxes_and_aofs(
            edges, ucorr, cfg.geom.dx, False, s_cc=vel[c]
        )
        out.append(a)
    return jnp.stack(out)


def sync_project(
    cfg: NSConfig,
    vsync,
    rho,
    dt,
    spec: LevelSpec,
    fixed_cycles: Optional[int] = None,
):
    """Sync projection of the velocity correction (MLsyncProject,
    coarse-level form): L(phi) = D(Vsync/dt); Vsync -= dt sigma G(phi).

    Returns (projected vsync, phi node correction)."""
    from iamr_tpu.ops.mg_nodal import (
        div_cell_to_node,
        grad_node_to_cell,
        nodal_solve,
    )
    from iamr_tpu.solvers.nodal_proj import nodal_bc

    dim = rho.ndim
    dx = cfg.geom.dx
    bc = nodal_bc(cfg.dom)
    sigma = 1.0 / rho
    vs = tuple(vsync[d] / dt for d in range(dim))
    rhs = div_cell_to_node(vs, dx, bc)
    phi, res, it = nodal_solve(
        rhs, sigma, dx, bc, rtol=1e-10, atol=1e-14, fixed_cycles=fixed_cycles
    )
    gphi = grad_node_to_cell(phi, dx)
    out = jnp.stack([(vs[d] - sigma * gphi[d]) * dt for d in range(dim)])
    return out, phi


def interp_cell_to_fine(a, spec: LevelSpec):
    """SyncInterp (piecewise-constant variant): coarse correction -> fine
    patch increments (NavierStokesBase::SyncInterp, cpp:3071-3263)."""
    return prolong_cell(a, spec.ratio)[
        tuple(
            slice(spec.lo[d], spec.lo[d] + spec.ncell[d]) for d in range(spec.dim)
        )
    ]
