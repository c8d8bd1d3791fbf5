"""Nodal approximate projection (the Projection engine, single level).

TPU-native equivalent of reference Source/Projection.cpp level_project
(Projection.cpp:166-449, proj_2 form) + initialVelocityProject (615-840),
over the FEM nodal multigrid (iamr_tpu.ops.mg_nodal), replacing
MLNodeLaplacian + Hydro::NodalProjector (Projection.cpp:2385-2567).

level_project semantics:
    Vs = U*/dt + Gp^{n-1/2}/rho_half          (scale, Projection.cpp:272-301)
    solve  L(phi) = D(Vs)                      (sigma = 1/rho_half)
    U^{n+1} = (Vs - sigma G(phi)) * dt
    p^{n+1/2} = phi;  Gp = G(phi)

sigma = 1/rho, zero outside the domain (scaleVar, Projection.cpp:1238-1466);
outflow faces carry phi = 0 Dirichlet nodes. Default tolerances rtol 1e-12 /
atol 1e-16 (Projection.cpp:18-20).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from iamr_tpu.core.bc import DomainBC, PhysBC
from iamr_tpu.ops import mg_nodal
from iamr_tpu.ops.mg_nodal import (
    N_DIRICHLET,
    N_NEUMANN,
    N_PERIODIC,
    NodalBC,
    div_cell_to_node,
    grad_node_to_cell,
    nodal_solve,
)


def nodal_bc(dom: DomainBC) -> NodalBC:
    def kind(p: PhysBC):
        if p == PhysBC.Interior:
            return N_PERIODIC
        if p == PhysBC.Outflow:
            return N_DIRICHLET
        return N_NEUMANN

    return NodalBC(
        lo=tuple(kind(p) for p in dom.phys_lo),
        hi=tuple(kind(p) for p in dom.phys_hi),
    )


def level_project(
    vel_star,
    rho_half,
    p_old,
    gradp_old,
    dt,
    dom: DomainBC,
    dx: Sequence[float],
    rtol: float = 1e-12,
    atol: float = 1e-16,
    fixed_cycles: Optional[int] = None,
    bc: Optional[NodalBC] = None,
    phi_bc=None,
    divu_src=None,
    eb=None,
    rz=None,
):
    """Approximate nodal projection of the provisional velocity.

    vel_star: (dim, *n) un-projected new-time velocity (updated with -Gp
    forcing); returns (vel_new, p_new, gradp_new, stats). bc/phi_bc override
    the domain BCs with coarse-fine Dirichlet values on fine levels
    (reference doMLMGNodalProjection coarse-fine handling). divu_src: cell
    field S with div(U^{n+1}) = S (thermal divergence; subtracted from the
    rhs as S/dt averaged to nodes).

    eb: optional EBData; the FEM nodal operator and the divergence are
    volume-fraction weighted (MLNodeLaplacian EB semantics) and covered
    cells are masked out of the corrected velocity/Gp.
    """
    dim = rho_half.ndim
    if bc is None:
        bc = nodal_bc(dom)
    sigma = 1.0 / rho_half

    vs = tuple(
        vel_star[d] / dt + gradp_old[d] * sigma for d in range(dim)
    )
    # prescribed inflow normal velocity enters the divergence, scaled like
    # vs (U/dt form); see div_cell_to_node inflow_vals
    inflow_vals = {
        (d, s): dom.value(d, s, d) / dt
        for d in range(dim)
        for s, p in ((0, dom.phys_lo[d]), (1, dom.phys_hi[d]))
        if p == PhysBC.Inflow
    }
    if eb is not None:
        sigma_op = sigma * eb.vfrac
        rhs = div_cell_to_node(
            tuple(eb.vfrac * v for v in vs), dx, bc, inflow_vals
        )
    elif rz is not None:
        # RZ: sigma and U are multiplied by the cell radius (scaleVar
        # radMultScal, Projection.cpp:1238-1505); the correction stays
        # unscaled (rescaleVar inverts)
        r_cell = rz[0]
        sigma_op = sigma * r_cell
        rhs = div_cell_to_node(tuple(r_cell * v for v in vs), dx, bc, inflow_vals)
    else:
        sigma_op = sigma
        rhs = div_cell_to_node(vs, dx, bc, inflow_vals)
    if divu_src is not None:
        from iamr_tpu.ops.mg_nodal import avg_cell_to_node

        src = divu_src
        if eb is not None:
            src = eb.vfrac * src
        elif rz is not None:
            src = rz[0] * src
        rhs = rhs - avg_cell_to_node(src, bc) / dt
    phi, res, it = nodal_solve(
        rhs, sigma_op, dx, bc, rtol=rtol, atol=atol, fixed_cycles=fixed_cycles,
        phi_bc=phi_bc,
    )
    gphi = grad_node_to_cell(phi, dx)
    if eb is not None:
        vel_new = jnp.stack(
            [eb.fluid * (vs[d] - sigma * gphi[d]) * dt for d in range(dim)]
        )
        gradp_new = jnp.stack([eb.fluid * g for g in gphi])
    else:
        vel_new = jnp.stack(
            [(vs[d] - sigma * gphi[d]) * dt for d in range(dim)]
        )
        gradp_new = jnp.stack(list(gphi))
    return vel_new, phi, gradp_new, (res, it)


def initial_velocity_project(
    vel,
    rho,
    dom: DomainBC,
    dx: Sequence[float],
    divu_src=None,
    rtol: float = 1e-12,
    atol: float = 1e-16,
    fixed_cycles: Optional[int] = None,
    eb=None,
    rz=None,
):
    """Make the initial velocity divergence-free (initialVelocityProject,
    Projection.cpp:615-840): solve L(phi)=D(U), U <- U - sigma G(phi); the
    initial pressure stays zero (pressure comes from init_iter pressure
    iterations, NavierStokes.cpp:1305-1432)."""
    dim = rho.ndim
    bc = nodal_bc(dom)
    sigma = 1.0 / rho
    u = tuple(vel[d] for d in range(dim))
    inflow_vals = {
        (d, s): dom.value(d, s, d)
        for d in range(dim)
        for s, p in ((0, dom.phys_lo[d]), (1, dom.phys_hi[d]))
        if p == PhysBC.Inflow
    }
    if eb is not None:
        sigma_op = sigma * eb.vfrac
        rhs = div_cell_to_node(
            tuple(eb.vfrac * ud for ud in u), dx, bc, inflow_vals
        )
    elif rz is not None:
        sigma_op = sigma * rz[0]
        rhs = div_cell_to_node(tuple(rz[0] * ud for ud in u), dx, bc, inflow_vals)
    else:
        sigma_op = sigma
        rhs = div_cell_to_node(u, dx, bc, inflow_vals)
    if divu_src is not None:
        rhs = rhs - divu_src
    phi, res, it = nodal_solve(
        rhs, sigma_op, dx, bc, rtol=rtol, atol=atol, fixed_cycles=fixed_cycles
    )
    gphi = grad_node_to_cell(phi, dx)
    vel_new = jnp.stack([u[d] - sigma * gphi[d] for d in range(dim)])
    if eb is not None:
        vel_new = vel_new * eb.fluid
    return vel_new, (res, it)
