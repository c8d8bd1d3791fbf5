"""Derived fields (the derive registry).

Equivalent of reference Source/NS_derive.cpp: mag_vort (|curl U|,
NS_derive.cpp:86-265), energy (0.5 rho |U|^2, :266+), avg_pressure
(node->cell average, :51+), plus diagnostics helpers used by
sum_integrated_quantities (NavierStokes.cpp:1046-1079) and
printMaxVel/printMaxGp (NavierStokesBase.cpp:4200-4253).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from iamr_tpu.core.bc import DomainBC
from iamr_tpu.core.fill import fill_ghost
from iamr_tpu.ns.advance import _vel_bcrecs, _vel_bcvals
from iamr_tpu.ns.state import NSConfig, NSState
from iamr_tpu.ops.stencil import avg2, sl


def _cc_grad(cfg: NSConfig, f_g, d):
    """Central-difference gradient of a 1-ghost-grown field, on cells."""
    dim = f_g.ndim
    dx = cfg.geom.dx
    hi = sl(f_g, d, 2, None)
    lo = sl(f_g, d, 0, -2)
    out = (hi - lo) / (2.0 * dx[d])
    idx = tuple(
        slice(None) if e == d else slice(1, -1) for e in range(dim)
    )
    return out[idx]


def mag_vort(cfg: NSConfig, state: NSState):
    """|curl U| via central differences with BC-filled ghosts."""
    dim = cfg.dim
    recs = _vel_bcrecs(cfg)
    grads = {}
    for c in range(dim):
        lo, hi = _vel_bcvals(cfg, c)
        g = fill_ghost(state.vel[c], 1, recs[c], lo, hi)
        for d in range(dim):
            if d != c:
                grads[(c, d)] = _cc_grad(cfg, g, d)
    if dim == 2:
        return jnp.abs(grads[(1, 0)] - grads[(0, 1)])
    wx = grads[(2, 1)] - grads[(1, 2)]
    wy = grads[(0, 2)] - grads[(2, 0)]
    wz = grads[(1, 0)] - grads[(0, 1)]
    return jnp.sqrt(wx**2 + wy**2 + wz**2)


def kinetic_energy(state: NSState):
    """0.5 rho |U|^2 (derkeng)."""
    return 0.5 * state.rho * jnp.sum(state.vel**2, axis=0)


def avg_pressure(state: NSState):
    """Node -> cell averaged pressure (deravgpres)."""
    p = state.p
    for d in range(p.ndim):
        p = avg2(p, d)
    return p


def diveru(cfg: NSConfig, state: NSState):
    """Cell-centered divergence of U (the reference's diveru derived field,
    used in the HIT plotfile list; centered differences)."""
    from iamr_tpu.core.fill import fill_ghost
    from iamr_tpu.core.bc import BCRec, MathBC

    dim = cfg.dim
    kinds = tuple(
        MathBC.int_dir if cfg.geom.periodic[d] else MathBC.foextrap
        for d in range(dim)
    )
    rec = BCRec(lo=kinds, hi=kinds)
    out = 0.0
    for d in range(dim):
        g = fill_ghost(state.vel[d], 1, rec)
        out = out + _cc_grad(cfg, g, d)
    return out


def derive(cfg: NSConfig, state: NSState, name: str):
    if name in ("mag_vort", "magvort"):
        return mag_vort(cfg, state)
    if name in ("energy", "kinetic_energy"):
        return kinetic_energy(state)
    if name == "avg_pressure":
        return avg_pressure(state)
    if name == "diveru":
        return diveru(cfg, state)
    from iamr_tpu.plugins import DERIVES

    if name in DERIVES:
        # user seam (NS_derive override; iamr_tpu.plugins.derive_field)
        return DERIVES[name](cfg, state)
    raise KeyError(f"unknown derived field {name!r}")


def sum_integrated_quantities(cfg: NSConfig, state: NSState) -> Dict[str, float]:
    """Conservation monitors: volume-integrated mass, tracer, kinetic energy
    (sum_integrated_quantities, NavierStokes.cpp:1046-1079)."""
    vol = cfg.geom.cell_volume
    out = {
        "mass": float(jnp.sum(state.rho)) * vol,
        "kinetic_energy": float(jnp.sum(kinetic_energy(state))) * vol,
    }
    for t in range(state.trac.shape[0]):
        out[f"tracer{t}"] = float(jnp.sum(state.trac[t])) * vol
    return out


def max_values(state: NSState) -> Dict[str, float]:
    """printMaxVel / printMaxGp diagnostics."""
    out = {}
    for d in range(state.vel.shape[0]):
        ax = "xyz"[d]
        out[f"max|u{ax}|"] = float(jnp.max(jnp.abs(state.vel[d])))
        out[f"max|gp{ax}|"] = float(jnp.max(jnp.abs(state.gradp[d])))
    return out
