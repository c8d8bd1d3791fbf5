"""EB divergences and flux redistribution.

TPU-native equivalent of the AMReX-Hydro EB advection pieces IAMR calls
(reference NavierStokesBase.cpp:4768-5001: HydroUtils::EB_ComputeDivergence
+ ApplyRedistribution with redistribution_type "FluxRedist"). Cut cells get
the hybrid divergence of Colella et al.:

    D_i = vfrac_i * Dc_i + (1 - vfrac_i) * Dnc_i

where Dc is the conservative cut-cell divergence and Dnc a vfrac-weighted
neighborhood average; the conservation defect
delta_i = vfrac_i (1-vfrac_i)(Dc_i - Dnc_i) is redistributed to the 3^d
fluid neighborhood proportional to volume fraction, so the scheme stays
globally conservative: sum_i V vfrac_i D_final,i = sum_i V vfrac_i Dc_i.

StateRedist (the reference default) is a higher-order variant; FluxRedist is
the stable baseline both codes support (redistribution_type parameter,
NavierStokesBase.cpp:573-578).
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp

from iamr_tpu.eb.geom import EBData
from iamr_tpu.ops.stencil import diff, sl


_EPS = 1e-12


def eb_mac_div(umac, eb: EBData, dx: Sequence[float]):
    """Conservative EB divergence of face velocities (per fluid volume):
    Dc = (1/vfrac) sum_d (afrac*u)_hi - (afrac*u)_lo / dx_d; 0 in covered."""
    out = 0.0
    for d, u in enumerate(umac):
        out = out + diff(eb.afrac[d] * u, d) / dx[d]
    return eb.fluid * out / jnp.maximum(eb.vfrac, _EPS)


def _neighborhood_sum(a, dim: int, periodic):
    """Sum of a over the 3^d neighborhood (incl. self); edges clamp
    (zero-padded for non-periodic dims: boundary cells see a smaller hood)."""
    ap = a
    for d in range(dim):
        mode = "wrap" if periodic[d] else "constant"
        ap = jnp.pad(ap, [(1, 1) if t == d else (0, 0) for t in range(dim)], mode=mode)
    out = None
    n = a.shape
    for off in itertools.product((0, 1, 2), repeat=dim):
        s = ap[tuple(slice(off[d], off[d] + n[d]) for d in range(dim))]
        out = s if out is None else out + s
    return out


def hybrid_divergence(dc, eb: EBData, periodic):
    """Hybrid divergence + flux redistribution of the defect.

    dc: conservative divergence (eb_mac_div of fluxes, already /vfrac).
    Returns the redistributed update field D such that
    sum V vfrac D == sum V vfrac dc (global conservation).
    """
    dim = dc.ndim
    vf = eb.vfrac
    w = _neighborhood_sum(vf, dim, periodic)
    dnc = _neighborhood_sum(vf * dc, dim, periodic) / jnp.maximum(w, _EPS)
    cut = eb.fluid * (1.0 - eb.regular)
    hyb = jnp.where(cut > 0.0, vf * dc + (1.0 - vf) * dnc, dc)
    delta = cut * vf * (1.0 - vf) * (dc - dnc)
    # each neighbor j of i receives delta_i * vfrac_j / W_i; cell j's
    # per-volume receipt is sum_{i in N(j)} delta_i / W_i  (vfrac_j cancels)
    receive = _neighborhood_sum(delta / jnp.maximum(w, _EPS), dim, periodic)
    return eb.fluid * (hyb + receive)


def _shift(a, d, s, periodic):
    """a shifted so result[i] = a[i+s] along d (edge: wrap or zero)."""
    out = jnp.roll(a, -s, axis=d)
    if not periodic:
        idx = [slice(None)] * a.ndim
        idx[d] = slice(s, None) if s < 0 else slice(a.shape[d] - s, None)
        out = out.at[tuple(idx)].set(0.0)
    return out


def state_redistribute(q, eb: EBData, periodic):
    """Weighted state redistribution (the reference default
    redistribution_type = StateRedist, NavierStokesBase.cpp:4984-5001;
    AMReX-Hydro Redistribution::StateRedistribute; Giuliani et al. 2022).

    Each small cut cell (vfrac < 0.5) merges with its largest-volume face
    neighbor (eb.merge_dir, built at geometry time); with nu_j = number of
    merged neighborhoods containing cell j:

        Vhat_i = sum_{r in N(i)} kappa_r / nu_r
        Qhat_i = sum_{r in N(i)} kappa_r q_r / nu_r / Vhat_i
        q_j    = (1/nu_j) sum_{i : j in N(i)} Qhat_i

    Conserves sum kappa q exactly. Piecewise-constant neighborhood
    reconstruction (the reference adds limited slopes; first-order at the
    handful of merged cells, which matches the cut-cell scheme's wall
    order)."""
    dim = q.ndim
    md = eb.merge_dir
    vf = eb.vfrac

    def offs(k):
        d, side = k // 2, k % 2
        return d, (-1 if side == 0 else 1)

    nk = 2 * dim
    masks = [(md == k).astype(q.dtype) for k in range(nk)]
    # nu_j = 1 + number of cells merging INTO j
    nu = jnp.ones_like(q)
    for k in range(nk):
        d, s = offs(k)
        nu = nu + _shift(masks[k], d, -s, periodic[d])

    kq_nu = vf * q / nu
    k_nu = vf / nu
    # neighborhood sums for merging cells: self + target
    sum_kq = kq_nu
    sum_k = k_nu
    for k in range(nk):
        d, s = offs(k)
        sum_kq = sum_kq + masks[k] * _shift(kq_nu, d, s, periodic[d])
        sum_k = sum_k + masks[k] * _shift(k_nu, d, s, periodic[d])
    qhat = jnp.where(sum_k > _EPS, sum_kq / jnp.maximum(sum_k, _EPS), q)

    # q_j = (Qhat_j + sum of Qhat from cells merging into j) / nu_j
    out = qhat
    for k in range(nk):
        d, s = offs(k)
        out = out + _shift(masks[k] * qhat, d, -s, periodic[d])
    return eb.fluid * out / nu


def eb_aofs(flux, umac, eb: EBData, dx: Sequence[float], iconserv: bool,
            s_cc=None, periodic=(), rtype: str = "FluxRedist", dt=None):
    """EB advective tendency with redistribution.

    flux: face fluxes (umac*edge states); conservative: redistribute
    Dc(flux). Convective: redistribute Dc(flux) - s*Dc(umac)
    (ComputeConvectiveTerm semantics, NavierStokesBase.cpp:4813).

    rtype: NoRedist | FluxRedist | StateRedist (ns.redistribution_type,
    NavierStokesBase.cpp:573-578). StateRedist redistributes the UPDATED
    state q - dt*Dc and converts back to a tendency (ApplyRedistribution
    update-form semantics); it needs s_cc and dt."""
    dim = len(flux)
    if not periodic:
        periodic = (False,) * dim
    dc = eb_mac_div(flux, eb, dx)
    if not iconserv:
        dc = dc - s_cc * eb_mac_div(umac, eb, dx)
    if rtype == "NoRedist":
        return dc
    if (
        rtype == "StateRedist"
        and eb.merge_dir is not None
        and s_cc is not None
        and dt is not None
    ):
        q_upd = s_cc - dt * dc
        q_new = state_redistribute(q_upd, eb, periodic)
        return (s_cc - q_new) * eb.fluid / dt
    return hybrid_divergence(dc, eb, periodic)


def set_body_state(a, eb: EBData, body_value=0.0):
    """Fill covered cells with the body state (NSB_K.H set_body_state_k)."""
    return a * eb.fluid + body_value * eb.covered
