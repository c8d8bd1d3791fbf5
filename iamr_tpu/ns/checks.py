"""Runtime self-checks (the reference's debug-mode solver verifications).

Three checks from MacProj.cpp / Projection.cpp, enabled together by
`ns.debug = 1` (driver wiring) and reported individually by bench.py:

  check_div_cond   max |D(u_mac) - S| after the MAC projection — the MAC
                   projection enforces this divergence EXACTLY (to solver
                   tolerance), unlike the approximate nodal projection
                   (reference MacProj::check_div_cond, MacProj.cpp:792-846).
  umac_periodic_mismatch
                   for each periodic dim, the lo-face and hi-face columns of
                   the MAC velocity are the same physical faces; reports the
                   max |u[0] - u[n]| consistency error (reference
                   MacProj::test_umac_periodic, MacProj.cpp:977-1080,
                   default-on in debug builds).
  scan_fields      NaN + BogusValue scan over the state. The reference
                   poisons ghost cells with BogusValue (Projection.cpp:201-204
                   setBndry(BogusValue)) so unfilled-ghost reads surface as
                   huge values downstream; the dense-array equivalent is this
                   scan for |x| >= BOGUS_THRESHOLD (and NaN, matching the
                   exit-on-NaN scans, NavierStokes.cpp:847-854) after every
                   update.

All functions are jit-safe and return device scalars; the driver turns them
into host asserts once per step when debugging is on.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from iamr_tpu.ops.stencil import mac_div

#: the reference's BogusValue is 1e200 (iamr_constants.H); f32-safe here
BOGUS_THRESHOLD = 1e18


def check_div_cond(umac, dx: Sequence[float], divu_src=None, eb=None):
    """Max |div(u_mac) - S| over the level (MacProj.cpp:792-846).

    eb: when given, the cut-cell divergence sum_d d(afrac u)/dx compared
    against vfrac * S over fluid cells (the EB MAC operator's constraint)."""
    if eb is not None:
        div = mac_div(tuple(af * u for af, u in zip(eb.afrac, umac)), dx)
        tgt = 0.0 if divu_src is None else eb.vfrac * divu_src
        return jnp.max(jnp.abs((div - tgt) * eb.fluid))
    div = mac_div(umac, dx)
    if divu_src is not None:
        div = div - divu_src
    return jnp.max(jnp.abs(div))


def umac_periodic_mismatch(umac, periodic: Sequence[bool]):
    """Max |u_d[0] - u_d[n_d]| over periodic dims d (MacProj.cpp:977-1080).

    The dense face arrays store n_d+1 faces; for a periodic dim the first
    and last are the same physical face and must agree exactly."""
    out = jnp.asarray(0.0, umac[0].dtype)
    for d, u in enumerate(umac):
        if not periodic[d]:
            continue
        lo = jnp.take(u, jnp.asarray(0), axis=d)
        hi = jnp.take(u, jnp.asarray(u.shape[d] - 1), axis=d)
        out = jnp.maximum(out, jnp.max(jnp.abs(lo - hi)))
    return out


def scan_fields(**fields):
    """{name: (has_nan, has_bogus)} device flags per field (None skipped)."""
    out = {}
    for name, a in fields.items():
        if a is None:
            continue
        out[name] = (
            jnp.any(jnp.isnan(a)),
            jnp.any(jnp.abs(a) >= BOGUS_THRESHOLD),
        )
    return out


def run_debug_checks(cfg, state, umac, divu_src=None, eb=None, step=None):
    """Host-side per-step debug verification (ns.debug = 1): raises on NaN /
    BogusValue in the state, prints the MAC divergence condition and the
    periodic-face consistency error."""
    periodic = tuple(cfg.geom.periodic)
    if divu_src is None and cfg.do_temp and cfg.temp_cond_coef > 0.0:
        # thermal runs enforce div(umac) = S + dt/2 dsdt; without the
        # source there is nothing to compare against
        div = float("nan")
    else:
        div = float(check_div_cond(umac, cfg.geom.dx, divu_src=divu_src, eb=eb))
    per = float(umac_periodic_mismatch(umac, periodic)) if any(periodic) else 0.0
    scans = scan_fields(vel=state.vel, rho=state.rho, trac=state.trac,
                        p=state.p, gradp=state.gradp, temp=state.temp)
    bad = []
    for name, (has_nan, has_bogus) in scans.items():
        if bool(has_nan):
            bad.append(f"{name}: NaN")
        if bool(has_bogus):
            bad.append(f"{name}: |x| >= {BOGUS_THRESHOLD:g} (BogusValue)")
    tag = f"step {step}: " if step is not None else ""
    if bad:
        raise FloatingPointError(f"ns.debug {tag}" + "; ".join(bad))
    print(f"ns.debug {tag}max|D(umac)-S| = {div:.3e}   "
          f"periodic umac mismatch = {per:.3e}")
    return div, per
