"""Fused Godunov-PLM advection kernel (3D, f32, TPU).

One pallas_call per advected field runs the ENTIRE advection pipeline of
ops/godunov.py — 4th-order MC-limited slopes, normal predictor, upwind hat
states, transverse corrections (+ conservative normal-divergence term and
forcing), final upwind edge states, fluxes, and the advective tendency —
where the XLA path issues ~50 fusions and re-materializes every
intermediate (profiled 23 ms per field at 256^3 vs a ~1 ms bandwidth
bound).

Reference semantics being fused: AMReX-Hydro Godunov ExtrapVelToFaces /
HydroUtils::ComputeFluxesOnBoxFromState + ComputeDivergence +
ComputeConvectiveTerm (call sites NavierStokesBase.cpp:4487-4820).

Kernel style: slab decomposition over dim 0 (halo 3 = the ghost width);
ALL neighbor access is ref slicing against the input blocks (Mosaic
rematerializes VMEM loads — the roll/value style pins registers and
spills, see pallas_fused.py); the per-direction hat states are staged
through VMEM scratch to keep the live value set small. Arithmetic is
IDENTICAL to compute_edge_states/compute_fluxes_and_aofs (verified by the
exactness tests in tests/test_pallas_godunov.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

_T = 8  # slab rows (f32 sublane tiling)
_EPS_UPWIND = 1e-14


def godunov_fused_ok(shape, dtype, scheme, rz, eb) -> bool:
    import os

    from iamr_tpu.parallel.context import active

    if active() is not None:
        # a spatial mesh is live: pallas_call is opaque to the SPMD
        # partitioner; multi-chip programs use the XLA path
        return False
    if scheme != "plm" or rz is not None or eb is not None:
        return False
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if jax.config.jax_enable_x64:
        # x64 in-process breaks Mosaic lowering of pure-f32 kernels
        return False
    if int(np.prod(shape)) < (1 << 21):
        return False
    if min(shape) < 8 or shape[0] % 8 != 0:
        return False
    # VMEM bound from the actual tiled geometry (both kernels tile dims 0/1
    # into (T x BS1 x n2) blocks): double-buffered input blocks + 9 scratch
    # hat buffers + ~40 compiler-materialized live values per tile
    T = _pick_t()
    BS1 = _pick_t1(shape[1]) + 8
    n2 = shape[2]
    in_blk = (T + 6) * BS1 * (n2 + 6) * 4
    val_blk = (T + 2) * BS1 * (n2 + 2) * 4
    need = 2 * 6 * in_blk + (9 + 40) * val_blk
    if need > 110 * 1024 * 1024:
        return False
    env = os.environ.get("IAMR_FUSED", "")
    if env == "0":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu or env == "1"


def _upw(sl_, sr, speed):
    # thresholded upwind pick (mirrors godunov._upwind exactly)
    small = jnp.abs(speed) < _EPS_UPWIND
    out = jnp.where(speed > 0.0, sl_, sr)
    return jnp.where(small, 0.5 * (sl_ + sr), out)


def _pick_t() -> int:
    """dim0 slab rows: validated IAMR_GOD_T override (>0, 8-divisible for
    f32 sublane tiling), else the default _T."""
    import os

    env = os.environ.get("IAMR_GOD_T", "")
    if env:
        try:
            t = int(env)
            if t > 0 and t % 8 == 0:
                return t
        except ValueError:
            pass
    return _T


def _pick_t1(n1: int) -> int:
    """dim1 tile size: validated IAMR_GOD_T1 override (>0 and 8-divisible,
    the '2nd-minor: 8-divisible' assumption behind BS1 = T1+8), else the
    measured heuristic (bench_experiments/exp_god_t1.py)."""
    import os

    env = os.environ.get("IAMR_GOD_T1", "")
    if env:
        try:
            t1 = int(env)
            if t1 > 0 and t1 % 8 == 0:
                return t1
        except ValueError:
            pass
    return 64 if n1 >= 128 else (16 if n1 >= 32 else 8)


def _advect_field_tile(
    sg, u0, u1, u2, fg, h0, h1, h2,
    *, T, n1, n2, dx, dt, iconserv, has_force, conv_out,
):
    """One field's full advection pipeline on one (T x n1 x n2) tile;
    returns (f0, f1, f2, aofs) value blocks. Shared by the single-field
    and multi-field kernels — the multi-field kernel loops this per field
    with the SAME u0/u1/u2 blocks (the MAC loads amortize across fields)
    and reuses the h0/h1/h2 hat scratch.

    See _godunov_kernel for the index conventions.

    Local row conventions (global cell c, block start g0 = i*T):
      sg   row ls = c - g0 + 3   (block rows T+6: cells [g0-3, g0+T+3))
      u0   row lf = f - g0 + 1   (0-faces; block rows T+3: faces [g0-1, g0+T+2))
      u1/u2 row   = c - g0 + 1   (block rows T+2: cells [g0-1, g0+T+1))
      fg   row    = c - g0 + 1   (block rows T+2)
    Transverse: sg cols = node + 3 over [-3, n+3); u_e transverse ng=1
    (col = idx + 1); outputs real extents.

    Scratch hats: h0 (T+1, n1+2, n2+2) on 0-faces [g0, g0+T+1), transverse
    ng=1; h1 (T+2, n1+1, n2+2) dim0 cells [g0-1, g0+T+1); h2 like h1 with
    dims 1/2 swapped roles.
    """
    dtdx = tuple(dt * (1.0 / h) for h in dx)

    # ---- phase 0: per-dim slope caches -----------------------------------
    # each slope4 field is computed ONCE over its maximal window and staged
    # through VMEM scratch; recomputing it per use (hat pass + edge pass,
    # L and R) made the kernel VMEM-load bound (~100 block-loads/program)
    # VALUES, not scratch: staging these through VMEM scratch measured
    # 7.5x slower (147 vs 20 ms) — Mosaic register/spill management beats
    # explicit scratch round-trips for shared subexpressions
    sl0 = _slope4_dim0(sg, 2, T + 2, 2, n1 + 2, 2, n2 + 2)
    sl1 = _slope4_dimt(sg, 1, 2, T + 2, 2, n1 + 2, 2, n2 + 2)
    sl2 = _slope4_dimt(sg, 2, 2, T + 2, 2, n2 + 2, 2, n1 + 2)

    # ---- phase 1: hat states into scratch --------------------------------
    # h0: 0-faces [g0, g0+T+1), transverse ng=1 cells [-1, n+1)
    uf = u0[1:T + 2, 0:n1 + 2, :]  # faces rows [g0, g0+T+1)
    cfl = dtdx[0] * uf
    qL = sg[2:T + 3, 2:n1 + 4, 2:n2 + 4]    # cell f-1, transverse [-1,n+1)
    qR = sg[3:T + 4, 2:n1 + 4, 2:n2 + 4]    # cell f
    sL = sl0[0:T + 1, :, :]
    sR = sl0[1:T + 2, :, :]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR
    h0[...] = _upw(pL, pR, uf)

    # h1: 1-faces, dim0 cells [g0-1, g0+T+1), dim2 ng=1
    uf = u1[0:T + 2, 1:n1 + 2, :]
    cfl = dtdx[1] * uf
    qL = sg[2:T + 4, 2:n1 + 3, 2:n2 + 4]
    qR = sg[2:T + 4, 3:n1 + 4, 2:n2 + 4]
    sL = sl1[:, 0:n1 + 1, :]
    sR = sl1[:, 1:n1 + 2, :]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR
    h1[...] = _upw(pL, pR, uf)

    # h2: 2-faces, dim0 cells [g0-1, g0+T+1), dim1 ng=1
    uf = u2[0:T + 2, 0:n1 + 2, 1:n2 + 2]
    cfl = dtdx[2] * uf
    qL = sg[2:T + 4, 2:n1 + 4, 2:n2 + 3]
    qR = sg[2:T + 4, 2:n1 + 4, 3:n2 + 4]
    sL = sl2[:, :, 0:n2 + 1]
    sR = sl2[:, :, 1:n2 + 2]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR
    h2[...] = _upw(pL, pR, uf)

    # ---- phase 2: edges + fluxes + aofs ----------------------------------
    # --- d = 0: faces [g0, g0+T+1), transverse REAL ---
    uf = u0[1:T + 2, 1:n1 + 1, 1:n2 + 1]
    cfl = dtdx[0] * uf
    qL = sg[2:T + 3, 3:n1 + 3, 3:n2 + 3]
    qR = sg[3:T + 4, 3:n1 + 3, 3:n2 + 3]
    sL = sl0[0:T + 1, 1:n1 + 1, 1:n2 + 1]
    sR = sl0[1:T + 2, 1:n1 + 1, 1:n2 + 1]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR

    def corr0_all():
        """Transverse correction at ALL dim0 cells [g0-1, g0+T+1) (T+2
        rows, transverse real), computed ONCE; the L/R face states slice
        overlapping T+1-row windows out of it (the per-face recompute did
        this whole body twice)."""
        R = T + 2  # cells [g0-1, g0+T+1); h/u row of cell c is c-g0+1
        # e = 1
        hq_lo = h1[0:R, 0:n1, 1:n2 + 1]
        hq_hi = h1[0:R, 1:n1 + 1, 1:n2 + 1]
        uv_lo = u1[0:R, 1:n1 + 1, 1:n2 + 1]
        uv_hi = u1[0:R, 2:n1 + 2, 1:n2 + 1]
        if iconserv:
            t = -0.5 * dtdx[1] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = -0.5 * dtdx[1] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        # e = 2
        hq_lo = h2[0:R, 1:n1 + 1, 0:n2]
        hq_hi = h2[0:R, 1:n1 + 1, 1:n2 + 1]
        uv_lo = u2[0:R, 1:n1 + 1, 1:n2 + 1]
        uv_hi = u2[0:R, 1:n1 + 1, 2:n2 + 2]
        if iconserv:
            t = t - 0.5 * dtdx[2] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = t - 0.5 * dtdx[2] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        if iconserv:
            # -dt/2 * s * d(u0)/dx0 at the cell
            q_cc = sg[2:2 + R, 3:n1 + 3, 3:n2 + 3]
            du = (u0[1:R + 1, 1:n1 + 1, 1:n2 + 1]
                  - u0[0:R, 1:n1 + 1, 1:n2 + 1]) * (1.0 / dx[0])
            t = t - 0.5 * dt * q_cc * du
        if has_force:
            t = t + 0.5 * dt * fg[0:R, 1:n1 + 1, 1:n2 + 1]
        return t

    t0 = corr0_all()
    sLf = pL + t0[0:T + 1]
    sRf = pR + t0[1:T + 2]
    edge0 = _upw(sLf, sRf, uf)
    fx0 = uf * edge0
    f0 = fx0[0:T]
    div = (fx0[1:T + 1] - fx0[0:T]) * (1.0 / dx[0])

    # --- d = 1: 1-faces [0, n1+1), dim0 cells [g0, g0+T) real ---
    uf = u1[1:T + 1, 1:n1 + 2, 1:n2 + 1]
    cfl = dtdx[1] * uf
    qL = sg[3:T + 3, 2:n1 + 3, 3:n2 + 3]
    qR = sg[3:T + 3, 3:n1 + 4, 3:n2 + 3]
    sL = sl1[1:T + 1, 0:n1 + 1, 1:n2 + 1]
    sR = sl1[1:T + 1, 1:n1 + 2, 1:n2 + 1]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR

    def corr1_all():
        """Transverse correction at ALL dim1 cells [-1, n1+1) (n1+2 cols,
        dim0 real), computed once and sliced per face side."""
        C = n1 + 2  # dim1 cells [-1, n1+1); h/u col of cell c is c+1
        # e = 0: hat0 at 0-faces
        hq_lo = h0[0:T, 0:C, 1:n2 + 1]
        hq_hi = h0[1:T + 1, 0:C, 1:n2 + 1]
        uv_lo = u0[1:T + 1, 0:C, 1:n2 + 1]
        uv_hi = u0[2:T + 2, 0:C, 1:n2 + 1]
        if iconserv:
            t = -0.5 * dtdx[0] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = -0.5 * dtdx[0] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        # e = 2
        hq_lo = h2[1:T + 1, 0:C, 0:n2]
        hq_hi = h2[1:T + 1, 0:C, 1:n2 + 1]
        uv_lo = u2[1:T + 1, 0:C, 1:n2 + 1]
        uv_hi = u2[1:T + 1, 0:C, 2:n2 + 2]
        if iconserv:
            t = t - 0.5 * dtdx[2] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = t - 0.5 * dtdx[2] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        if iconserv:
            q_cc = sg[3:T + 3, 2:2 + C, 3:n2 + 3]
            du = (u1[1:T + 1, 1:C + 1, 1:n2 + 1]
                  - u1[1:T + 1, 0:C, 1:n2 + 1]) * (1.0 / dx[1])
            t = t - 0.5 * dt * q_cc * du
        if has_force:
            t = t + 0.5 * dt * fg[1:T + 1, 0:C, 1:n2 + 1]
        return t

    t1 = corr1_all()
    sLf = pL + t1[:, 0:n1 + 1, :]
    sRf = pR + t1[:, 1:n1 + 2, :]
    edge1 = _upw(sLf, sRf, uf)
    fx1 = uf * edge1
    f1 = fx1[:, 0:n1, :]   # faces [g1, g1+T1); face n1 covered by
    # the next tile's interior (nblk1 is padded when T1 divides n1)
    div = div + (fx1[:, 1:n1 + 1, :] - fx1[:, 0:n1, :]) * (1.0 / dx[1])

    # --- d = 2 ---
    uf = u2[1:T + 1, 1:n1 + 1, 1:n2 + 2]
    cfl = dtdx[2] * uf
    qL = sg[3:T + 3, 3:n1 + 3, 2:n2 + 3]
    qR = sg[3:T + 3, 3:n1 + 3, 3:n2 + 4]
    sL = sl2[1:T + 1, 1:n1 + 1, 0:n2 + 1]
    sR = sl2[1:T + 1, 1:n1 + 1, 1:n2 + 2]
    pL = qL + 0.5 * (1.0 - cfl) * sL
    pR = qR - 0.5 * (1.0 + cfl) * sR

    def corr2_all():
        """Transverse correction at ALL dim2 cells [-1, n2+1), once."""
        C = n2 + 2
        # e = 0
        hq_lo = h0[0:T, 1:n1 + 1, 0:C]
        hq_hi = h0[1:T + 1, 1:n1 + 1, 0:C]
        uv_lo = u0[1:T + 1, 1:n1 + 1, 0:C]
        uv_hi = u0[2:T + 2, 1:n1 + 1, 0:C]
        if iconserv:
            t = -0.5 * dtdx[0] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = -0.5 * dtdx[0] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        # e = 1
        hq_lo = h1[1:T + 1, 0:n1, 0:C]
        hq_hi = h1[1:T + 1, 1:n1 + 1, 0:C]
        uv_lo = u1[1:T + 1, 1:n1 + 1, 0:C]
        uv_hi = u1[1:T + 1, 2:n1 + 2, 0:C]
        if iconserv:
            t = t - 0.5 * dtdx[1] * (uv_hi * hq_hi - uv_lo * hq_lo)
        else:
            t = t - 0.5 * dtdx[1] * 0.5 * (uv_lo + uv_hi) * (hq_hi - hq_lo)
        if iconserv:
            q_cc = sg[3:T + 3, 3:n1 + 3, 2:2 + C]
            du = (u2[1:T + 1, 1:n1 + 1, 1:C + 1]
                  - u2[1:T + 1, 1:n1 + 1, 0:C]) * (1.0 / dx[2])
            t = t - 0.5 * dt * q_cc * du
        if has_force:
            t = t + 0.5 * dt * fg[1:T + 1, 1:n1 + 1, 0:C]
        return t

    t2 = corr2_all()
    sLf = pL + t2[:, :, 0:n2 + 1]
    sRf = pR + t2[:, :, 1:n2 + 2]
    edge2 = _upw(sLf, sRf, uf)
    fx2 = uf * edge2
    f2 = fx2
    div = div + (fx2[:, :, 1:n2 + 1] - fx2[:, :, 0:n2]) * (1.0 / dx[2])

    if conv_out:
        # aofs = div(F) - s * div(umac)
        s_cc = sg[3:T + 3, 3:n1 + 3, 3:n2 + 3]
        divu = (
            (u0[2:T + 2, 1:n1 + 1, 1:n2 + 1]
             - u0[1:T + 1, 1:n1 + 1, 1:n2 + 1]) * (1.0 / dx[0])
            + (u1[1:T + 1, 2:n1 + 2, 1:n2 + 1]
               - u1[1:T + 1, 1:n1 + 1, 1:n2 + 1]) * (1.0 / dx[1])
            + (u2[1:T + 1, 1:n1 + 1, 2:n2 + 2]
               - u2[1:T + 1, 1:n1 + 1, 1:n2 + 1]) * (1.0 / dx[2])
        )
        return f0, f1, f2, div - s_cc * divu
    return f0, f1, f2, div


def _godunov_kernel(
    scal, sg, u0, u1, u2, fg, f0_o, f1_o, f2_o, a_o, h0, h1, h2,
    *, T, n1, n2, dx, iconserv, has_force, conv_out,
):
    f0, f1, f2, a = _advect_field_tile(
        sg, u0, u1, u2, fg, h0, h1, h2, T=T, n1=n1, n2=n2, dx=dx,
        dt=scal[0, 0], iconserv=iconserv, has_force=has_force,
        conv_out=conv_out,
    )
    f0_o[...] = f0
    f1_o[...] = f1
    f2_o[...] = f2
    a_o[...] = a


def _godunov_kernel_multi(
    scal, sg, u0, u1, u2, fg, f0_o, f1_o, f2_o, a_o, h0, h1, h2,
    *, T, n1, n2, dx, iconservs, force_rows, convs,
):
    """All advected fields of one timestep in ONE pallas_call: sg carries
    a leading field axis [nc, ...]; the u0/u1/u2 blocks are loaded once and
    reused by every field (they dominate the single-field kernel's input
    traffic); fg stacks only the fields that HAVE a force (force_rows[j] is
    the row or -1). Per-field iconserv/convective flags are static."""
    dt = scal[0, 0]
    for j in range(sg.shape[0]):
        fr = force_rows[j]
        f0, f1, f2, a = _advect_field_tile(
            sg[j], u0, u1, u2, fg[fr] if fr >= 0 else None, h0, h1, h2,
            T=T, n1=n1, n2=n2, dx=dx, dt=dt, iconserv=iconservs[j],
            has_force=fr >= 0, conv_out=convs[j],
        )
        f0_o[j] = f0
        f1_o[j] = f1
        f2_o[j] = f2
        a_o[j] = a


def godunov_plm_fused(
    s_g, umac, umac_g, dt, dx, ncell, iconserv: bool,
    force_g=None, periodic=None, interpret: bool = False,
):
    """Fused PLM advection of one field. Returns ((fx, fy, fz), aofs) with
    the exact arithmetic of compute_edge_states + compute_fluxes_and_aofs
    (scheme=plm, 3D, no RZ/EB).

    s_g: ghosts filled to 3; umac: raw MAC faces; umac_g: transverse-grown
    (bcp.grow_umac); force_g: optional, 1 ghost.

    2D tile grid over dims 0 and 1 (dim 2 spans whole lanes): Mosaic
    materializes every distinct stencil window as a live value, so full-
    transverse blocks blow VMEM at 256^3; (T0 x T1 x n2) tiles keep the
    live set ~35 values of ~1 MB. The kernel body is tile-translation-
    invariant in dims 0/1 — the driver just aligns each array's window so
    local index conventions match the single-tile case."""
    n0, n1, n2 = tuple(int(x) for x in ncell)
    dtype = s_g.dtype
    import os

    T = _pick_t()
    T1 = _pick_t1(n1)
    nblk = (n0 + T - 1) // T
    if nblk * T == n0:
        nblk += 1           # cover face n0 in a block interior
    nblk1 = (n1 + T1 - 1) // T1
    if nblk1 * T1 == n1:
        nblk1 += 1          # cover face n1 for the y-flux
    BS1 = T1 + 8            # uniform dim1 window (2nd-minor: 8-divisible)

    per = tuple(bool(p) for p in periodic) if periodic is not None else (False,) * 3

    def ext_face(u, d, wrap):
        """Extend a face array by one ghost face per side of its OWN dim so
        the in-kernel d(u)/dx at normal-ghost cells reproduces the XLA
        path's wrap/edge-copied dudx (periodic: true wrap difference;
        else linear extrapolation = edge-copied gradient)."""
        first = jax.lax.slice_in_dim(u, 0, 1, axis=d)
        second = jax.lax.slice_in_dim(u, 1, 2, axis=d)
        nlast = u.shape[d]
        last = jax.lax.slice_in_dim(u, nlast - 1, nlast, axis=d)
        seclast = jax.lax.slice_in_dim(u, nlast - 2, nlast - 1, axis=d)
        if wrap:
            lo = first - (last - seclast)
            hi = last + (second - first)
        else:
            lo = 2.0 * first - second
            hi = 2.0 * last - seclast
        return jnp.concatenate([lo, u, hi], axis=d)

    def pad_to(x, d, need):
        """Edge-pad dim d at the high end to length `need`."""
        if x.shape[d] >= need:
            return x
        pads = [(0, 0)] * 3
        pads[d] = (0, need - x.shape[d])
        return jnp.pad(x, pads, mode="edge")

    # dim0 windows: sg T+6 @ i*T; u0 T+3; u1/u2/fg T+2 (front conventions
    # already encode the margins). dim1 windows: uniform BS1 @ j*T1; each
    # array's front pad puts local col conventions in place, spare high
    # cols are never read.
    need0 = {"sg": (nblk - 1) * T + T + 6, "u0": (nblk - 1) * T + T + 3,
             "u": (nblk - 1) * T + T + 2}
    need1 = (nblk1 - 1) * T1 + BS1

    sgp = pad_to(pad_to(s_g, 0, need0["sg"]), 1, need1)
    u0p = ext_face(umac_g[0], 0, per[0])
    u0p = pad_to(pad_to(u0p, 0, need0["u0"]), 1, need1)
    u1p = ext_face(umac_g[1], 1, per[1])
    u1p = pad_to(pad_to(u1p, 0, need0["u"]), 1, need1)
    u2p = ext_face(umac_g[2], 2, per[2])
    u2p = pad_to(pad_to(u2p, 0, need0["u"]), 1, need1)
    has_force = force_g is not None
    if has_force:
        fgp = pad_to(pad_to(force_g, 0, need0["u"]), 1, need1)
    else:
        fgp = jnp.zeros((1, 1, 1), dtype)

    kern = partial(
        _godunov_kernel, T=T, n1=T1, n2=n2,
        dx=tuple(float(h) for h in dx), iconserv=iconserv,
        has_force=has_force, conv_out=not iconserv,
    )
    scal = jnp.asarray(dt, dtype).reshape(1, 1)

    def in_spec(rows, a):
        return pl.BlockSpec(
            (pl.Element(rows, (0, 0)), pl.Element(BS1, (0, 0)),
             pl.Element(a.shape[2], (0, 0))),
            lambda i, j: (i * T, j * T1, 0),
        )

    out_shapes = (
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2 + 1), dtype),
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2), dtype),  # aofs
    )
    out_specs = tuple(
        pl.BlockSpec((T, T1) + s.shape[2:], lambda i, j: (i, j, 0))
        for s in out_shapes
    )
    scratch = [
        pltpu.VMEM((T + 1, T1 + 2, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 1, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 2, n2 + 1), dtype),
    ]
    fx, fy, fz, aofs = pl.pallas_call(
        kern,
        grid=(nblk, nblk1),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            in_spec(T + 6, sgp),
            in_spec(T + 3, u0p),
            in_spec(T + 2, u1p),
            in_spec(T + 2, u2p),
            (in_spec(T + 2, fgp) if has_force
             else pl.BlockSpec(memory_space=pltpu.VMEM)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(scal, sgp, u0p, u1p, u2p, fgp)
    fluxes = (fx[:n0 + 1, :n1], fy[:n0, :n1 + 1], fz[:n0, :n1])
    return fluxes, aofs[:n0, :n1]


def _pick_t1_multi(n1: int, n2: int, nc: int, nf: int) -> int:
    """dim1 tile for the multi-field kernel: largest 8-divisible T1 whose
    per-tile VMEM (nc-scaled inputs/outputs, shared u blocks, 3 reused hat
    scratch, ~40-value live set) fits the budget."""
    T = _pick_t()
    for t1 in (64, 32, 16, 8):
        if t1 > max(8, n1):
            continue
        BS1 = t1 + 8
        in_sg = nc * (T + 6) * BS1 * (n2 + 6) * 4
        in_u = 3 * (T + 3) * BS1 * (n2 + 3) * 4
        in_f = max(nf, 1) * (T + 2) * BS1 * (n2 + 2) * 4
        out = nc * 4 * T * t1 * (n2 + 1) * 4
        val = (T + 2) * BS1 * (n2 + 2) * 4
        need = 2 * (in_sg + in_u + in_f + out) + (3 + 40) * val
        if need <= 100 * 1024 * 1024:
            return t1
    return 8


def godunov_multi_ok(shape, dtype, scheme, rz, eb, nc) -> bool:
    """Gate for the one-call multi-field advection (same conditions as the
    single-field kernel; the VMEM fit is checked by _pick_t1_multi)."""
    if not godunov_fused_ok(shape, dtype, scheme, rz, eb):
        return False
    return nc >= 2


def godunov_plm_fused_multi(
    s_gs, umac, umac_g, dt, dx, ncell, iconservs, force_gs, force_rows,
    convs, periodic=None, interpret: bool = False,
):
    """ALL advected fields of a step in ONE pallas_call (velocity x3, rho,
    tracers, temperature): the three MAC-velocity blocks — which dominate
    the single-field kernel's input traffic — are loaded once per tile and
    reused by every field, and the per-tile pipeline overheads amortize.

    s_gs: list of nc fields with 3 filled ghosts; iconservs/convs: per-field
    static flags; force_gs: list of force arrays (1 ghost) for the fields
    that have one, force_rows[j] = row into force_gs or -1.
    Returns (fluxes[j], aofs[j]) per field, exactly godunov_plm_fused's
    arithmetic per field."""
    n0, n1, n2 = tuple(int(x) for x in ncell)
    nc = len(s_gs)
    nf = len(force_gs)
    dtype = s_gs[0].dtype

    T = _pick_t()
    T1 = _pick_t1_multi(n1, n2, nc, nf)
    nblk = (n0 + T - 1) // T
    if nblk * T == n0:
        nblk += 1
    nblk1 = (n1 + T1 - 1) // T1
    if nblk1 * T1 == n1:
        nblk1 += 1
    BS1 = T1 + 8

    per = tuple(bool(p) for p in periodic) if periodic is not None else (False,) * 3

    def ext_face(u, d, wrap):
        first = jax.lax.slice_in_dim(u, 0, 1, axis=d)
        second = jax.lax.slice_in_dim(u, 1, 2, axis=d)
        nlast = u.shape[d]
        last = jax.lax.slice_in_dim(u, nlast - 1, nlast, axis=d)
        seclast = jax.lax.slice_in_dim(u, nlast - 2, nlast - 1, axis=d)
        if wrap:
            lo = first - (last - seclast)
            hi = last + (second - first)
        else:
            lo = 2.0 * first - second
            hi = 2.0 * last - seclast
        return jnp.concatenate([lo, u, hi], axis=d)

    def pad_to(x, d, need):
        if x.shape[d] >= need:
            return x
        pads = [(0, 0)] * x.ndim
        pads[d] = (0, need - x.shape[d])
        return jnp.pad(x, pads, mode="edge")

    need0 = {"sg": (nblk - 1) * T + T + 6, "u0": (nblk - 1) * T + T + 3,
             "u": (nblk - 1) * T + T + 2}
    need1 = (nblk1 - 1) * T1 + BS1

    sgp = jnp.stack([pad_to(pad_to(s, 0, need0["sg"]), 1, need1)
                     for s in s_gs])
    u0p = pad_to(pad_to(ext_face(umac_g[0], 0, per[0]), 0, need0["u0"]),
                 1, need1)
    u1p = pad_to(pad_to(ext_face(umac_g[1], 1, per[1]), 0, need0["u"]),
                 1, need1)
    u2p = pad_to(pad_to(ext_face(umac_g[2], 2, per[2]), 0, need0["u"]),
                 1, need1)
    if nf:
        fgp = jnp.stack([pad_to(pad_to(f, 0, need0["u"]), 1, need1)
                         for f in force_gs])
    else:
        fgp = jnp.zeros((1, 1, 1, 1), dtype)

    kern = partial(
        _godunov_kernel_multi, T=T, n1=T1, n2=n2,
        dx=tuple(float(h) for h in dx), iconservs=tuple(iconservs),
        force_rows=tuple(force_rows), convs=tuple(convs),
    )
    scal = jnp.asarray(dt, dtype).reshape(1, 1)

    def in_spec4(rows, a):
        return pl.BlockSpec(
            (pl.Element(a.shape[0], (0, 0)), pl.Element(rows, (0, 0)),
             pl.Element(BS1, (0, 0)), pl.Element(a.shape[3], (0, 0))),
            lambda i, j: (0, i * T, j * T1, 0),
        )

    def in_spec3(rows, a):
        return pl.BlockSpec(
            (pl.Element(rows, (0, 0)), pl.Element(BS1, (0, 0)),
             pl.Element(a.shape[2], (0, 0))),
            lambda i, j: (i * T, j * T1, 0),
        )

    out_shapes = (
        jax.ShapeDtypeStruct((nc, nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nc, nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nc, nblk * T, nblk1 * T1, n2 + 1), dtype),
        jax.ShapeDtypeStruct((nc, nblk * T, nblk1 * T1, n2), dtype),
    )
    out_specs = tuple(
        pl.BlockSpec((nc, T, T1) + s.shape[3:], lambda i, j: (0, i, j, 0))
        for s in out_shapes
    )
    scratch = [
        pltpu.VMEM((T + 1, T1 + 2, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 1, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 2, n2 + 1), dtype),
    ]
    fx, fy, fz, aofs = pl.pallas_call(
        kern,
        grid=(nblk, nblk1),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            in_spec4(T + 6, sgp),
            in_spec3(T + 3, u0p),
            in_spec3(T + 2, u1p),
            in_spec3(T + 2, u2p),
            (in_spec4(T + 2, fgp) if nf
             else pl.BlockSpec(memory_space=pltpu.VMEM)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(scal, sgp, u0p, u1p, u2p, fgp)
    out = []
    for j in range(nc):
        fluxes = (fx[j, :n0 + 1, :n1], fy[j, :n0, :n1 + 1], fz[j, :n0, :n1])
        out.append((fluxes, aofs[j, :n0, :n1]))
    return out


# ---------------------------------------------------------------------------
# fused ExtrapVelToFaces (the MAC-velocity predictor)


def _slope4_dim0(sg, fc_lo, rows, c1lo, c1n, c2lo, c2n):
    """4th-order MC slope along dim0 at cells [fc_lo, fc_lo+rows) in sg row
    units, transverse windows [c1lo, c1lo+c1n) x [c2lo, c2lo+c2n)."""

    def q(o):
        return sg[fc_lo + o:fc_lo + o + rows,
                  c1lo:c1lo + c1n, c2lo:c2lo + c2n]

    def s2(o):
        c = q(o)
        lo = q(o - 1)
        hi = q(o + 1)
        dc = 0.5 * (hi - lo)
        dl = 2.0 * (c - lo)
        dr = 2.0 * (hi - c)
        dlim = jnp.minimum(jnp.abs(dl), jnp.abs(dr))
        dlim = jnp.where(dl * dr > 0.0, dlim, 0.0)
        return jnp.sign(dc) * jnp.minimum(jnp.abs(dc), dlim)

    c = q(0)
    lo = q(-1)
    hi = q(1)
    dc = (4.0 / 3.0) * 0.5 * (hi - lo) - (1.0 / 6.0) * (s2(1) + s2(-1))
    dl = 2.0 * (c - lo)
    dr = 2.0 * (hi - c)
    dlim = jnp.minimum(jnp.abs(dl), jnp.abs(dr))
    dlim = jnp.where(dl * dr > 0.0, dlim, 0.0)
    return jnp.sign(dc) * jnp.minimum(jnp.abs(dc), dlim)


def _slope4_dimt(sg, d, r_lo, r_n, o_t, t_n, u_lo, u_n):
    """4th-order MC slope along transverse dim d (1 or 2): dim0 rows
    [r_lo, r_lo+r_n), dim-d cells at base col o_t extent t_n, the other
    transverse dim at [u_lo, u_lo+u_n)."""

    def q(o):
        if d == 1:
            return sg[r_lo:r_lo + r_n, o_t + o:o_t + o + t_n,
                      u_lo:u_lo + u_n]
        return sg[r_lo:r_lo + r_n, u_lo:u_lo + u_n,
                  o_t + o:o_t + o + t_n]

    def s2(o):
        c = q(o)
        lo = q(o - 1)
        hi = q(o + 1)
        dc = 0.5 * (hi - lo)
        dl = 2.0 * (c - lo)
        dr = 2.0 * (hi - c)
        dlim = jnp.minimum(jnp.abs(dl), jnp.abs(dr))
        dlim = jnp.where(dl * dr > 0.0, dlim, 0.0)
        return jnp.sign(dc) * jnp.minimum(jnp.abs(dc), dlim)

    c = q(0)
    lo = q(-1)
    hi = q(1)
    dc = (4.0 / 3.0) * 0.5 * (hi - lo) - (1.0 / 6.0) * (s2(1) + s2(-1))
    dl = 2.0 * (c - lo)
    dr = 2.0 * (hi - c)
    dlim = jnp.minimum(jnp.abs(dl), jnp.abs(dr))
    dlim = jnp.where(dl * dr > 0.0, dlim, 0.0)
    return jnp.sign(dc) * jnp.minimum(jnp.abs(dc), dlim)


def _rself(ul, ur):
    """Self-advected normal-velocity Riemann (godunov._riemann_self):
    thresholded pick, matching the XLA path bitwise."""
    avg = ul + ur
    out = jnp.where((ul > 0.0) & (avg > 0.0), ul, 0.0)
    out = jnp.where((ur < 0.0) & (avg < 0.0), ur, out)
    return out


def _extrap_kernel(
    scal, sg0, sg1, sg2, fg0, fg1, fg2, o0, o1, o2,
    hv0, hq01, hq02, hv1, hq10, hq12, hv2, hq20, hq21,
    *, T, n1, n2, dx, has_force,
):
    """One (T x n1 x n2) tile of ExtrapVelToFaces (godunov.py:199-364).

    Index conventions match _godunov_kernel: sg_c rows = cell - g0 + 3,
    cols = cell1 - g1 + 3 / cell2 + 3; fg_c rows/cols shifted by 1.
    Scratch: per face dim e, the Riemann-resolved hat states hv{e}
    (normal comp, _riemann_self) and hq{e}{c} (upwinded transverse comp c)
    with the same extents as the advect kernel's h0/h1/h2:
      hv0/hq0*: (T+1, n1+2, n2+2)  0-faces [g0, g0+T+1), transverse ng=1
      hv1/hq1*: (T+2, n1+1, n2+2)  1-faces [g1, g1+T1+1), dim0 [g0-1,g0+T+1)
      hv2/hq2*: (T+2, n1+2, n2+1)  2-faces [0, n2+1)
    Outputs: o0 faces [g0, g0+T) x real; o1 real x faces [g1, g1+T1);
    o2 real x real x faces [0, n2+1).
    """
    dt = scal[0, 0]
    dtdx = tuple(dt * (1.0 / h) for h in dx)
    sgs = (sg0, sg1, sg2)

    # ---- phase 0: the 9 limited slope fields (values, not scratch) -------
    sl0 = [_slope4_dim0(sgs[c], 2, T + 2, 2, n1 + 2, 2, n2 + 2)
           for c in range(3)]
    sl1 = [_slope4_dimt(sgs[c], 1, 2, T + 2, 2, n1 + 2, 2, n2 + 2)
           for c in range(3)]
    sl2 = [_slope4_dimt(sgs[c], 2, 2, T + 2, 2, n2 + 2, 2, n1 + 2)
           for c in range(3)]

    # ---- phase 1: Riemann-resolved hat states into scratch ---------------
    # 0-faces: L from cell f-1 (normal speed un_L), R from cell f (un_R)
    unL = sg0[2:T + 3, 2:n1 + 4, 2:n2 + 4]
    unR = sg0[3:T + 4, 2:n1 + 4, 2:n2 + 4]
    cL = dtdx[0] * jnp.maximum(unL, 0.0)
    cR = dtdx[0] * jnp.minimum(unR, 0.0)

    def hat0(c):
        qL = sgs[c][2:T + 3, 2:n1 + 4, 2:n2 + 4]
        qR = sgs[c][3:T + 4, 2:n1 + 4, 2:n2 + 4]
        sL = sl0[c][0:T + 1, :, :]
        sR = sl0[c][1:T + 2, :, :]
        return (qL + 0.5 * (1.0 - cL) * sL, qR - 0.5 * (1.0 + cR) * sR)

    pL, pR = hat0(0)
    uadv = _rself(pL, pR)
    hv0[...] = uadv
    pL, pR = hat0(1)
    hq01[...] = _upw(pL, pR, uadv)
    pL, pR = hat0(2)
    hq02[...] = _upw(pL, pR, uadv)

    # 1-faces
    unL = sg1[2:T + 4, 2:n1 + 3, 2:n2 + 4]
    unR = sg1[2:T + 4, 3:n1 + 4, 2:n2 + 4]
    cL = dtdx[1] * jnp.maximum(unL, 0.0)
    cR = dtdx[1] * jnp.minimum(unR, 0.0)

    def hat1(c):
        qL = sgs[c][2:T + 4, 2:n1 + 3, 2:n2 + 4]
        qR = sgs[c][2:T + 4, 3:n1 + 4, 2:n2 + 4]
        sL = sl1[c][:, 0:n1 + 1, :]
        sR = sl1[c][:, 1:n1 + 2, :]
        return (qL + 0.5 * (1.0 - cL) * sL, qR - 0.5 * (1.0 + cR) * sR)

    pL, pR = hat1(1)
    uadv = _rself(pL, pR)
    hv1[...] = uadv
    pL, pR = hat1(0)
    hq10[...] = _upw(pL, pR, uadv)
    pL, pR = hat1(2)
    hq12[...] = _upw(pL, pR, uadv)

    # 2-faces
    unL = sg2[2:T + 4, 2:n1 + 4, 2:n2 + 3]
    unR = sg2[2:T + 4, 2:n1 + 4, 3:n2 + 4]
    cL = dtdx[2] * jnp.maximum(unL, 0.0)
    cR = dtdx[2] * jnp.minimum(unR, 0.0)

    def hat2(c):
        qL = sgs[c][2:T + 4, 2:n1 + 4, 2:n2 + 3]
        qR = sgs[c][2:T + 4, 2:n1 + 4, 3:n2 + 4]
        sL = sl2[c][:, :, 0:n2 + 1]
        sR = sl2[c][:, :, 1:n2 + 2]
        return (qL + 0.5 * (1.0 - cL) * sL, qR - 0.5 * (1.0 + cR) * sR)

    pL, pR = hat2(2)
    uadv = _rself(pL, pR)
    hv2[...] = uadv
    pL, pR = hat2(0)
    hq20[...] = _upw(pL, pR, uadv)
    pL, pR = hat2(1)
    hq21[...] = _upw(pL, pR, uadv)

    # ---- phase 2: full face states on real transverse cells --------------
    # d = 0: faces [g0, g0+T+1), store first T rows
    unL = sg0[2:T + 3, 3:n1 + 3, 3:n2 + 3]
    unR = sg0[3:T + 4, 3:n1 + 3, 3:n2 + 3]
    cL = dtdx[0] * jnp.maximum(unL, 0.0)
    cR = dtdx[0] * jnp.minimum(unR, 0.0)
    pL = unL + 0.5 * (1.0 - cL) * sl0[0][0:T + 1, 1:n1 + 1, 1:n2 + 1]
    pR = unR - 0.5 * (1.0 + cR) * sl0[0][1:T + 2, 1:n1 + 1, 1:n2 + 1]

    def corr0_all():
        """Transverse increments at ALL dim0 cells [g0-1, g0+T+1) (T+2
        rows), computed once; L/R slice overlapping T+1-row windows."""
        R = T + 2
        hq_lo = hq10[0:R, 0:n1, 1:n2 + 1]
        hq_hi = hq10[0:R, 1:n1 + 1, 1:n2 + 1]
        hv_lo = hv1[0:R, 0:n1, 1:n2 + 1]
        hv_hi = hv1[0:R, 1:n1 + 1, 1:n2 + 1]
        t = -0.5 * dtdx[1] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        hq_lo = hq20[0:R, 1:n1 + 1, 0:n2]
        hq_hi = hq20[0:R, 1:n1 + 1, 1:n2 + 1]
        hv_lo = hv2[0:R, 1:n1 + 1, 0:n2]
        hv_hi = hv2[0:R, 1:n1 + 1, 1:n2 + 1]
        t = t - 0.5 * dtdx[2] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        if has_force:
            t = t + 0.5 * dt * fg0[0:R, 1:n1 + 1, 1:n2 + 1]
        return t

    t0 = corr0_all()
    o0[...] = _rself(pL + t0[0:T + 1], pR + t0[1:T + 2])[0:T]

    # d = 1: faces [g1, g1+T1+1), store first T1 cols
    unL = sg1[3:T + 3, 2:n1 + 3, 3:n2 + 3]
    unR = sg1[3:T + 3, 3:n1 + 4, 3:n2 + 3]
    cL = dtdx[1] * jnp.maximum(unL, 0.0)
    cR = dtdx[1] * jnp.minimum(unR, 0.0)
    pL = unL + 0.5 * (1.0 - cL) * sl1[1][1:T + 1, 0:n1 + 1, 1:n2 + 1]
    pR = unR - 0.5 * (1.0 + cR) * sl1[1][1:T + 1, 1:n1 + 2, 1:n2 + 1]

    def corr1_all():
        C = n1 + 2
        hq_lo = hq01[0:T, 0:C, 1:n2 + 1]
        hq_hi = hq01[1:T + 1, 0:C, 1:n2 + 1]
        hv_lo = hv0[0:T, 0:C, 1:n2 + 1]
        hv_hi = hv0[1:T + 1, 0:C, 1:n2 + 1]
        t = -0.5 * dtdx[0] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        hq_lo = hq21[1:T + 1, 0:C, 0:n2]
        hq_hi = hq21[1:T + 1, 0:C, 1:n2 + 1]
        hv_lo = hv2[1:T + 1, 0:C, 0:n2]
        hv_hi = hv2[1:T + 1, 0:C, 1:n2 + 1]
        t = t - 0.5 * dtdx[2] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        if has_force:
            t = t + 0.5 * dt * fg1[1:T + 1, 0:C, 1:n2 + 1]
        return t

    t1 = corr1_all()
    o1[...] = _rself(pL + t1[:, 0:n1 + 1, :], pR + t1[:, 1:n1 + 2, :])[:, 0:n1]

    # d = 2: faces [0, n2+1), full extent
    unL = sg2[3:T + 3, 3:n1 + 3, 2:n2 + 3]
    unR = sg2[3:T + 3, 3:n1 + 3, 3:n2 + 4]
    cL = dtdx[2] * jnp.maximum(unL, 0.0)
    cR = dtdx[2] * jnp.minimum(unR, 0.0)
    pL = unL + 0.5 * (1.0 - cL) * sl2[2][1:T + 1, 1:n1 + 1, 0:n2 + 1]
    pR = unR - 0.5 * (1.0 + cR) * sl2[2][1:T + 1, 1:n1 + 1, 1:n2 + 2]

    def corr2_all():
        C = n2 + 2
        hq_lo = hq02[0:T, 1:n1 + 1, 0:C]
        hq_hi = hq02[1:T + 1, 1:n1 + 1, 0:C]
        hv_lo = hv0[0:T, 1:n1 + 1, 0:C]
        hv_hi = hv0[1:T + 1, 1:n1 + 1, 0:C]
        t = -0.5 * dtdx[0] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        hq_lo = hq12[1:T + 1, 0:n1, 0:C]
        hq_hi = hq12[1:T + 1, 1:n1 + 1, 0:C]
        hv_lo = hv1[1:T + 1, 0:n1, 0:C]
        hv_hi = hv1[1:T + 1, 1:n1 + 1, 0:C]
        t = t - 0.5 * dtdx[1] * 0.5 * (hv_lo + hv_hi) * (hq_hi - hq_lo)
        if has_force:
            t = t + 0.5 * dt * fg2[1:T + 1, 1:n1 + 1, 0:C]
        return t

    t2 = corr2_all()
    o2[...] = _rself(pL + t2[:, :, 0:n2 + 1], pR + t2[:, :, 1:n2 + 2])


def extrap_plm_fused(
    vel_g, force_g, dt, dx, ncell, interpret: bool = False,
):
    """Fused PLM ExtrapVelToFaces: one pallas_call computes all three MAC
    face-velocity arrays with the exact arithmetic of the XLA path
    (godunov.extrap_vel_to_faces before BC pinning) — 9 limited slope
    fields, 9 Riemann-resolved hat states, transverse corrections + forces,
    final Burgers Riemann. The XLA path materializes every hat/slope
    intermediate in HBM (profiled 37 ms at 256^3); here they live in
    VMEM scratch/values per (T x T1 x n2) tile.

    vel_g: (3, n+6, ...) velocity with 3 filled ghosts; force_g: (3,
    n+2, ...) with 1 ghost or None. Returns (u0, u1, u2) raw face arrays;
    the caller applies ext_dir/reflect_odd face pinning.
    """
    n0, n1, n2 = tuple(int(x) for x in ncell)
    dtype = vel_g.dtype
    import os

    T = _pick_t()
    T1 = _pick_t1(n1)
    nblk = (n0 + T - 1) // T
    if nblk * T == n0:
        nblk += 1           # cover face n0 in a block interior
    nblk1 = (n1 + T1 - 1) // T1
    if nblk1 * T1 == n1:
        nblk1 += 1          # cover face n1
    BS1 = T1 + 8

    def pad_to(x, d, need):
        if x.shape[d] >= need:
            return x
        pads = [(0, 0)] * 3
        pads[d] = (0, need - x.shape[d])
        return jnp.pad(x, pads, mode="edge")

    need0_sg = (nblk - 1) * T + T + 6
    need0_fg = (nblk - 1) * T + T + 2
    need1 = (nblk1 - 1) * T1 + BS1

    sgp = [pad_to(pad_to(vel_g[c], 0, need0_sg), 1, need1) for c in range(3)]
    has_force = force_g is not None
    if has_force:
        fgp = [pad_to(pad_to(force_g[c], 0, need0_fg), 1, need1)
               for c in range(3)]
    else:
        fgp = [jnp.zeros((1, 1, 1), dtype)] * 3

    kern = partial(
        _extrap_kernel, T=T, n1=T1, n2=n2,
        dx=tuple(float(h) for h in dx), has_force=has_force,
    )
    scal = jnp.asarray(dt, dtype).reshape(1, 1)

    def in_spec(rows, a):
        return pl.BlockSpec(
            (pl.Element(rows, (0, 0)), pl.Element(BS1, (0, 0)),
             pl.Element(a.shape[2], (0, 0))),
            lambda i, j: (i * T, j * T1, 0),
        )

    out_shapes = (
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct((nblk * T, nblk1 * T1, n2 + 1), dtype),
    )
    out_specs = tuple(
        pl.BlockSpec((T, T1) + s.shape[2:], lambda i, j: (i, j, 0))
        for s in out_shapes
    )
    scratch = [
        pltpu.VMEM((T + 1, T1 + 2, n2 + 2), dtype),
        pltpu.VMEM((T + 1, T1 + 2, n2 + 2), dtype),
        pltpu.VMEM((T + 1, T1 + 2, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 1, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 1, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 1, n2 + 2), dtype),
        pltpu.VMEM((T + 2, T1 + 2, n2 + 1), dtype),
        pltpu.VMEM((T + 2, T1 + 2, n2 + 1), dtype),
        pltpu.VMEM((T + 2, T1 + 2, n2 + 1), dtype),
    ]
    fspec = (in_spec(T + 2, fgp[0]) if has_force
             else pl.BlockSpec(memory_space=pltpu.VMEM))
    u0, u1, u2 = pl.pallas_call(
        kern,
        grid=(nblk, nblk1),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            in_spec(T + 6, sgp[0]),
            in_spec(T + 6, sgp[1]),
            in_spec(T + 6, sgp[2]),
            fspec, fspec, fspec,
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(scal, sgp[0], sgp[1], sgp[2], fgp[0], fgp[1], fgp[2])
    return (u0[:n0 + 1, :n1, :n2], u1[:n0, :n1 + 1, :n2], u2[:n0, :n1, :])
