"""Fused multi-pass Pallas smoothers for the MG hot loops (round-2 kernels).

Round-1 kernels (pallas_mg.py) fused ONE color/Jacobi pass each; a V-cycle
level still issued ~10 pallas calls, re-read every coefficient stream per
pass, and re-padded phi with a full-array concatenate per sweep. Profiling
the 256^3 HIT step showed ~6300 XLA kernels and 225 GB of HBM traffic per
step (~20x the algorithmic minimum) — the win is fewer, bigger kernels.

These kernels run a WHOLE smoother (nsweeps x (red+black) GSRB for the
cell op, nsweeps weighted-Jacobi for the nodal op) plus optionally the
following residual in ONE pallas_call.

Kernel style: ALL neighbor access is `pltpu.roll` + boundary `where` fixes
on full-block values — no padded scratch buffers and no per-pass offset
slices/plane writes (a first cut used those; Mosaic compile time exploded
to minutes per kernel, while roll-based bodies compile in seconds).
Periodic ghosts come free from the roll wrap; Dirichlet/Neumann ghosts are
algebraic combinations of the two interior planes, injected with
iota-selected `where`.

Two placements:
  * whole-array mode (small/mid levels): one program, everything resident
    in VMEM for all passes.
  * slab mode (128^3+ levels): overlapping slabs over dim 0 with halo
    width H = number of passes. Rolls wrap the BLOCK; each pass therefore
    contaminates one more halo row from each edge, and with H = P the slab
    interior after P passes is EXACTLY the sequential result (overlapped-
    halo redundant compute, ~(T+2H)/T extra). phi/rhs are padded once per
    call (wrap or zeros); coefficient streams once per call too.

Exactness: identical arithmetic to the XLA reference smoothers
(mg._smooth_rb / mg_nodal._jacobi) up to f32 reassociation; periodic face
coefficients must satisfy beta[0]==beta[n] (true for every production face
array — they are built from wrap ghosts).

Reference: the smoothers inside AMReX MLMG — GSRB for MLABecLaplacian
(Source/Diffusion.cpp:345-352, Source/MacProj.cpp:1150-1183) and Jacobi
for MLNodeLaplacian (Source/Projection.cpp:2512).
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# BC kinds (match ops.mg)
PERIODIC = 0
DIRICHLET = 1
NEUMANN = 2

# nodal BC kinds (match ops.mg_nodal)
N_PERIODIC = 0
N_NEUMANN = 1
N_DIRICHLET = 2

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
# the sr nodal kernel's double-buffered windows brush against the 128M
# chip VMEM; give it (only) the near-full budget
_SR_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)

_T = 16  # slab tile rows (multiple of the f32 sublane tiling, 8)

# whole-array VMEM budget: ~10 resident full-size values
_WHOLE_LIMIT = 48 * 1024 * 1024
_SLAB_LIMIT = 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# mode selection


def _slab_T(shape, streams, H, n_out, allow_pad=False, work_rows=4,
            out_mult=1):
    """Largest slab tile whose VMEM footprint fits: double-buffered input
    blocks + outputs + work_rows row-blocks of compute temporaries
    (calibrated against XLA's scoped-vmem reports at 256^3: the cell GSRB
    core holds ~4 live blocks, the 27-corner nodal FEM core ~9 with
    triple-buffered outputs). allow_pad: the caller end-pads dim 0 to a
    multiple of T (node arrays); the wrap halo + end pad must then still
    fit inside one period (extra + H + 1 <= n0 - 1)."""
    layer = (shape[1] + 2) * (shape[2] + 2) * 4
    for T in (32, 16, 8):
        if allow_pad:
            extra = (-shape[0]) % T
            if H + extra + 1 > shape[0] - 1:
                continue
        elif shape[0] % T != 0 and shape[0] > T:
            continue
        rows = T + 2 * H
        est = layer * (
            2 * streams * (rows + 1) + out_mult * n_out * T + work_rows * rows
        )
        if est <= _SLAB_LIMIT:
            return T
    return None


def cell_mode(shape, dtype, has_alpha, want_resid, nsweeps) -> Optional[str]:
    if jnp.dtype(dtype) != jnp.float32:
        return None
    nbytes = int(np.prod(shape)) * 4
    if nbytes * 10 <= _WHOLE_LIMIT:
        return "whole"
    if len(shape) != 3:
        return None
    H = 2 * nsweeps + (1 if want_resid else 0)
    streams = 6 + (1 if has_alpha else 0)
    T = _slab_T(shape, streams, H, 2 if want_resid else 1)
    return "slab" if T is not None else None


# the ROLL-BASED fused nodal modes ("whole"/"slab") are disabled for
# production: Mosaic CSE hoists all 27 unique shifted-phi blocks of the
# roll-based FEM stencil into vector registers and spills 100-200MB of
# VMEM (tested at 65^3 whole AND 256^3 slab, with three source-level
# formulations: incremental view tree, flat recompute, fori_loop sweeps).
# Production uses the scratch-ref "sr" kernel (nodal_smooth_sr): ref
# slicing rematerializes VMEM loads instead of pinning register values.
_NODAL_FUSED_OK = False


def nodal_mode(nshape, dtype, want_resid, nsweeps) -> Optional[str]:
    if jnp.dtype(dtype) != jnp.float32:
        return None
    # the 2D-tiled scratch-ref kernel ("sr") compiles and is exact, but
    # measures SLOWER than the single-pass pallas_mg path on v5e (14.0 vs
    # 11.2 ms for a 2-sweep+residual smoother at 257^3): the (22/16)^2 halo
    # redundancy and 289 small grid programs outweigh the launch savings,
    # and the 27-point FEM arithmetic is near the VPU roofline either way.
    # Gate it off; IAMR_NODAL_SR=1 re-enables for experiments.
    import os

    if os.environ.get("IAMR_NODAL_SR", "") == "1" and (
        len(nshape) == 3
        and nshape[0] >= 17
        and nshape[1] >= 17
        and nshape[2] >= 16
    ):
        return "sr"
    if not _NODAL_FUSED_OK:
        return None
    nbytes = int(np.prod(nshape)) * 4
    if nbytes * 16 <= _WHOLE_LIMIT:
        return "whole"
    if len(nshape) != 3:
        return None
    H = nsweeps + (1 if want_resid else 0)
    T = _slab_T(nshape, 3, H, 2 if want_resid else 1, allow_pad=True,
                work_rows=9, out_mult=3)
    return "slab" if T is not None else None


# ---------------------------------------------------------------------------
# in-kernel helpers (value-based, roll + where only)


def _roll(c, shift, axis):
    return pltpu.roll(c, shift % c.shape[axis], axis=axis)


def _pos(shape, d, offset=0):
    return jax.lax.broadcasted_iota(jnp.int32, shape, d) + offset


def _neighbors(c, d, kind_lo, kind_hi, pos=None, last=None):
    """(dn, up): dn[i]=c[i-1], up[i]=c[i+1] along d with homogeneous BC
    ghost fixes. pos/last: index array + last index (None -> pure wrap,
    slab interior or periodic)."""
    up = _roll(c, -1, d)
    dn = _roll(c, 1, d)
    if pos is None:
        return dn, up
    # a PERIODIC kind on a dim treated non-periodically (mismatched pair)
    # degrades to a copy ghost, matching mg._pad_phi's else-branch
    if kind_lo == DIRICHLET:
        dn = jnp.where(pos == 0, -2.0 * c + (1.0 / 3.0) * up, dn)
    else:
        dn = jnp.where(pos == 0, c, dn)
    if kind_hi == DIRICHLET:
        up = jnp.where(pos == last, -2.0 * c + (1.0 / 3.0) * dn, up)
    else:
        up = jnp.where(pos == last, c, up)
    return dn, up


def _parity(shape, offset0=0):
    p = None
    for d in range(len(shape)):
        it = jax.lax.broadcasted_iota(jnp.int32, shape, d)
        p = it if p is None else p + it
    return ((p + offset0) % 2) == 0


# ---------------------------------------------------------------------------
# cell-centered ABecLaplacian fused GSRB kernel (whole + slab share a core)


def _cell_core(
    scal_ref, phi_ref, rhs_ref, alpha_ref, brefs, out_ref, res_ref,
    *, shape, bc_lo, bc_hi, inv_dx2, nsweeps, want_resid, has_alpha,
    slab=None,
):
    """slab: None (whole) or dict(T, H, n0, per0, i) for slab mode."""
    dim = len(shape)
    a = scal_ref[0, 0]
    b = scal_ref[0, 1]
    c = phi_ref[...]
    rhs = rhs_ref[...]

    # face views sliced per use (keeps the live VMEM set small; the input
    # blocks themselves stay resident)
    def bl(d):
        idx = [slice(None)] * dim
        idx[d] = slice(0, shape[d])
        return brefs[d][tuple(idx)]

    def bh(d):
        idx = [slice(None)] * dim
        idx[d] = slice(1, shape[d] + 1)
        return brefs[d][tuple(idx)]

    # per-dim boundary descriptors
    pos, last = [], []
    for d in range(dim):
        if slab is not None and d == 0:
            if slab["per0"]:
                pos.append(None)
                last.append(None)
            else:
                grow = slab["g0"] + _pos(shape, 0)
                pos.append(grow)
                last.append(slab["n0"] - 1)
        elif bc_lo[d] == PERIODIC:
            pos.append(None)
            last.append(None)
        else:
            pos.append(_pos(shape, d))
            last.append(shape[d] - 1)

    # diagonal with boundary-modified coefficients (mg._diag)
    bsum = None
    for d in range(dim):
        t_lo, t_hi = bl(d), bh(d)
        if pos[d] is not None:
            fl = 3.0 if bc_lo[d] == DIRICHLET else (0.0 if bc_lo[d] == NEUMANN else 1.0)
            fh = 3.0 if bc_hi[d] == DIRICHLET else (0.0 if bc_hi[d] == NEUMANN else 1.0)
            if fl != 1.0:
                t_lo = jnp.where(pos[d] == 0, fl * t_lo, t_lo)
            if fh != 1.0:
                t_hi = jnp.where(pos[d] == last[d], fh * t_hi, t_hi)
        term = (t_lo + t_hi) * inv_dx2[d]
        bsum = term if bsum is None else bsum + term
    aalpha = a * alpha_ref[...] if has_alpha else None
    diag = (aalpha + b * bsum) if has_alpha else b * bsum
    diag = jnp.where(diag != 0.0, diag, 1.0)

    par_off = slab["H"] if slab is not None else 0
    red = _parity(shape, par_off)
    if slab is not None and not slab["per0"]:
        grow = pos[0]
        ok = jnp.logical_and(grow >= 0, grow < slab["n0"])
    else:
        ok = None

    def residual(c):
        lap = None
        for d in range(dim):
            dn, up = _neighbors(c, d, bc_lo[d], bc_hi[d], pos[d], last[d])
            t = (bh(d) * (up - c) - bl(d) * (c - dn)) * inv_dx2[d]
            lap = t if lap is None else lap + t
        r = rhs + b * lap
        if has_alpha:
            r = r - aalpha * c
        return r

    for p in range(2 * nsweeps):
        r = residual(c)
        mask = red if p % 2 == 0 else jnp.logical_not(red)
        if ok is not None:
            mask = jnp.logical_and(mask, ok)
        c = jnp.where(mask, c + r / diag, c)

    if slab is None:
        out_ref[...] = c
        if want_resid:
            res_ref[...] = residual(c)
    else:
        H, T = slab["H"], slab["T"]
        out_ref[...] = c[H : H + T]
        if want_resid:
            res_ref[...] = residual(c)[H : H + T]


def _cell_whole_kernel(scal_ref, phi_ref, rhs_ref, alpha_ref, *rest, **kw):
    dim = len(kw["shape"])
    brefs = rest[:dim]
    out_ref, res_ref = rest[dim], rest[dim + 1]
    _cell_core(scal_ref, phi_ref, rhs_ref, alpha_ref, brefs, out_ref,
               res_ref, slab=None, **kw)


def _cell_slab_kernel(scal_ref, phi_ref, rhs_ref, alpha_ref, bx, by, bz,
                      out_ref, res_ref, *, T, H, n0, per0, **kw):
    i = pl.program_id(0)
    slab = dict(T=T, H=H, n0=n0, per0=per0, g0=i * T - H)
    _cell_core(scal_ref, phi_ref, rhs_ref, alpha_ref, (bx, by, bz),
               out_ref, res_ref, slab=slab, **kw)


# ---------------------------------------------------------------------------
# drivers


def pad0_cell(x, H, wrap):
    if H == 0:
        return x
    if wrap:
        return jnp.concatenate([x[-H:], x, x[:H]], axis=0)
    return jnp.pad(x, [(H, H)] + [(0, 0)] * (x.ndim - 1))


def pad0_face0(x, H, wrap):
    """Pad a dim-0 FACE array (n0+1 entries; face[0]==face[n0] when
    periodic-consistent) by H faces per side."""
    if H == 0:
        return x
    if wrap:
        return jnp.concatenate([x[-H - 1 : -1], x, x[1 : H + 1]], axis=0)
    return jnp.pad(x, [(H, H)] + [(0, 0)] * (x.ndim - 1))


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _row_spec(T, nr, m1, m2):
    return pl.BlockSpec(
        (pl.Element(nr, (0, 0)), pl.Element(m1, (0, 0)), pl.Element(m2, (0, 0))),
        lambda i: (i * T, 0, 0),
    )


def cell_smooth_fused(
    phi, rhs, alpha, beta, a, b, dx, bc_lo, bc_hi,
    nsweeps: int, want_resid: bool, interpret: bool = False,
    mode: Optional[str] = None,
):
    """nsweeps red-black GS sweeps (+ optional residual) in one pallas_call.

    Reproduces mg._smooth_rb / mg._residual arithmetic; alpha is None when
    a == 0 (stream skipped). Returns (phi_new, resid-or-None)."""
    dim = phi.ndim
    shape = tuple(phi.shape)
    dtype = phi.dtype
    inv_dx2 = tuple(float(1.0 / (h * h)) for h in dx)
    has_alpha = alpha is not None
    if mode is None:
        mode = cell_mode(shape, dtype, has_alpha, want_resid, nsweeps)
    assert mode in ("whole", "slab")
    scal = jnp.stack([jnp.asarray(a, dtype), jnp.asarray(b, dtype)]).reshape(1, 2)
    dummy = jnp.zeros((1,) * dim, dtype)

    if mode == "whole":
        kern = partial(
            _cell_whole_kernel, shape=shape, bc_lo=tuple(bc_lo),
            bc_hi=tuple(bc_hi), inv_dx2=inv_dx2, nsweeps=nsweeps,
            want_resid=want_resid, has_alpha=has_alpha,
        )
        out_shapes = (
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(shape if want_resid else (1,) * dim, dtype),
        )
        phi_out, res = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [_vmem_spec()] * (3 + dim),
            out_specs=(_vmem_spec(), _vmem_spec()),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(scal, phi, rhs, alpha if has_alpha else dummy, *beta)
        return phi_out, (res if want_resid else None)

    # slab mode (3D)
    H = 2 * nsweeps + (1 if want_resid else 0)
    T = _slab_T(shape, 6 + (1 if has_alpha else 0), H, 2 if want_resid else 1)
    n0, n1, n2 = shape
    per0 = bc_lo[0] == PERIODIC
    phip = pad0_cell(phi, H, per0)
    rhsp = pad0_cell(rhs, H, per0)
    alphap = pad0_cell(alpha, H, per0) if has_alpha else dummy
    betap = (
        pad0_face0(beta[0], H, per0),
        pad0_cell(beta[1], H, per0),
        pad0_cell(beta[2], H, per0),
    )
    rows = T + 2 * H
    kern = partial(
        _cell_slab_kernel, T=T, H=H, n0=n0, per0=per0,
        shape=(rows, n1, n2), bc_lo=tuple(bc_lo), bc_hi=tuple(bc_hi),
        inv_dx2=inv_dx2, nsweeps=nsweeps, want_resid=want_resid,
        has_alpha=has_alpha,
    )
    out_shapes = (
        jax.ShapeDtypeStruct(shape, dtype),
        jax.ShapeDtypeStruct(shape if want_resid else (1, 1, 1), dtype),
    )
    phi_out, res = pl.pallas_call(
        kern,
        grid=(n0 // T,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(T, rows, n1, n2),
            _row_spec(T, rows, n1, n2),
            (_row_spec(T, rows, n1, n2) if has_alpha else _vmem_spec()),
            _row_spec(T, rows + 1, n1, n2),
            _row_spec(T, rows, n1 + 1, n2),
            _row_spec(T, rows, n1, n2 + 1),
        ],
        out_specs=(
            pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (T, n1, n2) if want_resid else (1, 1, 1),
                (lambda i: (i, 0, 0)) if want_resid else (lambda i: (0, 0, 0)),
            ),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(scal, phip, rhsp, alphap, *betap)
    return phi_out, (res if want_resid else None)


# ===========================================================================
# FEM nodal Laplacian: fused multi-sweep weighted-Jacobi kernel
#
#   L(phi)_n = -(1/V) sum_t sigma(n-1+t) sum_b K[1-t,b] phi(n-1+t+b)
#   pass: phi += omega * mask * (rhs - L) / diag,
#   diag = -kap * (sum of 2^dim adjacent sigma), pinned to -kap where 0.
#
# Ghost conventions (mg_nodal._pad_nodes): periodic dims wrap with the
# duplicated-DOF convention (ghost left of node 0 is node nn-2, right of
# node nn-1 is node 1); non-periodic ghosts are zero AND their sigma
# weights vanish, implemented by zero-padding the sigma stream.


def _node_shift(c, d, o, kind_lo, per):
    """phi shifted so result[i] = phi[i+o] along d, with nodal BC fix.

    per: periodic -> duplicated-DOF wrap fix at the edges; else zeros at
    the nonexistent-neighbor edge. Pure block wrap when kind_lo is None
    (slab dim 0 — halo discipline handles edges)."""
    nn = c.shape[d]
    s = _roll(c, -o, d)
    if kind_lo is None:
        return s
    pos = _pos(c.shape, d)
    if per:
        if o == 1:
            # neighbor right of nn-1 is node 1 = c[(nn-1)+2]
            s = jnp.where(pos == nn - 1, _roll(c, -2, d), s)
        elif o == -1:
            s = jnp.where(pos == 0, _roll(c, 2, d), s)
    else:
        if o == 1:
            s = jnp.where(pos == nn - 1, 0.0, s)
        elif o == -1:
            s = jnp.where(pos == 0, 0.0, s)
    return s


def _nodal_core(
    phi_ref, sigp_ref, rhs_ref, out_ref, res_ref,
    *, shape, bc_lo, bc_hi, K, inv_vol, kap, omega, nsweeps, want_resid,
    slab=None,
):
    dim = len(shape)
    c = phi_ref[...]
    rhs = rhs_ref[...]
    corners = list(itertools.product((0, 1), repeat=dim))

    # sigma views sliced per use (padded stream: sigp[i] = cell i-1, so
    # sig_t[i] = cell i-1+t); the input block stays VMEM-resident, the
    # transient view keeps the live set small
    def sig(t):
        idx = tuple(slice(t[d], t[d] + shape[d]) for d in range(dim))
        return sigp_ref[idx]

    adj = None
    for t in corners:
        adj = sig(t) if adj is None else adj + sig(t)
    dg = -adj * kap
    diag = jnp.where(dg == 0.0, -kap, dg)

    # Dirichlet mask / slab validity
    ok = None
    for d in range(dim):
        slab0 = slab is not None and d == 0
        if slab0:
            if slab["per0"]:
                continue
            pos = slab["g0"] + _pos(shape, 0)
            valid = jnp.logical_and(pos >= 0, pos < slab["nn0"])
            ok = valid if ok is None else jnp.logical_and(ok, valid)
            last = slab["nn0"] - 1
        else:
            pos = _pos(shape, d)
            last = shape[d] - 1
        if bc_lo[d] == N_DIRICHLET:
            m = pos != 0
            ok = m if ok is None else jnp.logical_and(ok, m)
        if bc_hi[d] == N_DIRICHLET:
            m = pos != last
            ok = m if ok is None else jnp.logical_and(ok, m)

    def shift1(v, d, o):
        """v shifted so result[i] = v[i+o] along d, with nodal BC fixes."""
        if o == 0:
            return v
        kind = None if (slab is not None and d == 0) else bc_lo[d]
        per = bc_lo[d] == N_PERIODIC
        return _node_shift(v, d, o, kind, per)

    def residual(c):
        # flat 4^dim-term evaluation with every shifted value recomputed on
        # the fly: the live set stays ~4 blocks (an incremental-view-tree
        # variant kept ~30 blocks live and drove Mosaic's register
        # allocator into ~100MB of VMEM spill slots at 256^3)
        L = None
        for t in corners:
            st = sig(t)
            a_t = tuple(1 - td for td in t)
            acc = None
            for bb in corners:
                v = c
                for d in range(dim):
                    v = shift1(v, d, t[d] + bb[d] - 1)
                term = K[(a_t, bb)] * v
                acc = term if acc is None else acc + term
            contrib = st * acc
            L = contrib if L is None else L + contrib
        return rhs + inv_vol * L  # rhs - (-(1/V) assemble)

    # rolled sweep loop: the 27-corner FEM body is large; unrolling
    # nsweeps copies blows Mosaic's register allocator into ~100MB of
    # VMEM spill slots at 256^3 (fori_loop keeps ONE body instance)
    def _sweep(_, c):
        r = residual(c)
        upd = c + omega * r / diag
        if ok is not None:
            upd = jnp.where(ok, upd, c)
        return upd

    if nsweeps > 0:
        c = jax.lax.fori_loop(0, nsweeps, _sweep, c)

    if slab is None:
        out_ref[...] = c
        if want_resid:
            r = residual(c)
            if ok is not None:
                r = jnp.where(ok, r, 0.0)
            res_ref[...] = r
    else:
        H, T = slab["H"], slab["T"]
        out_ref[...] = c[H : H + T]
        if want_resid:
            r = residual(c)
            if ok is not None:
                r = jnp.where(ok, r, 0.0)
            res_ref[...] = r[H : H + T]


def _nodal_whole_kernel(phi_ref, sigp_ref, rhs_ref, out_ref, res_ref, **kw):
    _nodal_core(phi_ref, sigp_ref, rhs_ref, out_ref, res_ref, slab=None, **kw)


def _nodal_slab_kernel(phi_ref, sigp_ref, rhs_ref, out_ref, res_ref,
                       *, T, H, nn0, per0, **kw):
    i = pl.program_id(0)
    slab = dict(T=T, H=H, nn0=nn0, per0=per0, g0=i * T - H)
    _nodal_core(phi_ref, sigp_ref, rhs_ref, out_ref, res_ref, slab=slab, **kw)


# ===========================================================================
# nodal fused smoother, scratch-ref style ("sr"): the production 3D path.
#
# All neighbor access is REF SLICING against a VMEM scratch block (the
# pallas_mg style) — Mosaic rematerializes VMEM loads instead of pinning 27
# shifted blocks in vector registers, so this does NOT spill where the
# roll-based kernels above do. One pallas_call runs nsweeps Jacobi passes
# (fori_loop, interior written back to the scratch, periodic transverse
# ghosts refreshed in-block) plus the optional trailing masked residual.
# Slab halo discipline over dim 0: H = nsweeps + want_resid.


def _nodal_sr_kernel(
    phip_ref, sigp_ref, rhs_ref, upd_ref, msk_ref, out_ref, res_ref, scr,
    *, T0, T1, H, n2, K, inv_vol, nsweeps, want_resid, per2,
):
    """One 2D tile: output nodes rows [i*T0, i*T0+T0) x [j*T1, j*T1+T1).

    Local conventions (r0 = row - i*T0 + H + 1 etc.):
      phip/sigp blocks: (rows0+2, BS1, n2+2) with rows0 = T0+2H; dim1 uses
      the same H+1 halo inside a BS1-sized (8-aligned) block window.
      rhs/upd/msk blocks: (rows0, BS1, n2) with dim1 halo H+1 inside BS1.
    Scratch: the evolving phi tile incl. ghost ring; dims 0/1 rely on halo
    discipline (H = nsweeps + want_resid), dim 2 ghosts are refreshed each
    sweep when periodic (duplicated-DOF wrap).
    """
    rows0 = T0 + 2 * H
    rows1 = T1 + 2 * H
    corners = list(itertools.product((0, 1), repeat=3))
    scr[...] = phip_ref[0:rows0 + 2, 0:rows1 + 2, :]

    def sl_phi(off):
        return scr[off[0]:off[0] + rows0, off[1]:off[1] + rows1,
                   off[2]:off[2] + n2]

    def sl_sig(t):
        return sigp_ref[t[0]:t[0] + rows0, t[1]:t[1] + rows1,
                        t[2]:t[2] + n2]

    def resid():
        L = None
        for t in corners:
            a = tuple(1 - td for td in t)
            acc = None
            for bb in corners:
                w = K[(a, bb)]
                off = (t[0] + bb[0], t[1] + bb[1], t[2] + bb[2])
                term = w * sl_phi(off)
                acc = term if acc is None else acc + term
            contrib = sl_sig(t) * acc
            L = contrib if L is None else L + contrib
        return rhs_ref[0:rows0, 1:rows1 + 1, :] + inv_vol * L

    def body(_, carry):
        r = resid()
        scr[1:rows0 + 1, 1:rows1 + 1, 1:n2 + 1] = (
            sl_phi((1, 1, 1)) + upd_ref[0:rows0, 1:rows1 + 1, :] * r
        )
        if per2:
            # duplicated-DOF wrap: ghost left of node 0 = node nn-2 etc.
            scr[:, :, 0] = scr[:, :, n2 - 1]
            scr[:, :, n2 + 1] = scr[:, :, 2]
        return carry

    if nsweeps > 0:
        jax.lax.fori_loop(0, nsweeps, body, 0)
    out_ref[...] = scr[H + 1:H + 1 + T0, H + 1:H + 1 + T1, 1:n2 + 1]
    if want_resid:
        r = msk_ref[0:rows0, 1:rows1 + 1, :] * resid()
        res_ref[...] = r[H:H + T0, H:H + T1]


def nodal_smooth_sr(
    phi, sigma, rhs, upd, msk, dx, bc_lo, nsweeps: int, want_resid: bool,
    interpret: bool = False,
):
    """nsweeps nodal Jacobi sweeps (+ optional masked residual) in ONE
    pallas_call, scratch-ref style with a 2D (dim0 x dim1) tile grid.

    upd: omega * mask / diag (the per-node update factor); msk: the
    Dirichlet mask for the residual. Matches mg_nodal._jacobi /
    _nodal_residual arithmetic. Periodic dims wrap (duplicated-DOF);
    non-periodic ghosts are zero with zero sigma weight."""
    from iamr_tpu.ops.mg_nodal import _fem_element_matrix

    nshape = tuple(phi.shape)
    nn0, nn1, n2 = nshape
    dtype = phi.dtype
    K = _fem_element_matrix(dx)
    vol = 1.0
    for h in dx:
        vol *= h
    inv_vol = float(1.0 / vol)
    H = nsweeps + (1 if want_resid else 0)
    # tile choice: Mosaic materializes all 27 shifted neighbor values of
    # the FEM stencil, so the tile must keep ~50 value-sized buffers under
    # the VMEM budget; 16^2 x n2 tiles measure ~40M at 256^3 (32^2 hit 118M)
    T0 = 16 if nn0 >= 64 else 8
    T1 = 16 if nn1 >= 64 else 8
    rows1 = T1 + 2 * H
    # dim1 block sizes must be 8-divisible (Mosaic second-minor tiling)
    BS1 = ((rows1 + 2 + 7) // 8) * 8
    per = tuple(bc_lo[d] == N_PERIODIC for d in range(3))

    nblk0 = (nn0 + T0 - 1) // T0
    nblk1 = (nn1 + T1 - 1) // T1
    ex0 = nblk0 * T0 - nn0
    ex1 = nblk1 * T1 - nn1

    def pad_nodes(x, d, lo, hi, wrap):
        """Node-array pad along d: duplicated-DOF wrap or zeros."""
        if wrap:
            n = x.shape[d]
            a = jax.lax.slice_in_dim(x, n - 1 - lo, n - 1, axis=d)
            b = jax.lax.slice_in_dim(x, 1, 1 + hi, axis=d)
            return jnp.concatenate([a, x, b], axis=d)
        pads = [(0, 0)] * x.ndim
        pads[d] = (lo, hi)
        return jnp.pad(x, pads)

    # phi: dim2 ghost ring (wrap or zeros), dims 0/1 halo H+1 (+ block pad)
    if per[2]:
        lo2 = phi[:, :, n2 - 2:n2 - 1]
        hi2 = phi[:, :, 1:2]
    else:
        lo2 = jnp.zeros(phi.shape[:2] + (1,), dtype)
        hi2 = lo2
    phit = jnp.concatenate([lo2, phi, hi2], axis=2)
    phip = pad_nodes(phit, 0, H + 1, H + 1 + ex0, per[0])
    # dim1: lo H+1; hi sized so the last block window (offset j*T1, size
    # BS1) fits: need len >= (nblk1-1)*T1 + BS1
    hi1 = (nblk1 - 1) * T1 + BS1 - (nn1 + H + 1)
    phip = pad_nodes(phip, 1, H + 1, hi1, per[1])

    # sigma: cells; dim2 pad 1 per side (wrap/zeros); dims 0/1 aligned so
    # sig[p] = cell (p - H - 1)
    sigt = _sig_padded(sigma, bc_lo, dims=(2,))
    nc0, nc1 = sigma.shape[0], sigma.shape[1]

    def pad_cells(x, d, lo, hi, wrap, nc):
        if wrap:
            a = jax.lax.slice_in_dim(x, nc - lo, nc, axis=d)
            b = jax.lax.slice_in_dim(x, 0, hi, axis=d)
            return jnp.concatenate([a, x, b], axis=d)
        pads = [(0, 0)] * x.ndim
        pads[d] = (lo, hi)
        return jnp.pad(x, pads)

    sigp = pad_cells(sigt, 0, H + 1, H + 1 + ex0 + 1, per[0], nc0)
    sig_hi1 = (nblk1 - 1) * T1 + BS1 - (nc1 + H + 1)
    sigp = pad_cells(sigp, 1, H + 1, sig_hi1, per[1], nc1)

    # rhs/upd/msk: dims 0 pad H; dim 1 pad H+1 inside BS1-style windows
    def pad_rum(x):
        x = pad_nodes(x, 0, H, H + ex0, per[0])
        hi = (nblk1 - 1) * T1 + BS1 - (nn1 + H + 1)
        return pad_nodes(x, 1, H + 1, hi, per[1])

    rhsp = pad_rum(rhs)
    updp = pad_rum(upd)
    mskp = pad_rum(msk)

    rows0 = T0 + 2 * H
    kern = partial(
        _nodal_sr_kernel, T0=T0, T1=T1, H=H, n2=n2, K=K, inv_vol=inv_vol,
        nsweeps=nsweeps, want_resid=want_resid, per2=per[2],
    )

    def spec(r0, c1, a):
        return pl.BlockSpec(
            (pl.Element(r0, (0, 0)), pl.Element(c1, (0, 0)),
             pl.Element(a.shape[2], (0, 0))),
            lambda i, j: (i * T0, j * T1, 0),
        )

    out_shapes = (
        jax.ShapeDtypeStruct((nblk0 * T0, nblk1 * T1, n2), dtype),
        jax.ShapeDtypeStruct(
            (nblk0 * T0, nblk1 * T1, n2) if want_resid else (1, 1, 1), dtype
        ),
    )
    phi_out, res = pl.pallas_call(
        kern,
        grid=(nblk0, nblk1),
        out_shape=out_shapes,
        in_specs=[
            spec(rows0 + 2, BS1, phip),
            spec(rows0 + 1, BS1, sigp),
            spec(rows0, BS1, rhsp),
            spec(rows0, BS1, updp),
            spec(rows0, BS1, mskp),
        ],
        out_specs=(
            pl.BlockSpec((T0, T1, n2), lambda i, j: (i, j, 0)),
            pl.BlockSpec(
                (T0, T1, n2) if want_resid else (1, 1, 1),
                (lambda i, j: (i, j, 0)) if want_resid
                else (lambda i, j: (0, 0, 0)),
            ),
        ),
        scratch_shapes=[pltpu.VMEM((rows0 + 2, rows1 + 2, n2 + 2), dtype)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(phip, sigp, rhsp, updp, mskp)
    phi_out = phi_out[:nn0, :nn1]
    if want_resid:
        return phi_out, res[:nn0, :nn1]
    return phi_out, None


def _sig_padded(sigma, bc_lo, dims=None):
    """Cells padded by 1 per side (wrap or zeros), per mg_nodal._pad_cells."""
    dim = sigma.ndim
    out = sigma
    for d in dims if dims is not None else range(dim):
        if bc_lo[d] == N_PERIODIC:
            lo = jax.lax.slice_in_dim(out, out.shape[d] - 1, out.shape[d], axis=d)
            hi = jax.lax.slice_in_dim(out, 0, 1, axis=d)
        else:
            shp = list(out.shape)
            shp[d] = 1
            lo = jnp.zeros(shp, sigma.dtype)
            hi = jnp.zeros(shp, sigma.dtype)
        out = jnp.concatenate([lo, out, hi], axis=d)
    return out


def _pad0_node(x, H, wrap, extra_hi=0):
    """Pad a NODE array along dim 0 (duplicated-DOF wrap or zeros)."""
    if H == 0 and extra_hi == 0:
        return x
    if wrap:
        nn = x.shape[0]
        return jnp.concatenate(
            [x[nn - 1 - H : nn - 1], x, x[1 : 1 + H + extra_hi]], axis=0
        )
    return jnp.pad(x, [(H, H + extra_hi)] + [(0, 0)] * (x.ndim - 1))


def nodal_smooth_fused(
    phi, sigma, rhs, dx, bc_lo, bc_hi, omega: float,
    nsweeps: int, want_resid: bool, interpret: bool = False,
    mode: Optional[str] = None,
):
    """nsweeps weighted-Jacobi sweeps (+ optional masked residual) in one
    pallas_call; matches mg_nodal._jacobi / _nodal_residual arithmetic.
    Returns (phi_new, resid-or-None)."""
    from iamr_tpu.ops.mg_nodal import _fem_element_matrix

    dim = phi.ndim
    nshape = tuple(phi.shape)
    dtype = phi.dtype
    if mode is None:
        mode = nodal_mode(nshape, dtype, want_resid, nsweeps)
    assert mode in ("whole", "slab")
    K = _fem_element_matrix(dx)
    vol = 1.0
    for h in dx:
        vol *= h
    inv_vol = float(1.0 / vol)
    kap = float(sum(1.0 / (3 ** (dim - 1) * dx[d] ** 2) for d in range(dim)))

    if mode == "whole":
        sigp = _sig_padded(sigma, bc_lo)
        kern = partial(
            _nodal_whole_kernel, shape=nshape, bc_lo=tuple(bc_lo),
            bc_hi=tuple(bc_hi), K=K, inv_vol=inv_vol, kap=kap,
            omega=float(omega), nsweeps=nsweeps, want_resid=want_resid,
        )
        out_shapes = (
            jax.ShapeDtypeStruct(nshape, dtype),
            jax.ShapeDtypeStruct(nshape if want_resid else (1,) * dim, dtype),
        )
        phi_out, res = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            in_specs=[_vmem_spec()] * 3,
            out_specs=(_vmem_spec(), _vmem_spec()),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(phi, sigp, rhs)
        return phi_out, (res if want_resid else None)

    # slab mode (3D)
    H = nsweeps + (1 if want_resid else 0)
    T = _slab_T(nshape, 3, H, 2 if want_resid else 1, allow_pad=True,
                work_rows=9, out_mult=3)
    nn0, n1, n2 = nshape
    per0 = bc_lo[0] == N_PERIODIC
    nn0p = ((nn0 + T - 1) // T) * T
    extra = nn0p - nn0
    if per0:
        assert H + extra + 1 <= nn0 - 1, "slab wrap needs nn0 > H + pad"
    phip = _pad0_node(phi, H, per0, extra)
    rhsp = _pad0_node(rhs, H, per0, extra)
    # sigma stream: transverse pad by 1 (wrap/zeros), dim0 pad so that
    # sigp_block[r] = cell (g0-1+r): lo pad H+1 cells, hi pad H+extra+1
    sigt = _sig_padded(sigma, bc_lo, dims=(1, 2))
    nc = sigma.shape[0]
    if per0:
        sig0 = jnp.concatenate(
            [sigt[nc - H - 1 :], sigt, sigt[: H + extra + 1]], axis=0
        )
    else:
        sig0 = jnp.pad(sigt, [(H + 1, H + extra + 1)] + [(0, 0)] * 2)
    rows = T + 2 * H
    kern = partial(
        _nodal_slab_kernel, T=T, H=H, nn0=nn0, per0=per0,
        shape=(rows, n1, n2), bc_lo=tuple(bc_lo), bc_hi=tuple(bc_hi),
        K=K, inv_vol=inv_vol, kap=kap, omega=float(omega),
        nsweeps=nsweeps, want_resid=want_resid,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((nn0p, n1, n2), dtype),
        jax.ShapeDtypeStruct((nn0p, n1, n2) if want_resid else (1, 1, 1), dtype),
    )
    phi_out, res = pl.pallas_call(
        kern,
        grid=(nn0p // T,),
        out_shape=out_shapes,
        in_specs=[
            _row_spec(T, rows, n1, n2),
            _row_spec(T, rows + 1, n1 + 1, n2 + 1),
            _row_spec(T, rows, n1, n2),
        ],
        out_specs=(
            pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (T, n1, n2) if want_resid else (1, 1, 1),
                (lambda i: (i, 0, 0)) if want_resid else (lambda i: (0, 0, 0)),
            ),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(phip, sig0, rhsp)
    phi_out = phi_out[:nn0]
    if want_resid:
        return phi_out, res[:nn0]
    return phi_out, None
