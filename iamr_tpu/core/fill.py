"""Ghost-cell fill machinery (the FillPatch/BC-fill equivalent, single level).

The reference fills ghost cells via FillPatchIterator + per-variable BndryFunc
functors (reference Source/NS_bcfill.H:101-170, amrex FILCC semantics). Here a
level is one dense global array, so the same-level/periodic part of FillPatch
is just padding; physical BCs become functional pad rules per (dim, side):

  int_dir       periodic wrap
  ext_dir       ghost = prescribed boundary value (reference velFill writes
                m_bc_values into ext_dir ghosts)
  foextrap      ghost = nearest interior cell
  hoextrap      quadratic extrapolation through first 3 interior cells
  reflect_even  mirror across the face
  reflect_odd   negated mirror

All functions are jit-safe (static ng/BC at trace time) and dimension-generic.
Axes are processed sequentially so edge/corner ghosts are consistently filled.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from iamr_tpu.core.bc import BCRec, MathBC


def _take(a, d, start, size):
    idx = [slice(None)] * a.ndim
    idx[d] = slice(start, start + size) if size > 0 else slice(0, 0)
    return a[tuple(idx)]


def _flip(a, d):
    return jnp.flip(a, axis=d)


def _ghost_block(a, d, side, ng, bc: MathBC, bcval):
    """Build the ng-wide ghost slab for (dim d, side 0=lo/1=hi)."""
    n = a.shape[d]
    if bc == MathBC.int_dir:
        return _take(a, d, n - ng, ng) if side == 0 else _take(a, d, 0, ng)
    if bc == MathBC.ext_dir:
        shp = list(a.shape)
        shp[d] = ng
        return jnp.full(shp, bcval, dtype=a.dtype)
    if bc == MathBC.foextrap:
        edge = _take(a, d, 0, 1) if side == 0 else _take(a, d, n - 1, 1)
        reps = [1] * a.ndim
        reps[d] = ng
        return jnp.tile(edge, reps)
    if bc == MathBC.hoextrap:
        # quadratic through the 3 nearest interior cells, evaluated at ghost
        # centers. Interior cells at x=0.5,1.5,2.5 (lo side, measuring from the
        # face); ghost k at x=-(k-0.5).
        if side == 0:
            c0, c1, c2 = (_take(a, d, k, 1) for k in range(3))
        else:
            c0, c1, c2 = (_take(a, d, n - 1 - k, 1) for k in range(3))
        blocks = []
        for k in range(1, ng + 1):
            x = -(k - 0.5)
            # Lagrange basis at x for nodes 0.5, 1.5, 2.5
            l0 = (x - 1.5) * (x - 2.5) / ((0.5 - 1.5) * (0.5 - 2.5))
            l1 = (x - 0.5) * (x - 2.5) / ((1.5 - 0.5) * (1.5 - 2.5))
            l2 = (x - 0.5) * (x - 1.5) / ((2.5 - 0.5) * (2.5 - 1.5))
            blocks.append(l0 * c0 + l1 * c1 + l2 * c2)
        if side == 0:
            blocks = blocks[::-1]
        return jnp.concatenate(blocks, axis=d)
    if bc in (MathBC.reflect_even, MathBC.reflect_odd):
        sl = _take(a, d, 0, ng) if side == 0 else _take(a, d, n - ng, ng)
        sl = _flip(sl, d)
        if bc == MathBC.reflect_odd:
            sl = -sl
        return sl
    raise ValueError(f"unknown MathBC {bc}")


def pad_axis(a, d: int, ng: int, bc_lo: MathBC, bc_hi: MathBC, val_lo=0.0, val_hi=0.0):
    lo = _ghost_block(a, d, 0, ng, bc_lo, val_lo)
    hi = _ghost_block(a, d, 1, ng, bc_hi, val_hi)
    return jnp.concatenate([lo, a, hi], axis=d)


def fill_ghost(
    a,
    ng: int,
    bcrec: BCRec,
    vals_lo: Optional[Sequence[float]] = None,
    vals_hi: Optional[Sequence[float]] = None,
):
    """Pad a single-component cell-centered array with ng filled ghost cells.

    a: shape (*spatial). Returns shape (+2ng per dim).
    vals_lo/vals_hi: ext_dir boundary values per dim (scalars).
    """
    dim = a.ndim
    vals_lo = vals_lo if vals_lo is not None else (0.0,) * dim
    vals_hi = vals_hi if vals_hi is not None else (0.0,) * dim
    for d in range(dim):
        a = pad_axis(a, d, ng, bcrec.lo[d], bcrec.hi[d], vals_lo[d], vals_hi[d])
    return a


def interior(a, ng: int):
    """Strip ng ghost cells from every dimension."""
    idx = tuple(slice(ng, s - ng) for s in a.shape)
    return a[idx]
