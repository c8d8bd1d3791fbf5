"""Box-batched cell-centered ABecLaplacian multigrid.

Solves a * alpha * phi - b * div(beta grad phi) = rhs over a congruent
box batch `[nbox, bs, ...]` — an AMR level stored as its boxes, never as
the union bounding box. This is the TPU-native analogue of AMReX MLMG
solving one level across its whole BoxArray (SURVEY.md section 2.2;
reference call sites MacProj.cpp / Diffusion.cpp): each MG depth keeps
the batch layout (boxes coarsen congruently), smoothing is a vmapped
red-black sweep with a flat-gather ghost exchange between colors (the
MFIter + FillBoundary pattern), and the bottom runs batched CG with
layout-invariant global reductions.

Memory scales with sum(box volumes) at every depth — the union bounding
box is never materialized (VERDICT round 2, missing item 1).

Boundary semantics match ops/mg.py exactly:
  * physical domain sides (per box touch pattern): the _pad_phi ghost
    rules (periodic wrap happens in the gather maps; Dirichlet-on-face
    -2c0 + c1/3 (+8/3 g inhomogeneous); Neumann zero-flux);
  * coarse-fine / uncovered ghosts: Dirichlet ghost CELLS (value pinned
    to the coarse interpolation), identical to the union solve's
    interior-Dirichlet holes (ops/mg.py union_dirichlet_coeffs) — the
    ghost's face coefficient enters the diagonal with weight 1 and the
    pinned value is lifted into the RHS once at the top level.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iamr_tpu.ops.mg import (
    DIRICHLET,
    NEUMANN,
    PERIODIC,
    PoissonBC,
    _coarsen_cell,
    _coarsen_face,
    _prolong,
)
from iamr_tpu.ops.stencil import checkerboard
from iamr_tpu.parallel.reduce import invariant_sum


def invariant_max(x):
    # max is exactly order-invariant; plain jnp.max matches mg.py's norms
    return jnp.max(jnp.abs(x))


def batch_cell_maps(
    lo: np.ndarray,
    bshape: Tuple[int, ...],
    dom_ncell: Tuple[int, ...],
    periodic: Tuple[bool, ...],
    ng: int = 1,
):
    """Flat-gather maps for the ng-ghost fill of a congruent box batch.

    lo: [nbox, dim] box lower corners (cell index space of this MG depth).
    Returns dict with:
      cover  [nbox, *(bs+2ng)] bool: ghost covered by some box (gather)
      src    [nbox, *(bs+2ng)] int32 into batch.reshape(-1)
      outdom [nbox, *(bs+2ng)] bool: outside a non-periodic domain side
              (physical BC rule applies; NOT a C-F ghost)
    Interior cells are cover=True pointing at themselves.
    """
    nbox, dim = lo.shape
    gshape = tuple(n + 2 * ng for n in bshape)
    # owner grid over the domain (cells of this depth)
    owner = -np.ones(dom_ncell, np.int32)
    for b in range(nbox):
        owner[tuple(
            slice(int(lo[b, d]), int(lo[b, d]) + bshape[d])
            for d in range(dim)
        )] = b
    gc = [lo[:, d:d + 1] + np.arange(-ng, bshape[d] + ng)[None]
          for d in range(dim)]
    gw, bad = [], []
    for d in range(dim):
        if periodic[d]:
            gw.append(np.mod(gc[d], dom_ncell[d]))
            bad.append(np.zeros_like(gc[d], bool))
        else:
            gw.append(np.clip(gc[d], 0, dom_ncell[d] - 1))
            bad.append((gc[d] < 0) | (gc[d] >= dom_ncell[d]))
    own = np.empty((nbox,) + gshape, np.int32)
    for b in range(nbox):
        own[b] = owner[np.ix_(*[gw[d][b] for d in range(dim)])]
    outdom = np.zeros((nbox,) + gshape, bool)
    for d in range(dim):
        sh = [nbox] + [1] * dim
        sh[1 + d] = gshape[d]
        outdom |= bad[d].reshape(sh)
    own = np.where(outdom, -1, own)
    cover = own >= 0
    bcells = int(np.prod(bshape))
    local = np.zeros((nbox,) + gshape, np.int64)
    stride = 1
    for d in reversed(range(dim)):
        sh = [nbox] + [1] * dim
        sh[1 + d] = gshape[d]
        lo_owner = np.where(own >= 0, lo[np.maximum(own, 0), d], 0)
        gd = np.broadcast_to(gw[d].reshape(sh), own.shape)
        local = local + np.clip(gd - lo_owner, 0, bshape[d] - 1) * stride
        stride *= bshape[d]
    src = np.where(cover, np.maximum(own, 0).astype(np.int64) * bcells
                   + local, 0).astype(np.int32)
    # numpy on purpose: these are cached across jit traces (device constants
    # created inside a trace are tracers and must not escape it)
    return {"cover": cover, "src": src, "outdom": outdom}


@dataclasses.dataclass
class BatchLevel:
    alpha: jnp.ndarray                 # [nbox, bs...]
    beta: Tuple[jnp.ndarray, ...]      # per dim [nbox, faces...]
    diag: jnp.ndarray
    dx: Tuple[float, ...]
    bshape: Tuple[int, ...]
    maps: Dict
    red: jnp.ndarray
    black: jnp.ndarray


def _sl(a, d, lo, hi):
    idx = [slice(None)] * a.ndim
    idx[d] = slice(lo, hi)
    return a[tuple(idx)]


class BatchPoisson:
    """Geometry + operator for one congruent box batch.

    specs_lo: [nbox, dim] box corners; bshape: common box shape;
    dom_ncell: this level's index space extents; periodic: per dim;
    bc: PHYSICAL PoissonBC kinds (applied only on domain-touching box
    sides; all other box sides are sibling exchange or C-F Dirichlet).
    touch: [nbox, dim, 2] bool — which box sides lie on the domain.
    """

    def __init__(self, specs_lo, bshape, dom_ncell, periodic, bc: PoissonBC,
                 touch):
        self.lo0 = np.asarray(specs_lo, np.int64)
        self.nbox = self.lo0.shape[0]
        self.dim = self.lo0.shape[1]
        self.bshape0 = tuple(int(x) for x in bshape)
        self.dom0 = tuple(int(x) for x in dom_ncell)
        self.periodic = tuple(bool(p) for p in periodic)
        self.bc = bc
        self.touch = np.asarray(touch, bool)
        self._depth_maps: Dict[int, Dict] = {}

    def n_depths(self, min_size: int = 2, max_levels: int = 30) -> int:
        k, bs, lo = 0, self.bshape0, self.lo0
        while (
            k + 1 < max_levels
            and all(n % 2 == 0 for n in bs)
            and min(bs) > min_size
            and all(int(x) % 2 == 0 for x in lo.reshape(-1))
            and all(n % 2 == 0 for n in self._dom(k))
        ):
            k += 1
            bs = tuple(n // 2 for n in bs)
            lo = lo // 2
        return k + 1

    def _dom(self, k):
        return tuple(n >> k for n in self.dom0)

    def maps_at(self, k: int) -> Dict:
        if k not in self._depth_maps:
            self._depth_maps[k] = batch_cell_maps(
                self.lo0 >> k,
                tuple(n >> k for n in self.bshape0),
                self._dom(k),
                self.periodic,
                ng=1,
            )
        return self._depth_maps[k]

    # -- ghost machinery ---------------------------------------------------

    def _phys_ghosts(self, g, homog: bool, bvals=None):
        """Apply physical-BC ghost rules on domain-touching box sides.

        g: [nbox, bs+2] with sibling/C-F ghosts already placed. The maps
        wrapped periodic dims already; outdom ghosts currently hold clamped
        interior data — overwrite per the BC kind. bvals: {(d, side): g0}
        inhomogeneous face values (Dirichlet) / gradients (Neumann),
        broadcastable over the boundary slab, applied when homog=False.
        """
        dim = self.dim
        bc = self.bc
        for d in range(dim):
            if self.periodic[d]:
                continue
            for side in (0, 1):
                tmask = self.touch[:, d, side]
                if not tmask.any():
                    continue
                kind = bc.lo[d] if side == 0 else bc.hi[d]
                n = g.shape[1 + d]
                if side == 0:
                    gslab = [slice(None)] * dim
                    gslab[d] = slice(0, 1)
                    c0 = _sl(g, 1 + d, 1, 2)
                    c1 = _sl(g, 1 + d, 2, 3)
                else:
                    gslab = [slice(None)] * dim
                    gslab[d] = slice(n - 1, n)
                    c0 = _sl(g, 1 + d, n - 2, n - 1)
                    c1 = _sl(g, 1 + d, n - 3, n - 2)
                if kind == DIRICHLET:
                    val = -2.0 * c0 + (1.0 / 3.0) * c1
                    if not homog and bvals and (d, side) in bvals:
                        v = jnp.asarray(bvals[(d, side)], g.dtype)
                        val = val + (8.0 / 3.0) * v
                elif kind == NEUMANN:
                    val = c0
                    if not homog and bvals and (d, side) in bvals:
                        val = val + jnp.asarray(bvals[(d, side)], g.dtype)
                else:
                    continue
                sel = jnp.asarray(tmask).reshape((self.nbox,) + (1,) * dim)
                cur = g[(slice(None),) + tuple(gslab)]
                g = g.at[(slice(None),) + tuple(gslab)].set(
                    jnp.where(sel, jnp.broadcast_to(val, cur.shape), cur)
                )
        return g

    def fill1(self, x, k: int, cf_ghosts=None, bvals=None):
        """One-ghost fill of batch x at depth k: sibling gather, C-F ghosts
        from cf_ghosts (or 0 = homogeneous), physical rules on touch
        sides."""
        m = self.maps_at(k)
        g = x.reshape(-1)[m["src"]]
        if cf_ghosts is None:
            g = jnp.where(m["cover"], g, 0.0)
        else:
            g = jnp.where(m["cover"], g, cf_ghosts)
        homog = cf_ghosts is None and not bvals
        g = self._phys_ghosts(g, homog=homog, bvals=bvals)
        return g

    # -- operator ------------------------------------------------------

    def apply_from_g(self, g, lev: BatchLevel, a, b):
        """L(phi) from the FILLED batch g [nbox, bs+2]."""
        dim = self.dim
        ctr = g[(slice(None),) + tuple(slice(1, -1) for _ in range(dim))]
        out = a * lev.alpha * ctr if a != 0.0 else jnp.zeros_like(ctr)
        for d in range(dim):
            idx_lo = [slice(1, -1)] * dim
            idx_hi = [slice(1, -1)] * dim
            idx_lo[d] = slice(0, -2)
            idx_hi[d] = slice(2, None)
            lo_n = g[(slice(None),) + tuple(idx_lo)]
            hi_n = g[(slice(None),) + tuple(idx_hi)]
            bl = _sl(lev.beta[d], 1 + d, 0, -1)
            bh = _sl(lev.beta[d], 1 + d, 1, None)
            lap = (bh * (hi_n - ctr) - bl * (ctr - lo_n)) / (
                lev.dx[d] * lev.dx[d]
            )
            out = out - b * lap
        return out

    def _diag(self, alpha, beta, a, b, dx, dtype):
        """Per-box operator diagonal: interior/sibling/C-F faces weight 1;
        physical Dirichlet faces 3, Neumann 0 (only on touch sides)."""
        dim = self.dim
        bshape = alpha.shape[1:]
        diag = a * alpha if a != 0.0 else jnp.zeros_like(alpha)
        for d in range(dim):
            bl = _sl(beta[d], 1 + d, 0, -1)
            bh = _sl(beta[d], 1 + d, 1, None)
            cl = jnp.ones((self.nbox,) + bshape, dtype)
            ch = jnp.ones((self.nbox,) + bshape, dtype)
            if not self.periodic[d]:
                for side in (0, 1):
                    kind = self.bc.lo[d] if side == 0 else self.bc.hi[d]
                    if kind == PERIODIC:
                        continue
                    w = 3.0 if kind == DIRICHLET else 0.0
                    tmask = jnp.asarray(self.touch[:, d, side]).reshape(
                        (self.nbox,) + (1,) * dim
                    )
                    edge = [slice(None)] * dim
                    edge[d] = slice(0, 1) if side == 0 else slice(-1, None)
                    tgt = cl if side == 0 else ch
                    cur = tgt[(slice(None),) + tuple(edge)]
                    new = jnp.where(tmask, w, cur)
                    if side == 0:
                        cl = cl.at[(slice(None),) + tuple(edge)].set(new)
                    else:
                        ch = ch.at[(slice(None),) + tuple(edge)].set(new)
            diag = diag + b * (cl * bl + ch * bh) / (dx[d] * dx[d])
        return diag

    def build_hierarchy(self, alpha, beta, a, b, dx, min_size: int = 2):
        nd = self.n_depths(min_size=min_size)
        levels = []
        cur_a, cur_b, cur_dx = alpha, tuple(beta), tuple(dx)
        bs = self.bshape0
        dtype = alpha.dtype
        for k in range(nd):
            diag = self._diag(cur_a, cur_b, a, b, cur_dx, dtype)
            red = checkerboard(bs, 0, dtype)[None]
            black = checkerboard(bs, 1, dtype)[None]
            levels.append(BatchLevel(
                cur_a, cur_b, diag, cur_dx, bs, self.maps_at(k), red, black
            ))
            if k + 1 < nd:
                cur_a = jax.vmap(lambda x: _coarsen_cell(x, self.dim))(cur_a)
                cur_b = tuple(
                    jax.vmap(lambda x, d=d: _coarsen_face(x, d, self.dim))(
                        cur_b[d]
                    )
                    for d in range(self.dim)
                )
                cur_dx = tuple(2.0 * h for h in cur_dx)
                bs = tuple(n // 2 for n in bs)
        return levels

    # -- cycle pieces ----------------------------------------------------

    def _smooth(self, phi, rhs, lev: BatchLevel, k, a, b, nsweeps):
        def body(_, phi):
            for mask in (lev.red, lev.black):
                g = self.fill1(phi, k)
                r = rhs - self.apply_from_g(g, lev, a, b)
                phi = phi + mask * r / lev.diag
            return phi

        return jax.lax.fori_loop(0, nsweeps, body, phi)

    def _residual(self, phi, rhs, lev: BatchLevel, k, a, b):
        g = self.fill1(phi, k)
        return rhs - self.apply_from_g(g, lev, a, b)

    def _bottom_cg(self, rhs, lev: BatchLevel, k, a, b, iters: int = 48):
        singular = a == 0.0 and self._singular()

        def matvec(p):
            return self.apply_from_g(self.fill1(p, k), lev, a, b)

        def demean(x):
            if not singular:
                return x
            return x - invariant_sum(x) / float(np.prod(x.shape))

        rhs = demean(rhs)
        x = jnp.zeros_like(rhs)
        r = rhs
        p = r
        rs = invariant_sum(r * r)
        eps = jnp.asarray(1e-30, rhs.dtype)
        rs0 = rs

        def body(_, carry):
            x, r, p, rs = carry
            active = rs > jnp.maximum(1e-28 * rs0, eps)
            ap = matvec(p)
            pap = invariant_sum(p * ap)
            alpha_k = jnp.where(active & (pap > eps),
                                rs / jnp.maximum(pap, eps), 0.0)
            x = x + alpha_k * p
            r = demean(r - alpha_k * ap)
            rs_new = invariant_sum(r * r)
            beta_k = jnp.where(active, rs_new / jnp.maximum(rs, eps), 0.0)
            p = r + beta_k * p
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
        return x

    def _singular(self):
        bc = self.bc
        return all(
            bc.lo[d] != DIRICHLET and bc.hi[d] != DIRICHLET
            for d in range(self.dim)
        ) and not self._any_cf()

    def _any_cf(self):
        # any uncovered (C-F Dirichlet) ghost pins the solution
        m = self.maps_at(0)
        return bool(np.asarray(~np.asarray(m["cover"]) &
                               ~np.asarray(m["outdom"])).any())

    def _vcycle(self, rhs, levels, a, b, lev_idx=0, nu1=2, nu2=2):
        lev = levels[lev_idx]
        k = lev_idx
        if lev_idx == len(levels) - 1:
            return self._bottom_cg(rhs, lev, k, a, b)
        phi = jnp.zeros_like(rhs)
        phi = self._smooth(phi, rhs, lev, k, a, b, nu1)
        r = self._residual(phi, rhs, lev, k, a, b)
        # plain average restriction (matches ops/mg.py _coarsen_cell)
        r_c = jax.vmap(lambda x: _coarsen_cell(x, self.dim))(r)
        e_c = self._vcycle(r_c, levels, a, b, lev_idx + 1, nu1, nu2)
        phi = phi + jax.vmap(lambda x: _prolong(x, self.dim))(e_c)
        phi = self._smooth(phi, rhs, lev, k, a, b, nu2)
        return phi

    # -- driver ------------------------------------------------------------

    def solve(
        self,
        rhs,
        alpha,
        beta,
        a,
        b,
        dx,
        phi0=None,
        cf_ghosts=None,
        bvals=None,
        rtol: float = 1e-11,
        atol: float = 0.0,
        fixed_cycles: Optional[int] = None,
        max_cycles: int = 200,
        nu1: int = 2,
        nu2: int = 2,
    ):
        """Solve over the batch. cf_ghosts: [nbox, bs+2] coarse-interp
        Dirichlet ghost values at uncovered ghosts (used once, for the
        lift); bvals: physical inhomogeneous face data per (d, side).
        Returns (phi, n_cycles, final_resid_norm)."""
        dtype = rhs.dtype
        levels = self.build_hierarchy(alpha, beta, a, b, dx)
        singular = a == 0.0 and self._singular()

        # inhomogeneous lift: rhs_eff = rhs - A(0 with given ghosts)
        if cf_ghosts is not None or bvals:
            z = jnp.zeros_like(rhs)
            m = self.maps_at(0)
            g = jnp.zeros(m["cover"].shape, dtype)
            if cf_ghosts is not None:
                g = jnp.where(m["cover"], 0.0, cf_ghosts)
                g = jnp.where(m["outdom"], 0.0, g)
            # interior zeros stay zero; physical rules add their
            # inhomogeneous parts relative to a zero interior
            interior = tuple(slice(1, -1) for _ in range(self.dim))
            g = g.at[(slice(None),) + interior].set(z)
            g = self._phys_ghosts(g, homog=False, bvals=bvals)
            rhs = rhs - self.apply_from_g(g, levels[0], a, b)

        if singular:
            nall = float(np.prod(rhs.shape))
            rhs = rhs - invariant_sum(rhs) / nall

        phi = jnp.zeros_like(rhs) if phi0 is None else phi0
        if phi0 is not None:
            r = self._residual(phi, rhs, levels[0], 0, a, b)
        else:
            r = rhs

        bnorm = invariant_max(jnp.abs(rhs))
        tol = jnp.maximum(rtol * bnorm, atol).astype(dtype)

        if fixed_cycles is not None:
            for _ in range(fixed_cycles):
                e = self._vcycle(r, levels, a, b, 0, nu1, nu2)
                phi = phi + e
                r = self._residual(phi, rhs, levels[0], 0, a, b)
            if singular:
                phi = phi - invariant_sum(phi) / float(np.prod(phi.shape))
            return phi, fixed_cycles, invariant_max(jnp.abs(r))

        def cond(state):
            phi, r, i = state
            return (invariant_max(jnp.abs(r)) > tol) & (i < max_cycles)

        def body(state):
            phi, r, i = state
            e = self._vcycle(r, levels, a, b, 0, nu1, nu2)
            phi = phi + e
            r = self._residual(phi, rhs, levels[0], 0, a, b)
            return phi, r, i + 1

        phi, r, i = jax.lax.while_loop(cond, body, (phi, r, jnp.asarray(0)))
        if singular:
            phi = phi - invariant_sum(phi) / float(np.prod(phi.shape))
        return phi, i, invariant_max(jnp.abs(r))
