"""Box-batched FEM nodal Laplacian multigrid (the nodal projection solver
over a congruent box batch).

Same role as ops/mg_nodal.py but the AMR level lives as its boxes
`[nbox, (bs+1)...]` nodes / `[nbox, bs...]` sigma cells — the union
bounding box is never materialized (reference: MLNodeLaplacian solving one
level across its BoxArray, Projection.cpp:2385-2567; SURVEY.md 2.2).

Conventions:
  * box-boundary nodes are DUPLICATED degrees of freedom (the same trick
    the single-array solver uses for the periodic node n == node 0): every
    copy sees identical stencil data through the ghost fills, so copies
    stay bitwise equal through Jacobi/V-cycles/CG; global reductions weight
    each node by one canonical owner box.
  * a node is FREE iff all 2^dim adjacent cells are covered by boxes
    (matching UnionBCProvider.nodemask); other nodes carry Dirichlet data
    (coarse interpolation), lifted into the RHS once — in-cycle they are
    pinned to zero.
  * exterior sigma is zero (wall/inflow Neumann) or wraps (periodic), as
    in mg_nodal._pad_cells; outflow Dirichlet nodes come through the free
    mask exactly like C-F nodes.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iamr_tpu.ops.mg_nodal import (
    N_DIRICHLET,
    N_NEUMANN,
    N_PERIODIC,
    NodalBC,
    _fem_element_matrix,
    _jacobi_safe_omega,
    _prolong_node,
    _stride2,
)
from iamr_tpu.parallel.reduce import invariant_sum


def _apply_nodal_padded(pp, sp, dx, nshape):
    """FEM L(phi) from PADDED per-box blocks: pp nodes [.., ns+2], sp cells
    [.., ns+1] (one ghost each side). Identical arithmetic to
    mg_nodal.apply_nodal after its own padding."""
    dim = len(nshape)
    vol = 1.0
    for h in dx:
        vol *= h
    K = _fem_element_matrix(dx)
    out = jnp.zeros(pp.shape[:1] + nshape, dtype=pp.dtype)
    for o in itertools.product((-1, 0, 1), repeat=dim):
        phi_o = pp[(slice(None),) + tuple(
            slice(1 + o[d], 1 + o[d] + nshape[d]) for d in range(dim)
        )]
        coef = jnp.zeros(pp.shape[:1] + nshape, dtype=pp.dtype)
        choices = []
        for d in range(dim):
            if o[d] == -1:
                choices.append([(0, 1, 0)])
            elif o[d] == 1:
                choices.append([(1, 0, 1)])
            else:
                choices.append([(0, 1, 1), (1, 0, 0)])
        for combo in itertools.product(*choices):
            t = tuple(c[0] for c in combo)
            a = tuple(c[1] for c in combo)
            b = tuple(c[2] for c in combo)
            sig = sp[(slice(None),) + tuple(
                slice(t[d], t[d] + nshape[d]) for d in range(dim)
            )]
            coef = coef + sig * K[(a, b)]
        out = out - coef * phi_o / vol
    return out


def batch_node_maps(lo, bshape, dom_ncell, periodic):
    """Gather maps for the 1-ghost NODE fill + free/owner masks.

    Node index space: periodic dims use ids mod dom (node dom == node 0);
    non-periodic dims ids 0..dom. Returns:
      nsrc/ncover  [nbox, bs+3 nodes]: sibling gather for padded nodes
      free         [nbox, bs+1 nodes]: all 2^dim adjacent cells box-covered
                   (in-domain; out-of-domain cells count as covered so
                   physical boundaries do NOT pin — bc handles them)
      own          [nbox, bs+1 nodes]: weight 1 at exactly one copy
      csrc/ccover  [nbox, bs+2 cells]: sibling gather for padded sigma
    """
    nbox, dim = lo.shape
    bshape = tuple(bshape)
    dom = tuple(dom_ncell)

    # --- cell coverage / owner grids
    owner_c = -np.ones(dom, np.int32)
    for b in range(nbox):
        owner_c[tuple(slice(int(lo[b, d]), int(lo[b, d]) + bshape[d])
                      for d in range(dim))] = b

    def wrap_cell(g, d):
        if periodic[d]:
            return np.mod(g, dom[d]), np.zeros_like(g, bool)
        return np.clip(g, 0, dom[d] - 1), (g < 0) | (g >= dom[d])

    # --- padded cell gather (sigma, 1 ghost)
    cshape = tuple(n + 2 for n in bshape)
    gc = [lo[:, d:d + 1] + np.arange(-1, bshape[d] + 1)[None]
          for d in range(dim)]
    gw, bad = zip(*[wrap_cell(gc[d], d) for d in range(dim)])
    own = np.empty((nbox,) + cshape, np.int32)
    for b in range(nbox):
        own[b] = owner_c[np.ix_(*[gw[d][b] for d in range(dim)])]
    outdom = np.zeros((nbox,) + cshape, bool)
    for d in range(dim):
        sh = [nbox] + [1] * dim
        sh[1 + d] = cshape[d]
        outdom |= bad[d].reshape(sh)
    own = np.where(outdom, -1, own)
    ccover = own >= 0
    bcells = int(np.prod(bshape))
    local = np.zeros((nbox,) + cshape, np.int64)
    stride = 1
    for d in reversed(range(dim)):
        sh = [nbox] + [1] * dim
        sh[1 + d] = cshape[d]
        lo_o = np.where(own >= 0, lo[np.maximum(own, 0), d], 0)
        gd = np.broadcast_to(gw[d].reshape(sh), own.shape)
        local = local + np.clip(gd - lo_o, 0, bshape[d] - 1) * stride
        stride *= bshape[d]
    csrc = np.where(ccover, np.maximum(own, 0).astype(np.int64) * bcells
                    + local, 0).astype(np.int32)

    # --- node owner grid (independent-node space: periodic dims size dom,
    # else dom+1); owner = lowest box index whose node set contains it
    nspace = tuple(dom[d] if periodic[d] else dom[d] + 1 for d in range(dim))
    owner_n = -np.ones(nspace, np.int32)
    for b in reversed(range(nbox)):
        rngs = []
        for d in range(dim):
            ids = np.arange(int(lo[b, d]), int(lo[b, d]) + bshape[d] + 1)
            if periodic[d]:
                ids = np.mod(ids, dom[d])
            rngs.append(np.unique(ids))
        owner_n[np.ix_(*rngs)] = b

    def node_ids(b, d, pad):
        ids = np.arange(int(lo[b, d]) - pad, int(lo[b, d]) + bshape[d] + 1 + pad)
        if periodic[d]:
            return np.mod(ids, dom[d]), np.zeros_like(ids, bool)
        return np.clip(ids, 0, dom[d]), (ids < 0) | (ids > dom[d])

    # padded node gather
    pshape = tuple(n + 3 for n in bshape)
    own_n = np.empty((nbox,) + pshape, np.int32)
    badn = np.zeros((nbox,) + pshape, bool)
    idsw = []
    for d in range(dim):
        iw = np.empty((nbox, pshape[d]), np.int64)
        bd = np.empty((nbox, pshape[d]), bool)
        for b in range(nbox):
            iw[b], bd[b] = node_ids(b, d, 1)
        idsw.append(iw)
        sh = [nbox] + [1] * dim
        sh[1 + d] = pshape[d]
        badn |= bd.reshape(sh)
    for b in range(nbox):
        own_n[b] = owner_n[np.ix_(*[idsw[d][b] for d in range(dim)])]
    own_n = np.where(badn, -1, own_n)
    ncover = own_n >= 0
    bnodes = int(np.prod([n + 1 for n in bshape]))
    localn = np.zeros((nbox,) + pshape, np.int64)
    stride = 1
    for d in reversed(range(dim)):
        sh = [nbox] + [1] * dim
        sh[1 + d] = pshape[d]
        lo_o = np.where(own_n >= 0, lo[np.maximum(own_n, 0), d], 0)
        gd = np.broadcast_to(idsw[d].reshape((nbox,) + tuple(
            pshape[e] if e == d else 1 for e in range(dim)
        )), own_n.shape)
        # local node coord in the owner box; periodic wrap can place the
        # global id below the owner lo — re-wrap relative to owner
        rel = gd - lo_o
        if periodic[d]:
            rel = np.mod(rel, dom[d])
        rel = np.clip(rel, 0, bshape[d])
        localn = localn + rel * stride
        stride *= bshape[d] + 1
    nsrc = np.where(ncover, np.maximum(own_n, 0).astype(np.int64) * bnodes
                    + localn, 0).astype(np.int32)

    # --- free mask: all 2^dim adjacent cells covered (out-of-domain cells
    # count as covered: physical sides are handled by the bc, not pinning)
    nshape1 = tuple(n + 1 for n in bshape)
    free = np.ones((nbox,) + nshape1, bool)
    for t in itertools.product((0, 1), repeat=dim):
        cells = []
        okd = []
        for d in range(dim):
            ids = lo[:, d:d + 1] + np.arange(-1 + t[d], bshape[d] + t[d])[None]
            w, bd = wrap_cell(ids, d)
            cells.append(w)
            okd.append(bd)  # out-of-domain -> treated covered
        cov = np.empty((nbox,) + nshape1, bool)
        for b in range(nbox):
            cv = owner_c[np.ix_(*[cells[d][b] for d in range(dim)])] >= 0
            for d in range(dim):
                sh = [1] * dim
                sh[d] = nshape1[d]
                cv = cv | okd[d][b].reshape(sh)
            cov[b] = cv
        free &= cov

    # --- owner weights at the box's own nodes
    ownw = np.empty((nbox,) + nshape1, bool)
    for b in range(nbox):
        ids = []
        for d in range(dim):
            iw, _ = node_ids(b, d, 0)
            ids.append(iw)
        ownw[b] = owner_n[np.ix_(*ids)] == b
    return {
        "csrc": csrc, "ccover": ccover,
        "nsrc": nsrc, "ncover": ncover,
        "free": free, "own": ownw,
    }


@dataclasses.dataclass
class NodalBatchLevel:
    sigma: jnp.ndarray        # [nbox, bs...]
    diag: jnp.ndarray         # [nbox, (bs+1)...]
    dx: Tuple[float, ...]
    bshape: Tuple[int, ...]
    maps: Dict
    omega: float


class BatchNodal:
    """Batched nodal Laplacian solve over congruent boxes.

    bc: NodalBC of the PHYSICAL domain (periodic wrap is honored through
    the maps; Neumann = exterior sigma zero happens naturally because
    out-of-domain cell ghosts gather nothing and fill 0; outflow Dirichlet
    is imposed through `extra_pin` node masks by the caller).
    """

    def __init__(self, specs_lo, bshape, dom_ncell, periodic, bc: NodalBC,
                 extra_pin=None):
        self.lo0 = np.asarray(specs_lo, np.int64)
        self.nbox = self.lo0.shape[0]
        self.dim = self.lo0.shape[1]
        self.bshape0 = tuple(int(x) for x in bshape)
        self.dom0 = tuple(int(x) for x in dom_ncell)
        self.periodic = tuple(bool(p) for p in periodic)
        self.bc = bc
        self.extra_pin = extra_pin  # [nbox, nodes] bool, True = pinned
        self._depth_maps: Dict[int, Dict] = {}

    def _dom(self, k):
        return tuple(n >> k for n in self.dom0)

    def maps_at(self, k):
        if k not in self._depth_maps:
            m = batch_node_maps(
                self.lo0 >> k, tuple(n >> k for n in self.bshape0),
                self._dom(k), self.periodic,
            )
            # physical outflow Dirichlet: pin nodes on those domain faces
            free = m["free"].copy()
            lo_k = self.lo0 >> k
            bs_k = tuple(n >> k for n in self.bshape0)
            dom_k = self._dom(k)
            for d in range(self.dim):
                for side, kind in ((0, self.bc.lo[d]), (1, self.bc.hi[d])):
                    if kind != N_DIRICHLET:
                        continue
                    for b in range(self.nbox):
                        at = (lo_k[b, d] == 0) if side == 0 else (
                            lo_k[b, d] + bs_k[d] == dom_k[d])
                        if not at:
                            continue
                        idx = [slice(None)] * self.dim
                        idx[d] = slice(0, 1) if side == 0 else slice(-1, None)
                        free[(b,) + tuple(idx)] = False
            if self.extra_pin is not None:
                # coincident-node (stride-2^k) sampling, like mg_nodal's
                # mask0 handling in build_nodal_hierarchy
                s = 1 << k
                pin = np.asarray(self.extra_pin)[
                    (slice(None),) + (slice(None, None, s),) * self.dim
                ]
                free &= ~pin
            m["free"] = free
            self._depth_maps[k] = m
        return self._depth_maps[k]

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

    # -- fills ---------------------------------------------------------

    def pad_nodes(self, x, k, g_pad=None):
        """[nbox, bs+1] -> [nbox, bs+3]: sibling gather; uncovered ghosts
        from g_pad (full padded Dirichlet data) or 0."""
        m = self.maps_at(k)
        g = x.reshape(-1)[m["nsrc"]]
        if g_pad is None:
            g = jnp.where(m["ncover"], g, 0.0)
        else:
            g = jnp.where(m["ncover"], g, g_pad)
        return g

    def pad_cells(self, s, k):
        """sigma [nbox, bs] -> [nbox, bs+2]: sibling gather, 0 outside
        (exterior Neumann / hole cells never reach free-node rows)."""
        m = self.maps_at(k)
        g = s.reshape(-1)[m["csrc"]]
        return jnp.where(m["ccover"], g, 0.0)

    # -- operator ---------------------------------------------------------

    def apply(self, phi, lev: NodalBatchLevel, k, g_pad=None):
        pp = self.pad_nodes(phi, k, g_pad)
        sp = self.pad_cells(lev.sigma, k)
        nshape = tuple(n + 1 for n in lev.bshape)
        return _apply_nodal_padded(pp, sp, lev.dx, nshape)

    def _diag(self, sigma, dx, k):
        dim = self.dim
        sp = self.pad_cells(sigma, k)
        s = sp
        for d in range(dim):
            s = (jax.lax.slice_in_dim(s, 1, s.shape[1 + d], axis=1 + d)
                 + jax.lax.slice_in_dim(s, 0, s.shape[1 + d] - 1, axis=1 + d))
        kap = sum(1.0 / (3 ** (dim - 1) * dx[d] ** 2) for d in range(dim))
        d_ = -s * kap
        return jnp.where(d_ == 0.0, -kap, d_)

    def build_hierarchy(self, sigma, dx, min_size: int = 2):
        from iamr_tpu.ops.mg_nodal import _coarsen_sigma

        nd = self.n_depths(min_size=min_size)
        levels = []
        cur_s, cur_dx = sigma, tuple(dx)
        bs = self.bshape0
        for k in range(nd):
            diag = self._diag(cur_s, cur_dx, k)
            levels.append(NodalBatchLevel(
                cur_s, diag, cur_dx, bs, self.maps_at(k),
                _jacobi_safe_omega(cur_dx, self.dim),
            ))
            if k + 1 < nd:
                cur_s = jax.vmap(lambda x: _coarsen_sigma(x, self.dim))(cur_s)
                cur_dx = tuple(2.0 * h for h in cur_dx)
                bs = tuple(n // 2 for n in bs)
        return levels

    # -- cycle ------------------------------------------------------------

    def _freem(self, k, dtype):
        return jnp.asarray(self.maps_at(k)["free"], dtype)

    def _smooth(self, phi, rhs, lev, k, nsweeps):
        fm = self._freem(k, rhs.dtype)

        def body(_, phi):
            r = rhs - self.apply(phi, lev, k)
            return phi + lev.omega * fm * r / lev.diag

        return jax.lax.fori_loop(0, nsweeps, body, phi)

    def _residual(self, phi, rhs, lev, k):
        fm = self._freem(k, rhs.dtype)
        return fm * (rhs - self.apply(phi, lev, k))

    def _restrict(self, r, k):
        """Full-weighting per box with sibling ghost residuals."""
        rp = self.pad_nodes(r, k)  # [nbox, bs+3]
        dim = self.dim
        out = rp
        for d in range(dim):
            ax = 1 + d
            n_nodes = out.shape[ax] - 2  # current unpadded extent
            nc = (n_nodes - 1) // 2 + 1
            ctr = _stride2(out, ax, 1, nc)
            left = _stride2(out, ax, 0, nc)
            right = _stride2(out, ax, 2, nc)
            out = 0.5 * ctr + 0.25 * (left + right)
        return out

    def _bottom_cg(self, rhs, lev, k, iters: int = 48):
        fm = self._freem(k, rhs.dtype)
        ow = jnp.asarray(self.maps_at(k)["own"], rhs.dtype) * fm
        singular = self._singular()
        nfree = jnp.maximum(invariant_sum(ow), 1.0)

        def matvec(p):
            return fm * self.apply(p, lev, k)

        def dot(x, y):
            return invariant_sum(ow * x * y)

        def demean(x):
            if not singular:
                return x
            return fm * (x - invariant_sum(ow * x) / nfree)

        rhs = demean(fm * rhs)
        x = jnp.zeros_like(rhs)
        r = rhs
        p = r
        rs = dot(r, r)
        eps = jnp.asarray(1e-30, rhs.dtype)
        rs0 = rs

        def body(_, carry):
            x, r, p, rs = carry
            active = rs > jnp.maximum(1e-28 * rs0, eps)
            ap = matvec(p)
            pap = dot(p, ap)
            denom_ok = jnp.abs(pap) > eps
            alpha_k = jnp.where(active & denom_ok,
                                rs / jnp.where(denom_ok, pap, 1.0), 0.0)
            x = x + alpha_k * p
            r = demean(r - alpha_k * ap)
            rs_new = dot(r, r)
            beta_k = jnp.where(active, rs_new / jnp.maximum(rs, eps), 0.0)
            p = r + beta_k * p
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
        return x

    def _singular(self):
        if self.extra_pin is not None and bool(np.asarray(self.extra_pin).any()):
            return False
        if any(self.bc.lo[d] == N_DIRICHLET or self.bc.hi[d] == N_DIRICHLET
               for d in range(self.dim)):
            return False
        # any pinned (non-free) node makes it non-singular
        return bool(np.asarray(self.maps_at(0)["free"]).all())

    def _vcycle(self, rhs, levels, lev_idx=0, nu1=2, nu2=2):
        lev = levels[lev_idx]
        k = lev_idx
        if lev_idx == len(levels) - 1:
            return self._bottom_cg(rhs, lev, k)
        phi = jnp.zeros_like(rhs)
        phi = self._smooth(phi, rhs, lev, k, nu1)
        r = self._residual(phi, rhs, lev, k)
        r_c = self._restrict(r, k)
        e_c = self._vcycle(r_c, levels, lev_idx + 1, nu1, nu2)
        e = jax.vmap(lambda x: _prolong_node(x, self.dim))(e_c)
        phi = phi + self._freem(k, rhs.dtype) * e
        phi = self._smooth(phi, rhs, lev, k, nu2)
        return phi

    # -- driver -----------------------------------------------------------

    def solve(self, rhs, sigma, dx, phi0=None, g_pad=None,
              rtol: float = 1e-11, atol: float = 0.0,
              fixed_cycles: Optional[int] = None, max_cycles: int = 200,
              nu1: int = 2, nu2: int = 2):
        """g_pad: [nbox, bs+3] FULL padded Dirichlet data (values at pinned
        nodes + uncovered ghosts; anything at free/covered slots ignored).
        Returns (phi_full, cycles, resid) with phi_full = solution at free
        nodes + the given Dirichlet data at pinned nodes."""
        dtype = rhs.dtype
        levels = self.build_hierarchy(sigma, dx)
        fm = self._freem(0, dtype)
        ow = jnp.asarray(self.maps_at(0)["own"], dtype) * fm
        singular = self._singular()

        g_in = None
        if g_pad is not None:
            interior = (slice(None),) + tuple(
                slice(1, -1) for _ in range(self.dim)
            )
            # x = x_h + g_full: g at pinned interior nodes and uncovered
            # ghosts, 0 at free nodes (covered ghosts re-gather the sibling
            # copy, which carries the same pinned/free split)
            g_in = jnp.where(fm > 0.0, 0.0, g_pad[interior])
            gp = self.pad_nodes(g_in, 0, g_pad=g_pad)
            lift = _apply_nodal_padded(
                gp, self.pad_cells(sigma, 0), dx,
                tuple(n + 1 for n in self.bshape0),
            )
            rhs = rhs - lift

        rhs = fm * rhs
        nfree = jnp.maximum(invariant_sum(ow), 1.0)
        if singular:
            rhs = rhs - fm * (invariant_sum(ow * rhs) / nfree)

        phi = jnp.zeros_like(rhs) if phi0 is None else fm * phi0
        r = rhs - fm * self.apply(phi, levels[0], 0) if phi0 is not None else rhs

        bnorm = jnp.max(jnp.abs(rhs))
        tol = jnp.maximum(rtol * bnorm, atol).astype(dtype)

        def finish(phi):
            if singular:
                phi = phi - fm * (invariant_sum(ow * phi) / nfree)
            if g_in is not None:
                phi = phi + g_in
            return phi

        if fixed_cycles is not None:
            for _ in range(fixed_cycles):
                e = self._vcycle(r, levels, 0, nu1, nu2)
                phi = phi + fm * e
                r = fm * (rhs - self.apply(phi, levels[0], 0))
            return finish(phi), fixed_cycles, jnp.max(jnp.abs(r))

        def cond(state):
            phi, r, i = state
            return (jnp.max(jnp.abs(r)) > tol) & (i < max_cycles)

        def body(state):
            phi, r, i = state
            e = self._vcycle(r, levels, 0, nu1, nu2)
            phi = phi + fm * e
            r = fm * (rhs - self.apply(phi, levels[0], 0))
            return phi, r, i + 1

        phi, r, i = jax.lax.while_loop(cond, body, (phi, r, jnp.asarray(0)))
        return finish(phi), i, jnp.max(jnp.abs(r))
