"""Congruent box-batch execution for multi-box AMR levels.

The reference's scaling model is many small boxes per level (amrex
BoxArray/DistributionMapping, Docs Software.rst:356-401) distributed over
ranks. The TPU-native equivalent built here (SURVEY.md section 7.1):
a fine level whose boxes are CONGRUENT (all the same shape — the
max_grid_size == blocking_factor gridding) executes as ONE batched array
`[nbox, ...]`:

  * hyperbolic phases (Godunov extrap + advection, updates, forcing) are
    `jax.vmap`-ed over the box axis — FLOPs and memory scale with
    sum(box volumes), not the bounding-box volume, and program size is
    independent of nbox (one traced program + a batch dim);
  * ghost cells are filled by ONE precomputed flat gather per fill:
    sibling-covered ghosts read the batch itself, the rest interpolate
    from gathered per-box coarse windows (FillPatch semantics), and
    physical domain sides apply the BC tables masked per box;
  * the level-wide elliptic couplings (MAC projection, CN diffusion,
    nodal projection — reference MLMG solves a level across its whole
    BoxArray) scatter the batch into the union bounding box and run the
    existing masked union solves (ops/mg.py union_dirichlet_coeffs),
    which touch only a handful of bbox-sized scratch arrays;
  * the box axis shards over a device mesh (jax.sharding) — the batched
    gathers become the halo exchange.

Hole cells (bbox minus the union) carry coarse-interpolated data exactly
where the union solves need Dirichlet values; the batch itself never
materializes them.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.multipatch import union_bbox_spec
from iamr_tpu.core.bc import BCRec, MathBC
from iamr_tpu.core.fill import _ghost_block
from iamr_tpu.ns.state import NSConfig, NSState


def congruent(specs: Sequence[LevelSpec]) -> bool:
    """All boxes the same shape (the box-batch eligibility condition)."""
    return len(specs) >= 1 and all(
        sp.ncell == specs[0].ncell and sp.ratio == specs[0].ratio
        for sp in specs
    )


def congruent_chop(boxes, box_size: Sequence[int]):
    """Re-chop arbitrary (lo, hi_exclusive) boxes onto a fixed box_size
    lattice: every occupied lattice tile becomes a box (the
    max_grid_size == blocking_factor gridding the reference recommends for
    uniform grids, Docs RunningProblems.rst:352-427). Input/output coords
    are in the same (fine) index space; tiles are clipped to nothing —
    callers pass box_size dividing the domain."""
    tiles = set()
    for lo, hi in boxes:
        dim = len(lo)
        ranges = [
            range(lo[d] // box_size[d], (hi[d] + box_size[d] - 1) // box_size[d])
            for d in range(dim)
        ]
        import itertools

        for t in itertools.product(*ranges):
            tiles.add(t)
    out = []
    for t in sorted(tiles):
        lo = tuple(t[d] * box_size[d] for d in range(len(t)))
        hi = tuple(lo[d] + box_size[d] for d in range(len(t)))
        out.append((lo, hi))
    return out


class BoxBatch:
    """Static geometry + precomputed fill maps for a congruent box batch.

    specs: congruent fine boxes (fine index space, aligned to ratio).
    cfg: the COARSE level's config; crse_geom = cfg.geom.
    """

    def __init__(self, cfg: NSConfig, specs: Sequence[LevelSpec]):
        from iamr_tpu.amr.multilevel import make_fine_config

        assert congruent(specs), "box batch requires congruent boxes"
        self.cfg = cfg
        self.specs = tuple(specs)
        self.nbox = len(specs)
        self.r = specs[0].ratio
        self.dim = specs[0].dim
        self.bshape = tuple(specs[0].ncell)
        self.bbox = union_bbox_spec(specs)
        self.cfg_box = make_fine_config(cfg, specs[0])
        self.cfg_u = make_fine_config(cfg, self.bbox)
        self.dom_ncell = tuple(
            cfg.geom.ncell[d] * self.r for d in range(self.dim)
        )
        self.periodic = tuple(cfg.geom.periodic)
        self.lo = np.array([sp.lo for sp in specs], np.int64)  # [nbox, dim]
        # physical-domain contact per box face [nbox, dim, 2]
        self.touch = np.zeros((self.nbox, self.dim, 2), bool)
        for b, sp in enumerate(specs):
            for d in range(self.dim):
                self.touch[b, d, 0] = sp.lo[d] == 0
                self.touch[b, d, 1] = sp.lo[d] + sp.ncell[d] == self.dom_ncell[d]
        # coarse-cell owner grid (boxes are r-aligned with r-multiple sizes)
        ncc = cfg.geom.ncell
        self.owner_c = -np.ones(ncc, np.int32)
        for b, sp in enumerate(specs):
            self.owner_c[
                tuple(
                    slice(sp.crse_lo[d], sp.crse_lo[d] + sp.crse_ncell[d])
                    for d in range(self.dim)
                )
            ] = b
        self._cell_maps: Dict[int, Dict] = {}
        self._face_maps: Dict[Tuple[int, int], Dict] = {}
        self._scatter_idx: Dict[Tuple, np.ndarray] = {}
        self._dbg_last_fill = None

    # ------------------------------------------------------------------
    # coordinate helpers (numpy, trace-time)

    def _global_coords(self, ng: int, face_dim: Optional[int] = None):
        """Per-box global fine coords of the grown window, per dim:
        list of int arrays [nbox, bshape_d + 2ng (+1 if face_dim==d)]."""
        out = []
        for d in range(self.dim):
            n = self.bshape[d] + (1 if face_dim == d else 0)
            g = self.lo[:, d:d + 1] + np.arange(-ng, n + ng)[None, :]
            out.append(g)
        return out

    def _wrap(self, g, d, extent):
        """Periodic wrap / clamp of global coords to [0, extent)."""
        if self.periodic[d]:
            return np.mod(g, extent)
        return np.clip(g, 0, extent - 1)

    def _flat_idx(self, coords, shape):
        """Flatten per-dim [nbox, m_d] coords into [nbox, prod(m)] int32."""
        nbox = coords[0].shape[0]
        idx = np.zeros((nbox,) + tuple(c.shape[1] for c in coords), np.int64)
        stride = 1
        for d in reversed(range(len(shape))):
            sh = [nbox] + [1] * len(shape)
            sh[1 + d] = coords[d].shape[1]
            idx = idx + coords[d].reshape(sh) * stride
            stride *= shape[d]
        return idx.reshape(nbox, -1).astype(np.int32)

    # ------------------------------------------------------------------
    # fill maps

    def cell_maps(self, ng: int) -> Dict:
        """Maps for the cell-centered ghost fill at width ng."""
        if ng in self._cell_maps:
            return self._cell_maps[ng]
        dim = self.dim
        gshape = tuple(n + 2 * ng for n in self.bshape)
        gc = self._global_coords(ng)
        # in-domain global coords (wrapped periodic / clamped else; clamped
        # cells are overwritten by the physical fill anyway)
        gw = [self._wrap(gc[d], d, self.dom_ncell[d]) for d in range(dim)]
        # sibling ownership: owner of the COARSE parent covers the fine cell
        # (joint owner lookup: build [nbox, *gshape] by fancy indexing)
        cidx = [gw[d] // self.r for d in range(dim)]
        own = np.empty((self.nbox,) + gshape, np.int32)
        for b in range(self.nbox):
            own[b] = self.owner_c[np.ix_(*[cidx[d][b] for d in range(dim)])]
        # out-of-domain (non-periodic, unclamped original coord outside):
        # nobody owns those ghosts
        for d in range(dim):
            if not self.periodic[d]:
                bad = (gc[d] < 0) | (gc[d] >= self.dom_ncell[d])
                sh = [self.nbox] + [1] * dim
                sh[1 + d] = gshape[d]
                own = np.where(bad.reshape(sh), -1, own)
        cover = own >= 0
        # flat source index into batch.reshape(nbox * prod(bshape))
        bcells = int(np.prod(self.bshape))
        local = np.zeros((self.nbox,) + gshape, np.int64)
        stride = 1
        for d in reversed(range(dim)):
            sh = [self.nbox] + [1] * dim
            sh[1 + d] = gshape[d]
            # local coord within the owner box along d
            lo_owner = np.where(own >= 0, self.lo[np.maximum(own, 0), d], 0)
            # build full-rank global coord along d
            gd = np.broadcast_to(gw[d].reshape(sh), own.shape)
            local = local + (gd - lo_owner) * stride
            stride *= self.bshape[d]
        src = np.where(cover, np.maximum(own, 0).astype(np.int64) * bcells
                       + local, 0).astype(np.int32)
        # coarse windows with 1 margin cell beyond slope support so the
        # prolonged values match a level-wide (bbox) FillPatch exactly
        ngc = (ng + self.r - 1) // self.r + 1
        cw = []
        for d in range(dim):
            base = self.lo[:, d:d + 1] // self.r
            idx = base + np.arange(-ngc, self.bshape[d] // self.r + ngc)[None]
            cw.append(self._wrap(idx, d, self.cfg.geom.ncell[d]))
        cwin_idx = self._flat_idx(cw, self.cfg.geom.ncell)
        cwin_shape = tuple(c.shape[1] for c in cw)
        phase = ngc * self.r - ng  # fine offset of the grown window in the
        # prolonged window
        m = {
            "ng": ng,
            "gshape": gshape,
            "cover": jnp.asarray(cover),
            "src": jnp.asarray(src),
            "cwin_idx": jnp.asarray(cwin_idx),
            "cwin_shape": cwin_shape,
            "phase": phase,
        }
        self._cell_maps[ng] = m
        return m

    def face_maps(self, fd: int, ngt: int = 1) -> Dict:
        """Maps for the MAC face fill: faces normal to fd, grown by ngt in
        every TRANSVERSE dim (create_umac_grown) and by 1 in the normal dim
        (the extra normal faces feed the conservative d(umac)/dx ghost
        terms so box seams stay flux-consistent with a level-wide array)."""
        key = (fd, ngt)
        if key in self._face_maps:
            return self._face_maps[key]
        dim = self.dim
        r = self.r
        # grown face-window coords: normal dim has bshape+1 faces grown by 1
        # (ng_norm=1), transverse dims grown by ngt cells
        gshape = tuple(
            (self.bshape[d] + 1 + 2 if d == fd else self.bshape[d] + 2 * ngt)
            for d in range(dim)
        )
        gcs = []
        for d in range(dim):
            if d == fd:
                g = self.lo[:, d:d + 1] + np.arange(-1, self.bshape[d] + 2)[None]
            else:
                g = self.lo[:, d:d + 1] + np.arange(
                    -ngt, self.bshape[d] + ngt
                )[None]
            gcs.append(g)
        nfaces_dom = tuple(
            self.dom_ncell[d] + (1 if d == fd else 0) for d in range(dim)
        )
        # face ownership: a face belongs to box b if it is a face OF b
        # (normal coord in [lo, lo+n], transverse in [lo, lo+n)); seam faces
        # shared by two boxes carry identical data so either owner works.
        # Use the coarse owner grid of the adjacent cells.
        gw = []
        for d in range(dim):
            ext = nfaces_dom[d] if (d == fd and not self.periodic[d]) else \
                self.dom_ncell[d]
            if d == fd and self.periodic[d]:
                gw.append(np.mod(gcs[d], self.dom_ncell[d]))
            elif d == fd:
                gw.append(np.clip(gcs[d], 0, self.dom_ncell[d]))
            else:
                gw.append(self._wrap(gcs[d], d, self.dom_ncell[d]))
        # owner via the cell on the LO side of the face (clamped), else the
        # HI side — a face is in the batch if either adjacent cell is owned
        # by a box whose face set contains it
        own = np.full((self.nbox,) + gshape, -1, np.int32)
        for off in (0, -1):  # cell at face+off along fd
            cidx = []
            for d in range(dim):
                if d == fd:
                    c = gw[d] + off
                    if self.periodic[d]:
                        c = np.mod(c, self.dom_ncell[d])
                    else:
                        c = np.clip(c, 0, self.dom_ncell[d] - 1)
                    cidx.append(c // r)
                else:
                    cidx.append(gw[d] // r)
            cand = np.empty((self.nbox,) + gshape, np.int32)
            for b in range(self.nbox):
                cand[b] = self.owner_c[np.ix_(*[cidx[d][b] for d in range(dim)])]
            own = np.where(own < 0, cand, own)
        # out-of-domain invalidation (non-periodic)
        for d in range(dim):
            if not self.periodic[d]:
                ext = nfaces_dom[d] if d == fd else self.dom_ncell[d]
                bad = (gcs[d] < 0) | (gcs[d] >= ext)
                sh = [self.nbox] + [1] * dim
                sh[1 + d] = gshape[d]
                own = np.where(bad.reshape(sh), -1, own)
        cover = own >= 0
        bfaces = int(np.prod([self.bshape[d] + (1 if d == fd else 0)
                              for d in range(dim)]))
        local = np.zeros((self.nbox,) + gshape, np.int64)
        stride = 1
        for d in reversed(range(dim)):
            sh = [self.nbox] + [1] * dim
            sh[1 + d] = gshape[d]
            lo_owner = np.where(own >= 0, self.lo[np.maximum(own, 0), d], 0)
            gd = np.broadcast_to(gw[d].reshape(sh), own.shape)
            loc = gd - lo_owner
            n_owner = self.bshape[d] + (1 if d == fd else 0)
            loc = np.clip(loc, 0, n_owner - 1)
            local = local + loc * stride
            stride *= self.bshape[d] + (1 if d == fd else 0)
        src = np.where(cover, np.maximum(own, 0).astype(np.int64) * bfaces
                       + local, 0).astype(np.int32)
        # coarse face windows (normal: linear interp nodes c0/c0+1; the
        # gather takes a window with margin and interpolates in-device)
        ngc = 2
        cw = []
        for d in range(dim):
            base = self.lo[:, d:d + 1] // r
            if d == fd:
                idx = base + np.arange(
                    -ngc, self.bshape[d] // r + 1 + ngc
                )[None]
                ext = self.cfg.geom.ncell[d] + 1
                if self.periodic[d]:
                    idx = np.mod(idx, self.cfg.geom.ncell[d])
                else:
                    idx = np.clip(idx, 0, ext - 1)
            else:
                idx = base + np.arange(-ngc, self.bshape[d] // r + ngc)[None]
                idx = self._wrap(idx, d, self.cfg.geom.ncell[d])
            cw.append(idx)
        cshape = tuple(
            self.cfg.geom.ncell[d] + (1 if d == fd else 0) for d in range(dim)
        )
        cwin_idx = self._flat_idx(cw, cshape)
        cwin_shape = tuple(c.shape[1] for c in cw)
        m = {
            "fd": fd,
            "ngt": ngt,
            "gshape": gshape,
            "cover": jnp.asarray(cover),
            "src": jnp.asarray(src),
            "cwin_idx": jnp.asarray(cwin_idx),
            "cwin_shape": cwin_shape,
            "ngc": ngc,
        }
        self._face_maps[key] = m
        return m

    # ------------------------------------------------------------------
    # bbox scatter/gather

    def _bbox_flat_idx(self, face_dim=None, node=False) -> np.ndarray:
        key = (face_dim, node)
        if key in self._scatter_idx:
            return self._scatter_idx[key]
        dim = self.dim
        bshape = tuple(
            self.bshape[d] + (1 if (node or face_dim == d) else 0)
            for d in range(dim)
        )
        ushape = tuple(
            self.bbox.ncell[d] + (1 if (node or face_dim == d) else 0)
            for d in range(dim)
        )
        coords = []
        for d in range(dim):
            off = self.lo[:, d:d + 1] - self.bbox.lo[d]
            coords.append(off + np.arange(bshape[d])[None])
        idx = self._flat_idx(coords, ushape)
        self._scatter_idx[key] = idx
        return idx

    def scatter_bbox(self, batch, background=None, face_dim=None, node=False):
        """[nbox, ...] batch -> bbox array; holes from `background`
        (default zeros). Shared seam faces/nodes carry identical data from
        either writer."""
        dim = self.dim
        ushape = tuple(
            self.bbox.ncell[d] + (1 if (node or face_dim == d) else 0)
            for d in range(dim)
        )
        idx = jnp.asarray(self._bbox_flat_idx(face_dim, node))
        if background is None:
            out = jnp.zeros(ushape, batch.dtype)
        else:
            out = background.astype(batch.dtype)
        out = out.reshape(-1).at[idx.reshape(-1)].set(
            batch.reshape(-1), mode="drop"
        )
        return out.reshape(ushape)

    def gather_bbox(self, u, face_dim=None, node=False):
        """bbox array -> [nbox, ...] batch."""
        dim = self.dim
        bshape = tuple(
            self.bshape[d] + (1 if (node or face_dim == d) else 0)
            for d in range(dim)
        )
        idx = jnp.asarray(self._bbox_flat_idx(face_dim, node))
        return u.reshape(-1)[idx].reshape((self.nbox,) + bshape)

    # ------------------------------------------------------------------
    # the batched fills

    def _prolong_windows(self, crse, m):
        """Gather per-box coarse windows and prolong them; returns the
        [nbox, bshape+2ng] fine background (cell centering)."""
        from iamr_tpu.amr.hierarchy import prolong_cell

        win = crse.reshape(-1)[m["cwin_idx"]].reshape(
            (self.nbox,) + m["cwin_shape"]
        )
        fine = jax.vmap(lambda w: prolong_cell(w, self.r))(win)
        ph = m["phase"] + self.r  # +r for the 1-cell slope margin
        sl_ = tuple(
            slice(ph, ph + m["gshape"][d]) for d in range(self.dim)
        )
        return fine[(slice(None),) + sl_]

    def fill_cell(self, batch, ng: int, crse_cc, bcrec: BCRec,
                  vals_lo=None, vals_hi=None):
        """Batched FillPatch: [nbox, *bshape] -> [nbox, *(bshape+2ng)].

        Priority (reference FillPatchIterator): own/sibling interior data
        where a box covers the ghost cell, else coarse interpolation of
        crse_cc, then physical BC slabs on domain-touching sides."""
        m = self.cell_maps(ng)
        bg = self._prolong_windows(crse_cc, m).astype(batch.dtype)
        sib = batch.reshape(-1)[m["src"]]
        g = jnp.where(m["cover"], sib, bg)
        # physical sides, dim-sequential like core.fill.fill_ghost
        dim = self.dim
        vals_lo = vals_lo or (0.0,) * dim
        vals_hi = vals_hi or (0.0,) * dim
        for d in range(dim):
            for side in (0, 1):
                bk = bcrec.lo[d] if side == 0 else bcrec.hi[d]
                if bk == MathBC.int_dir:
                    continue
                tmask = self.touch[:, d, side]
                if not tmask.any():
                    continue
                interior = g[
                    (slice(None),) + tuple(
                        slice(ng, g.shape[1 + e] - ng) if e == d
                        else slice(None) for e in range(dim)
                    )
                ]
                val = (vals_lo if side == 0 else vals_hi)[d]
                # batched slab: _ghost_block is pure slicing -> vmap
                slab = jax.vmap(
                    lambda a: _ghost_block(a, d, side, ng, bk, val)
                )(interior)
                idx = [slice(None)] * dim
                idx[d] = slice(0, ng) if side == 0 else slice(
                    g.shape[1 + d] - ng, None
                )
                sel = jnp.asarray(tmask).reshape((self.nbox,) + (1,) * dim)
                cur = g[(slice(None),) + tuple(idx)]
                g = g.at[(slice(None),) + tuple(idx)].set(
                    jnp.where(sel, slab, cur)
                )
        return g

    def _face_background(self, crse_face, m):
        """Coarse MAC faces interpolated onto the grown per-box face window
        (face_linear_interp: linear in the normal dim, pc transverse)."""
        fd = m["fd"]
        win = crse_face.reshape(-1)[m["cwin_idx"]].reshape(
            (self.nbox,) + m["cwin_shape"]
        )
        r = self.r
        ngc = m["ngc"]

        def interp(w):
            out = w
            for d in range(self.dim):
                if d == fd:
                    # fine faces at window offset: normal grown by 1 =>
                    # global faces lo-1 .. lo+n+1; window starts at
                    # (lo//r - ngc) coarse faces
                    nfine = m["gshape"][d]
                    gloc = np.arange(-1, nfine - 1) + ngc * r
                    c0 = gloc // r
                    wgt = (gloc - c0 * r) / r
                    c1 = np.minimum(c0 + 1, out.shape[d] - 1)
                    a = jnp.take(out, jnp.asarray(c0), axis=d)
                    bb = jnp.take(out, jnp.asarray(c1), axis=d)
                    sh = [1] * self.dim
                    sh[d] = nfine
                    out = a + (bb - a) * jnp.asarray(wgt, out.dtype).reshape(sh)
                else:
                    nfine = m["gshape"][d]
                    gloc = np.arange(-m["ngt"], nfine - m["ngt"]) + ngc * r
                    j = gloc // r
                    out = jnp.take(out, jnp.asarray(j), axis=d)
            return out

        return jax.vmap(interp)(win)

    def fill_umac(self, ubatch, fd: int, crse_umac_d=None):
        """Batched create_umac_grown for MAC component fd:
        [nbox, faces] -> grown by 1 transverse cell AND 1 normal face on
        each side. Sibling faces from the batch; C-F from the parent's
        face-linear interp (or edge copies when crse_umac_d is None);
        physical sides follow grow_umac_transverse (periodic handled by
        the wrap in the maps; non-periodic edge-copy applied per touch)."""
        m = self.face_maps(fd)
        if crse_umac_d is not None:
            bg = self._face_background(crse_umac_d, m).astype(ubatch.dtype)
        else:
            bg = None
        sib = ubatch.reshape(-1)[m["src"]]
        if bg is None:
            g = jnp.where(m["cover"], sib, 0.0)
        else:
            g = jnp.where(m["cover"], sib, bg)
        # non-periodic domain sides: edge-copy rows (foextrap weights only);
        # normal-dim domain faces beyond the boundary replicate the boundary
        # face (they are never real faces)
        dim = self.dim
        for d in range(dim):
            if self.periodic[d]:
                continue
            ngd = 1 if d == fd else m["ngt"]
            for side in (0, 1):
                tmask = self.touch[:, d, side]
                if not tmask.any():
                    continue
                sel = jnp.asarray(tmask).reshape((self.nbox,) + (1,) * dim)
                if side == 0:
                    src = g[(slice(None),) + tuple(
                        slice(ngd, ngd + 1) if e == d else slice(None)
                        for e in range(dim)
                    )]
                    dst = tuple(
                        slice(0, ngd) if e == d else slice(None)
                        for e in range(dim)
                    )
                else:
                    nn = g.shape[1 + d]
                    src = g[(slice(None),) + tuple(
                        slice(nn - ngd - 1, nn - ngd) if e == d
                        else slice(None) for e in range(dim)
                    )]
                    dst = tuple(
                        slice(nn - ngd, None) if e == d else slice(None)
                        for e in range(dim)
                    )
                cur = g[(slice(None),) + dst]
                g = g.at[(slice(None),) + dst].set(
                    jnp.where(sel, jnp.broadcast_to(src, cur.shape), cur)
                )
        return g


# ---------------------------------------------------------------------------
# Stage-A execution: per-box windowed hyperbolic phases of a UNION advance
# ---------------------------------------------------------------------------


def grow_umac_normal_union(umac, periodic: Sequence[bool]):
    """MAC components grown by one face on each side of their OWN dim,
    reproducing exactly the union advance's d(umac)/dx ghost-row rule
    (ops/godunov.py compute_edge_states): periodic dims wrap the true
    faces; non-periodic sides linearly extrapolate so the per-box ghost
    dudx equals the union's edge-copied dudx:
    (u0 - u_pad)/dx == (u1 - u0)/dx  =>  u_pad = 2 u0 - u1."""

    def _take(u, d, j):
        return jnp.take(u, jnp.asarray([j]), axis=d)

    out = []
    for d, u in enumerate(umac):
        n = u.shape[d]
        if periodic[d]:
            lo = _take(u, d, n - 2)
            hi = _take(u, d, 1)
        else:
            lo = 2.0 * _take(u, d, 0) - _take(u, d, 1)
            hi = 2.0 * _take(u, d, n - 1) - _take(u, d, n - 2)
        out.append(jnp.concatenate([lo, u, hi], axis=d))
    return tuple(out)


class UnionBoxExec:
    """Executes the hyperbolic phases (Godunov extrap + advection) of a
    union-bbox advance per CONGRUENT box instead of over the whole bounding
    box: FLOPs scale with sum(box volumes), program size is independent of
    nbox (one gather -> one vmapped kernel -> one scatter), and the results
    are bitwise those of the bbox-wide computation because every per-box
    window carries the identical bbox data (stencil support ng=3 is inside
    the window).

    The reference's execution model is exactly this: amrex iterates
    Godunov/HydroUtils kernels box-by-box over the level's BoxArray
    (MFIter; Docs Software.rst:356-401) while MLMG couples the level
    globally — here the elliptic solves stay on the masked union
    (ops/mg.py interior_mask), as advance() already does.

    Boxes are grouped by their domain-touch pattern so each group's vmapped
    extrap gets the right static BCRec (physical sides on touching boxes,
    int_dir elsewhere — the same masking CoarseFineBCProvider applies to
    C-F sides). advect_field takes no BCRec, so advection runs as ONE
    all-box vmap.
    """

    def __init__(self, crse_geom, specs: Sequence[LevelSpec],
                 bbox: Optional[LevelSpec] = None):
        assert congruent(specs), "box batch requires congruent boxes"
        self.specs = tuple(specs)
        self.nbox = len(specs)
        self.dim = specs[0].dim
        self.r = specs[0].ratio
        self.bshape = tuple(specs[0].ncell)
        self.bbox = bbox if bbox is not None else union_bbox_spec(specs)
        self.dom_ncell = tuple(
            crse_geom.ncell[d] * self.r for d in range(self.dim)
        )
        self.per_crse = tuple(bool(p) for p in crse_geom.periodic)
        self._solvers: Dict = {}
        # route the union elliptic solves through the batched MG
        # (ops/mg_batch.py / ops/mg_nodal_batch.py); bitwise-parity tests
        # against the masked-union path switch this off
        self.solve_elliptic = True
        self.off = np.array(
            [[sp.lo[d] - self.bbox.lo[d] for d in range(self.dim)]
             for sp in specs], np.int32,
        )
        # group boxes by domain-touch pattern (static per group)
        groups: Dict[Tuple, List[int]] = {}
        for b, sp in enumerate(specs):
            pat = tuple(
                (sp.lo[d] == 0, sp.lo[d] + sp.ncell[d] == self.dom_ncell[d])
                for d in range(self.dim)
            )
            groups.setdefault(pat, []).append(b)
        self.groups = {k: tuple(v) for k, v in groups.items()}
        self._sel_cache: Dict = {}

    # -- window selectors ---------------------------------------------------

    def _sel(self, lengths: Tuple[int, ...], idxs: Tuple[int, ...]):
        """Advanced-index selector for per-box windows: window along d
        starts at off[b, d] in array coords for ANY ghost width (the array's
        ghost offset cancels the window's)."""
        key = (lengths, idxs)
        if key in self._sel_cache:
            return self._sel_cache[key]
        nb = len(idxs)
        sel = []
        for d in range(self.dim):
            i = self.off[list(idxs), d][:, None] + np.arange(
                lengths[d], dtype=np.int32
            )[None]
            sh = [nb] + [1] * self.dim
            sh[1 + d] = lengths[d]
            sel.append(jnp.asarray(i.reshape(sh)))
        sel = tuple(sel)
        self._sel_cache[key] = sel
        return sel

    def _lengths(self, ng=0, face_dim=None, gn=0, gt=0):
        return tuple(
            self.bshape[d]
            + (1 + 2 * gn if d == face_dim else 0)
            + (2 * ng if face_dim is None else 0)
            + (2 * gt if face_dim is not None and d != face_dim else 0)
            for d in range(self.dim)
        )

    def gather_cc(self, a, ng: int, idxs, lead: int = 0):
        """[lead..., bbox cells + 2ng] -> [nb, lead..., bshape + 2ng]."""
        sel = self._sel(self._lengths(ng=ng), idxs)
        out = a[(slice(None),) * lead + sel]
        return jnp.swapaxes(out, 0, 1) if lead else out

    def gather_face(self, u, fd: int, idxs, gn: int = 0, gt: int = 0):
        """Face-array windows (normal faces grown by gn, transverse cells
        by gt — matching the array's own ghosts)."""
        sel = self._sel(self._lengths(face_dim=fd, gn=gn, gt=gt), idxs)
        return u[sel]

    def scatter_cc(self, vals, idxs, target):
        sel = self._sel(self._lengths(), idxs)
        return target.at[sel].set(vals)

    def scatter_face(self, vals, fd: int, idxs, target):
        """Seam faces are written by both owners with bitwise-identical
        values (same window data, same arithmetic), so duplicate scatter
        indices are harmless."""
        sel = self._sel(self._lengths(face_dim=fd), idxs)
        return target.at[sel].set(vals)

    # -- batched phases -------------------------------------------------

    @staticmethod
    def _mask_rec(rec: BCRec, pat) -> BCRec:
        lo = tuple(
            rec.lo[d] if pat[d][0] else MathBC.int_dir for d in range(len(rec.lo))
        )
        hi = tuple(
            rec.hi[d] if pat[d][1] else MathBC.int_dir for d in range(len(rec.hi))
        )
        return BCRec(lo=lo, hi=hi)

    def extrap_batched(self, vel_g, force_g, dt, dx, recs_u, bl, bh,
                       scheme: str, use_forces_in_trans: bool):
        """Per-box Godunov ExtrapVelToFaces over the union arrays; returns
        bbox-shaped MAC faces (holes zero — the MAC projection's masked
        union solve overwrites/ignores them exactly as with the bbox-wide
        extrap)."""
        from iamr_tpu.ops.godunov import extrap_vel_to_faces

        dim = self.dim
        umac = [
            jnp.zeros(
                tuple(
                    self.bbox.ncell[e] + (1 if e == d else 0)
                    for e in range(dim)
                ),
                vel_g.dtype,
            )
            for d in range(dim)
        ]
        for pat, idxs in self.groups.items():
            vg = self.gather_cc(vel_g, 3, idxs, lead=1)
            fg = self.gather_cc(force_g, 1, idxs, lead=1)
            recs_b = [self._mask_rec(recs_u[c], pat) for c in range(dim)]

            def _one(v, f, _recs=recs_b):
                return extrap_vel_to_faces(
                    v, f, dt, dx, self.bshape, _recs, bl, bh,
                    use_forces_in_trans=use_forces_in_trans, scheme=scheme,
                    fused=False,
                )

            outs = jax.vmap(_one)(vg, fg)
            for d in range(dim):
                umac[d] = self.scatter_face(outs[d], d, idxs, umac[d])
        return tuple(umac)

    def advect_batched(self, s_g, umac, umac_g, umac_n, dt, dx,
                       iconserv: bool, s_cc=None, force_g=None,
                       scheme: str = "plm"):
        """Per-box advect_field over the union arrays. umac_n comes from
        grow_umac_normal_union so the conservative d(umac)/dx term matches
        the bbox-wide rule bitwise. Returns (bbox fluxes, bbox aofs)."""
        from iamr_tpu.ops.godunov import advect_field

        dim = self.dim
        idxs = tuple(range(self.nbox))
        sgb = self.gather_cc(s_g, 3, idxs)
        ub = tuple(self.gather_face(umac[d], d, idxs) for d in range(dim))
        ugb = tuple(
            self.gather_face(umac_g[d], d, idxs, gt=1) for d in range(dim)
        )
        unb = tuple(
            self.gather_face(umac_n[d], d, idxs, gn=1) for d in range(dim)
        )
        sccb = None if s_cc is None else self.gather_cc(s_cc, 0, idxs)
        fgb = None if force_g is None else self.gather_cc(force_g, 1, idxs)

        def _one(sg, u, ug, un, scc, fg):
            return advect_field(
                sg, u, ug, dt, dx, self.bshape, iconserv, s_cc=scc,
                force_g=fg, periodic=None, scheme=scheme, umac_gn=un,
            )

        in_axes = (0, 0, 0, 0, None if sccb is None else 0,
                   None if fgb is None else 0)
        fl, aofs = jax.vmap(_one, in_axes=in_axes)(
            sgb, ub, ugb, unb, sccb, fgb
        )
        fluxes = tuple(
            self.scatter_face(
                fl[d], d, idxs,
                jnp.zeros(
                    tuple(
                        self.bbox.ncell[e] + (1 if e == d else 0)
                        for e in range(dim)
                    ),
                    s_g.dtype,
                ),
            )
            for d in range(dim)
        )
        a_out = self.scatter_cc(
            aofs, idxs, jnp.zeros(tuple(self.bbox.ncell), s_g.dtype)
        )
        return fluxes, a_out


# ---------------------------------------------------------------------------
# Stage-B execution: the union advance's ELLIPTIC solves run on the batch
# ---------------------------------------------------------------------------
# The masked-union MG (ops/mg.py interior_mask, ops/mg_nodal.py) solves the
# right system but pays O(bbox) memory and FLOPs per V-cycle. These adapters
# gather the same system onto the congruent box batch, solve with the
# batched MG (ops/mg_batch.py, ops/mg_nodal_batch.py — every MG depth stays
# [nbox, ...]-sized, the reference's MLMG-over-BoxArray execution), and
# scatter the solution back into the bbox array with holes carrying the
# interior Dirichlet data, exactly mg_solve's union return convention.


def _bbox_solver_geometry(bexec: "UnionBoxExec"):
    """(periodic, touch) of the boxes within the BBOX index space."""
    dim = bexec.dim
    per = tuple(
        bexec.per_crse[d]
        and bexec.bbox.lo[d] == 0
        and bexec.bbox.ncell[d] == bexec.dom_ncell[d]
        for d in range(dim)
    )
    touch = np.zeros((bexec.nbox, dim, 2), bool)
    for b in range(bexec.nbox):
        for d in range(dim):
            touch[b, d, 0] = bexec.off[b, d] == 0
            touch[b, d, 1] = (
                bexec.off[b, d] + bexec.bshape[d] == bexec.bbox.ncell[d]
            )
    return per, touch


def _batch_bvals(bexec: "UnionBoxExec", bvals, idxs):
    """Per-box windows of bbox-boundary bval data (scalars pass through)."""
    if not bvals:
        return bvals
    out = {}
    for (d, side), v in bvals.items():
        va = jnp.asarray(v)
        if va.ndim == 0:
            out[(d, side)] = va
            continue
        # boundary-slab array over the transverse dims of the bbox (with
        # or without a kept singleton at d)
        if va.ndim == bexec.dim:
            va = jnp.squeeze(va, axis=d)
        sel = []
        tds = [e for e in range(bexec.dim) if e != d]
        for j, e in enumerate(tds):
            i = bexec.off[list(idxs), e][:, None] + np.arange(
                bexec.bshape[e], dtype=np.int32
            )[None]
            sh = [len(idxs)] + [1] * len(tds)
            sh[1 + j] = bexec.bshape[e]
            sel.append(jnp.asarray(i.reshape(sh)))
        vb = va[tuple(sel)]
        # the ghost slab in the padded batch spans bs+2 transversely; pad
        # with zeros — corner ghosts never enter the 7-point stencil of any
        # interior cell (mg._boundary_lift skips them too)
        vb = jnp.pad(vb, [(0, 0)] + [(1, 1)] * len(tds))
        out[(d, side)] = jnp.expand_dims(vb, axis=1 + d)
    return out


def _solve_cell_batched(
    bexec: "UnionBoxExec", rhs_u, alpha_u, beta_u, a, b, dx, bc, bvals,
    interior_vals, phi0=None, rtol=1e-11, atol=0.0, fixed_cycles=None,
):
    """Batched replacement for mg_solve(..., interior_mask, interior_vals)
    on a congruent union level. Returns (phi_bbox, res, iters) with hole
    cells = interior_vals (mg_solve's finalize convention)."""
    from iamr_tpu.ops.mg_batch import BatchPoisson

    dim = bexec.dim
    key = ("cell", tuple(bc.lo), tuple(bc.hi))
    if key not in bexec._solvers:
        per, touch = _bbox_solver_geometry(bexec)
        bexec._solvers[key] = BatchPoisson(
            bexec.off, bexec.bshape, tuple(bexec.bbox.ncell), per, bc, touch
        )
    bp = bexec._solvers[key]
    idxs = tuple(range(bexec.nbox))
    rhs_b = bexec.gather_cc(rhs_u, 0, idxs)
    alpha_b = bexec.gather_cc(alpha_u, 0, idxs)
    beta_b = tuple(bexec.gather_face(beta_u[d], d, idxs) for d in range(dim))
    # gather_cc(ng=1) expects an array WITH a 1-ghost ring (the offsets
    # cancel); interior_vals is plain bbox-shaped, so pad it first (edge
    # values beyond the bbox are never read: those ghosts are physical)
    iv_g = jnp.pad(interior_vals.astype(rhs_u.dtype),
                   [(1, 1)] * dim, mode="edge")
    cf = bexec.gather_cc(iv_g, 1, idxs)
    phi0_b = None if phi0 is None else bexec.gather_cc(phi0, 0, idxs)
    bv_b = _batch_bvals(bexec, bvals, idxs)
    phi_b, it, res = bp.solve(
        rhs_b, alpha_b, beta_b, a, b, dx, phi0=phi0_b, cf_ghosts=cf,
        bvals=bv_b, rtol=rtol, atol=atol, fixed_cycles=fixed_cycles,
    )
    out = bexec.scatter_cc(phi_b, idxs, interior_vals.astype(rhs_u.dtype))
    return out, res, it


def _gather_nodes_padded(bexec: "UnionBoxExec", a_nodes, idxs, pad: int):
    """Per-box node windows grown by `pad`, clamped at the bbox edge."""
    dim = bexec.dim
    sel = []
    for d in range(dim):
        nn = bexec.bbox.ncell[d] + 1
        i = bexec.off[list(idxs), d][:, None] + np.arange(
            -pad, bexec.bshape[d] + 1 + pad, dtype=np.int32
        )[None]
        i = np.clip(i, 0, nn - 1)
        sh = [len(idxs)] + [1] * dim
        sh[1 + d] = bexec.bshape[d] + 1 + 2 * pad
        sel.append(jnp.asarray(i.reshape(sh)))
    return a_nodes[tuple(sel)]


def _solve_nodal_batched(
    bexec: "UnionBoxExec", rhs_nodes, sigma_u, dx, bc, phi_bc=None,
    phi0=None, rtol=1e-11, atol=1e-16, fixed_cycles=None,
):
    """Batched replacement for nodal_solve(..., interior_mask=nodemask,
    phi_bc) on a congruent union level: bbox-boundary nodes and any node
    with an uncovered adjacent cell are Dirichlet-pinned to phi_bc
    (UnionBCProvider.nodemask semantics). Returns (phi_bbox, res, iters)
    with non-box nodes carrying phi_bc."""
    from iamr_tpu.ops.mg_nodal_batch import BatchNodal

    dim = bexec.dim
    key = ("nodal", tuple(bc.lo), tuple(bc.hi))
    if key not in bexec._solvers:
        per, touch = _bbox_solver_geometry(bexec)
        # the union nodemask pins every bbox-boundary node (mp padded 0)
        pin = np.zeros(
            (bexec.nbox,) + tuple(n + 1 for n in bexec.bshape), bool
        )
        for b in range(bexec.nbox):
            for d in range(dim):
                if touch[b, d, 0]:
                    idx = [slice(None)] * dim
                    idx[d] = slice(0, 1)
                    pin[(b,) + tuple(idx)] = True
                if touch[b, d, 1]:
                    idx = [slice(None)] * dim
                    idx[d] = slice(-1, None)
                    pin[(b,) + tuple(idx)] = True
        bexec._solvers[key] = BatchNodal(
            bexec.off, bexec.bshape, tuple(bexec.bbox.ncell), per, bc,
            extra_pin=pin,
        )
    bn = bexec._solvers[key]
    idxs = tuple(range(bexec.nbox))
    rhs_b = _gather_nodes_padded(bexec, rhs_nodes, idxs, 0)
    sigma_b = bexec.gather_cc(sigma_u, 0, idxs)
    g_pad = None
    bg = jnp.zeros(tuple(n + 1 for n in bexec.bbox.ncell), rhs_nodes.dtype)
    if phi_bc is not None:
        g_pad = _gather_nodes_padded(
            bexec, phi_bc.astype(rhs_nodes.dtype), idxs, 1
        )
        bg = phi_bc.astype(rhs_nodes.dtype)
    phi0_b = None if phi0 is None else _gather_nodes_padded(
        bexec, phi0, idxs, 0
    )
    phi_b, it, res = bn.solve(
        rhs_b, sigma_b, dx, phi0=phi0_b, g_pad=g_pad, rtol=rtol, atol=atol,
        fixed_cycles=fixed_cycles,
    )
    # scatter nodes (duplicated seam copies carry equal values)
    nsel = []
    for d in range(dim):
        i = bexec.off[list(idxs), d][:, None] + np.arange(
            bexec.bshape[d] + 1, dtype=np.int32
        )[None]
        sh = [len(idxs)] + [1] * dim
        sh[1 + d] = bexec.bshape[d] + 1
        nsel.append(jnp.asarray(i.reshape(sh)))
    out = bg.at[tuple(nsel)].set(phi_b)
    return out, res, it


UnionBoxExec.solve_cell = _solve_cell_batched
UnionBoxExec.solve_nodal = _solve_nodal_batched
