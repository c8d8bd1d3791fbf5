"""Boundary-condition providers: the FillPatch / coarse-fine-BC seam.

The reference separates "how ghost cells get filled" (FillPatchIterator with
physical BndryFuncs at the domain, coarse-fine interpolation inside,
NavierStokes.cpp:719-729) from the timestep logic. Here the same seam is a
provider object consumed by advance():

  * PhysBCProvider — single/coarsest level: physical-domain fills (ghost
    pads per NS_BC.H tables, ext_dir values from the inputs).
  * CoarseFineBCProvider — fine patch: ghosts interpolated from the parent
    level (fill_patch_from_coarse), physical fills on domain-touching sides,
    Dirichlet coarse-fine boundary values for the MAC/diffusion/nodal solves
    (reference MacProj.cpp:1146-1149 setCoarseFineBC, Diffusion.cpp:453-470,
    MLNodeLaplacian coarse-fine Dirichlet).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import LevelSpec, fill_patch_from_coarse, prolong_cell
from iamr_tpu.core.bc import (
    BCRec,
    DomainBC,
    MathBC,
    PhysBC,
    SCALAR_BC,
    TEMP_BC,
    make_bcrec,
    velocity_bcrec,
)
from iamr_tpu.core.fill import _ghost_block, fill_ghost
from iamr_tpu.ops.mg import DIRICHLET, PoissonBC
from iamr_tpu.ops.mg_nodal import N_DIRICHLET, NodalBC
from iamr_tpu.solvers.diffusion import bvals_from_scalar, poisson_bc_from_bcrec
from iamr_tpu.solvers.mac import mac_poisson_bc
from iamr_tpu.solvers.nodal_proj import nodal_bc as make_nodal_bc


class PhysBCProvider:
    """Physical-domain boundary fills (the single-level default)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.dim = cfg.dim
        self._vel_recs = [
            velocity_bcrec(cfg.dom.phys_lo, cfg.dom.phys_hi, c)
            for c in range(self.dim)
        ]
        self._scal_rec = make_bcrec(cfg.dom.phys_lo, cfg.dom.phys_hi, SCALAR_BC)
        self._temp_rec = make_bcrec(cfg.dom.phys_lo, cfg.dom.phys_hi, TEMP_BC)

    # --- ghost fills ------------------------------------------------------
    def vel_bcvals(self, comp):
        lo = tuple(self.cfg.dom.value(d, 0, comp) for d in range(self.dim))
        hi = tuple(self.cfg.dom.value(d, 1, comp) for d in range(self.dim))
        return lo, hi

    def scal_bcvals(self, scomp):
        lo = tuple(self.cfg.dom.value(d, 0, self.dim + scomp) for d in range(self.dim))
        hi = tuple(self.cfg.dom.value(d, 1, self.dim + scomp) for d in range(self.dim))
        return lo, hi

    def fill_vel(self, vel, ng):
        out = []
        for c in range(self.dim):
            lo, hi = self.vel_bcvals(c)
            out.append(fill_ghost(vel[c], ng, self._vel_recs[c], lo, hi))
        return jnp.stack(out)

    def fill_scal(self, s, ng, scomp):
        lo, hi = self.scal_bcvals(scomp)
        return fill_ghost(s, ng, self._scal_rec, lo, hi)

    def fill_force(self, f):
        out = []
        for c in range(self.dim):
            out.append(fill_ghost(f[c], 1, self._vel_recs[c]))
        return jnp.stack(out)

    def temp_bcvals(self):
        comp = self.dim + 1 + self.cfg.ntrac
        lo = tuple(self.cfg.dom.value(d, 0, comp) for d in range(self.dim))
        hi = tuple(self.cfg.dom.value(d, 1, comp) for d in range(self.dim))
        return lo, hi

    def fill_temp(self, s, ng):
        lo, hi = self.temp_bcvals()
        return fill_ghost(s, ng, self._temp_rec, lo, hi)

    def temp_diff_bc(self) -> Tuple[PoissonBC, Dict]:
        rec = self._temp_rec
        lo, hi = self.temp_bcvals()
        return poisson_bc_from_bcrec(rec), bvals_from_scalar(rec, lo, hi, self.dim)

    # --- BC descriptors for the advection face pinning --------------------
    def vel_bcrec(self, comp) -> BCRec:
        return self._vel_recs[comp]

    # --- solver BCs -------------------------------------------------------
    def vel_diff_bc(self, comp) -> Tuple[PoissonBC, Dict]:
        rec = self._vel_recs[comp]
        lo, hi = self.vel_bcvals(comp)
        return poisson_bc_from_bcrec(rec), bvals_from_scalar(rec, lo, hi, self.dim)

    def scal_diff_bc(self, scomp) -> Tuple[PoissonBC, Dict]:
        rec = self._scal_rec
        lo, hi = self.scal_bcvals(scomp)
        return poisson_bc_from_bcrec(rec), bvals_from_scalar(rec, lo, hi, self.dim)

    def mac_bc(self) -> Tuple[PoissonBC, Optional[Dict]]:
        return mac_poisson_bc(self.cfg.dom), None

    def nodal(self) -> Tuple[NodalBC, Optional[jnp.ndarray]]:
        return make_nodal_bc(self.cfg.dom), None

    def grow_umac(self, umac):
        """MAC velocities with one transverse ghost row (create_umac_grown
        single-level semantics, NavierStokesBase.cpp:1092-1107)."""
        from iamr_tpu.ops.godunov import grow_umac_transverse

        return grow_umac_transverse(umac, tuple(self.cfg.geom.periodic))


class CoarseFineBCProvider(PhysBCProvider):
    """Fine-patch provider: ghosts from the parent level, Dirichlet C-F
    solver BCs from parent fields.

    coarse data passed as dicts of arrays at the parent resolution:
      crse_old: {"vel": (dim,*nc), "rho": ..., "trac": ...} at t^n
      crse_new: same at t^{n+1} (for implicit-solve BCs)
      crse_p:   parent nodal pressure (for the fine projection C-F values)
      crse_mac_phi: parent MAC potential (fine MAC solve C-F values)
    """

    def __init__(
        self,
        cfg_fine,
        spec: LevelSpec,
        crse_geom,
        crse_old: Dict,
        crse_new: Dict,
        crse_p=None,
        crse_mac_phi=None,
        crse_umac=None,
    ):
        super().__init__(cfg_fine)
        self.spec = spec
        self.crse_geom = crse_geom
        self.crse_old = crse_old
        self.crse_new = crse_new
        self.crse_p = crse_p
        self.crse_mac_phi = crse_mac_phi
        self.crse_umac = crse_umac
        self.cf_side = {
            (d, s): not spec.touches_domain(crse_geom, d, s)
            for d in range(self.dim)
            for s in (0, 1)
        }

        # on C-F sides the physical BC tables don't apply: mark them int_dir
        # so the advection face-pinning and fill overwrites skip them
        def _mask_cf(rec: BCRec) -> BCRec:
            lo = list(rec.lo)
            hi = list(rec.hi)
            for d in range(self.dim):
                if self.cf_side[(d, 0)]:
                    lo[d] = MathBC.int_dir
                if self.cf_side[(d, 1)]:
                    hi[d] = MathBC.int_dir
            return BCRec(lo=tuple(lo), hi=tuple(hi))

        self._vel_recs = [_mask_cf(r) for r in self._vel_recs]
        self._scal_rec = _mask_cf(self._scal_rec)
        self._temp_rec = _mask_cf(self._temp_rec)

    # --- fills: coarse interpolation + physical overwrite on domain sides -
    def _fill_from(self, fine, crse, ng, bcrec: BCRec, vals_lo, vals_hi):
        g = fill_patch_from_coarse(fine, crse, self.spec, ng)
        for d in range(self.dim):
            for s in (0, 1):
                if self.cf_side[(d, s)]:
                    continue
                # physical side: rebuild that ghost slab from the interior
                interior = g[
                    tuple(
                        slice(ng, g.shape[e] - ng) if e == d else slice(None)
                        for e in range(self.dim)
                    )
                ]
                val = vals_lo[d] if s == 0 else vals_hi[d]
                bk = bcrec.lo[d] if s == 0 else bcrec.hi[d]
                slab = _ghost_block(interior, d, s, ng, bk, val)
                idx = [slice(None)] * self.dim
                idx[d] = slice(0, ng) if s == 0 else slice(g.shape[d] - ng, None)
                g = g.at[tuple(idx)].set(slab)
        return g

    def fill_vel(self, vel, ng):
        out = []
        for c in range(self.dim):
            lo, hi = self.vel_bcvals(c)
            out.append(
                self._fill_from(
                    vel[c], self.crse_old["vel"][c], ng, self._vel_recs[c], lo, hi
                )
            )
        return jnp.stack(out)

    def fill_scal(self, s, ng, scomp):
        crse = (
            self.crse_old["rho"]
            if scomp == 0
            else self.crse_old["trac"][scomp - 1]
        )
        lo, hi = self.scal_bcvals(scomp)
        return self._fill_from(s, crse, ng, self._scal_rec, lo, hi)

    def fill_force(self, f):
        # forces are smooth; first-order extrapolate at C-F sides (the
        # reference fills force ghosts via FillPatch; foextrap is within the
        # O(dx) accuracy of the dt/2 force term)
        out = []
        rec_fo = BCRec(
            lo=(MathBC.foextrap,) * self.dim, hi=(MathBC.foextrap,) * self.dim
        )
        for c in range(self.dim):
            out.append(fill_ghost(f[c], 1, rec_fo))
        return jnp.stack(out)

    # --- coarse-fine values interpolated to the patch boundary ------------
    def _boundary_face_vals(self, crse_cc, d, side):
        """Interpolate a coarse cell field to the fine boundary-face centers
        of patch face (d, side): piecewise-linear via prolongation, sampled
        at the first outside/inside cell average = face value approx."""
        f_bg = fill_patch_from_coarse(
            jnp.zeros(self.spec.ncell, dtype=crse_cc.dtype), crse_cc, self.spec, 1
        )
        # face value ~ average of the cells on both sides of the face
        if side == 0:
            a = f_bg[
                tuple(
                    slice(0, 1) if e == d else slice(1, -1)
                    for e in range(self.dim)
                )
            ]
            b = prolong_cell(crse_cc, self.spec.ratio)[
                tuple(
                    slice(self.spec.lo[e], self.spec.lo[e] + self.spec.ncell[e])
                    if e != d
                    else slice(self.spec.lo[d], self.spec.lo[d] + 1)
                    for e in range(self.dim)
                )
            ]
        else:
            a = f_bg[
                tuple(
                    slice(-1, None) if e == d else slice(1, -1)
                    for e in range(self.dim)
                )
            ]
            b = prolong_cell(crse_cc, self.spec.ratio)[
                tuple(
                    slice(self.spec.lo[e], self.spec.lo[e] + self.spec.ncell[e])
                    if e != d
                    else slice(
                        self.spec.lo[d] + self.spec.ncell[d] - 1,
                        self.spec.lo[d] + self.spec.ncell[d],
                    )
                    for e in range(self.dim)
                )
            ]
        return jnp.squeeze(0.5 * (a + b), axis=d)

    def _with_cf_dirichlet(self, bc: PoissonBC, bvals: Dict, crse_cc) -> Tuple:
        lo = list(bc.lo)
        hi = list(bc.hi)
        bv = dict(bvals) if bvals else {}
        for d in range(self.dim):
            if self.cf_side[(d, 0)]:
                lo[d] = DIRICHLET
                bv[(d, 0)] = self._boundary_face_vals(crse_cc, d, 0)
            if self.cf_side[(d, 1)]:
                hi[d] = DIRICHLET
                bv[(d, 1)] = self._boundary_face_vals(crse_cc, d, 1)
        return PoissonBC(lo=tuple(lo), hi=tuple(hi)), bv

    def vel_diff_bc(self, comp):
        bc, bv = super().vel_diff_bc(comp)
        return self._with_cf_dirichlet(bc, bv, self.crse_new["vel"][comp])

    def scal_diff_bc(self, scomp):
        bc, bv = super().scal_diff_bc(scomp)
        crse = (
            self.crse_new["rho"] if scomp == 0 else self.crse_new["trac"][scomp - 1]
        )
        return self._with_cf_dirichlet(bc, bv, crse)

    def fill_temp(self, s, ng):
        lo, hi = self.temp_bcvals()
        return self._fill_from(s, self.crse_old["temp"], ng, self._temp_rec, lo, hi)

    def temp_diff_bc(self):
        bc, bv = super().temp_diff_bc()
        return self._with_cf_dirichlet(bc, bv, self.crse_new["temp"])

    def mac_bc(self):
        bc, _ = super().mac_bc()
        if self.crse_mac_phi is None:
            crse_phi = jnp.zeros(self.crse_geom.ncell, dtype=jnp.float64)
        else:
            crse_phi = self.crse_mac_phi
        return self._with_cf_dirichlet(bc, {}, crse_phi)

    def nodal(self):
        nb, _ = super().nodal()
        lo = list(nb.lo)
        hi = list(nb.hi)
        for d in range(self.dim):
            if self.cf_side[(d, 0)]:
                lo[d] = N_DIRICHLET
            if self.cf_side[(d, 1)]:
                hi[d] = N_DIRICHLET
        nb = NodalBC(lo=tuple(lo), hi=tuple(hi))
        phi_bc = None
        if self.crse_p is not None:
            phi_bc = _prolong_node_patch(self.crse_p, self.spec)
        return nb, phi_bc

    def grow_umac(self, umac):
        """Fine-level create_umac_grown (NavierStokesBase.cpp:1109-1311):
        transverse ghost rows at C-F sides come from FACE-LINEAR
        interpolation of the parent's MAC velocity (FillPatchTwoLevels with
        face_linear_interp) instead of edge copies; physical/periodic sides
        keep the single-level fill. (The reference's follow-up
        divergence-preserving fix adjusts only the outer NORMAL ghost face
        of each ghost cell — a face this discretization's transverse
        stencils never read, so the interpolated values are the
        load-bearing part here.)"""
        if self.crse_umac is None:
            return super().grow_umac(umac)
        import numpy as np

        from iamr_tpu.ops.stencil import sl

        spec = self.spec
        r = spec.ratio
        dim = self.dim
        periodic = tuple(self.cfg.geom.periodic)

        def interp_row(d, e, side, grown_dims):
            """Coarse umac[d] interpolated to the fine ghost row just
            outside the patch along e (single cell layer); edge-padded
            along previously grown transverse dims."""
            cu = self.crse_umac[d]
            out = cu
            for f in range(dim):
                if f == d:
                    g = np.arange(spec.lo[f], spec.lo[f] + spec.ncell[f] + 1)
                    c0 = g // r
                    w = ((g - c0 * r) / r).astype(np.float64)
                    c1 = np.minimum(c0 + 1, cu.shape[f] - 1)
                    a = jnp.take(out, jnp.asarray(c0), axis=f)
                    b = jnp.take(out, jnp.asarray(c1), axis=f)
                    ws = [1] * dim
                    ws[f] = len(g)
                    out = a + (b - a) * jnp.asarray(w, out.dtype).reshape(ws)
                elif f == e:
                    gcell = (
                        spec.lo[f] - 1 if side == 0
                        else spec.lo[f] + spec.ncell[f]
                    )
                    ncc = cu.shape[f]  # coarse cells along f (f != d)
                    cc = (gcell // r) % ncc
                    out = jnp.take(out, jnp.asarray([cc]), axis=f)
                else:
                    j = (
                        np.arange(spec.lo[f], spec.lo[f] + spec.ncell[f]) // r
                    )
                    out = jnp.take(out, jnp.asarray(j), axis=f)
            # previously grown dims: pad the row to match (corner cells,
            # edge-replicated like the reference's untouched grid corners)
            for f in grown_dims:
                out = jnp.pad(
                    out,
                    [(1, 1) if q == f else (0, 0) for q in range(dim)],
                    mode="edge",
                )
            return out

        out = []
        for d, u in enumerate(umac):
            grown = []
            for e in range(dim):
                if e == d:
                    continue
                rows = {}
                for side in (0, 1):
                    if self.cf_side[(e, side)]:
                        rows[side] = interp_row(d, e, side, grown)
                    elif periodic[e]:
                        rows[side] = (
                            sl(u, e, -1, None) if side == 0 else sl(u, e, 0, 1)
                        )
                    else:
                        rows[side] = (
                            sl(u, e, 0, 1) if side == 0
                            else sl(u, e, -1, None)
                        )
                u = jnp.concatenate([rows[0], u, rows[1]], axis=e)
                grown.append(e)
            out.append(u)
        return tuple(out)


def _prolong_face_patch(cu, d, spec: LevelSpec):
    """Coarse MAC face field (faces normal to d) interpolated onto the fine
    patch's face grid: linear in the normal dim, piecewise-constant
    transverse (the reference's face_linear_interp)."""
    import numpy as np

    dim = cu.ndim
    r = spec.ratio
    out = cu
    for f in range(dim):
        if f == d:
            g = np.arange(spec.lo[f], spec.lo[f] + spec.ncell[f] + 1)
            c0 = g // r
            w = ((g - c0 * r) / r).astype(np.float64)
            c1 = np.minimum(c0 + 1, cu.shape[f] - 1)
            a = jnp.take(out, jnp.asarray(c0), axis=f)
            b = jnp.take(out, jnp.asarray(c1), axis=f)
            ws = [1] * dim
            ws[f] = len(g)
            out = a + (b - a) * jnp.asarray(w, out.dtype).reshape(ws)
        else:
            j = np.arange(spec.lo[f], spec.lo[f] + spec.ncell[f]) // r
            out = jnp.take(out, jnp.asarray(j), axis=f)
    return out


class UnionBCProvider(CoarseFineBCProvider):
    """Provider for a WHOLE multi-box fine level advanced as ONE
    bounding-box array (the level-wide union advance, amr/multipatch.py).

    The bbox spec behaves like a single fine patch (outer coarse-fine
    handling comes from CoarseFineBCProvider); bbox cells covered by no box
    ('holes') are interior ghost regions: every fill pastes
    coarse-interpolated data into them, grow_umac pastes face-interpolated
    coarse MAC velocities onto strictly-hole faces, and the elliptic solves
    treat hole data as interior Dirichlet values (mg_solve interior_mask /
    nodal_solve interior_mask — reference MLMG solves each AMR level across
    its whole BoxArray, SURVEY.md section 2.2).
    """

    is_union = True

    def __init__(self, cfg_fine, bbox: LevelSpec, boxes, crse_geom,
                 crse_old, crse_new, crse_p=None, crse_mac_phi=None,
                 crse_umac=None):
        super().__init__(cfg_fine, bbox, crse_geom, crse_old, crse_new,
                         crse_p=crse_p, crse_mac_phi=crse_mac_phi,
                         crse_umac=crse_umac)
        import itertools

        import numpy as np

        self.boxes = tuple(boxes)
        dim = self.dim
        m = np.zeros(bbox.ncell)
        for b in boxes:
            m[tuple(
                slice(b.lo[d] - bbox.lo[d], b.lo[d] - bbox.lo[d] + b.ncell[d])
                for d in range(dim)
            )] = 1.0
        dtype = cfg_fine.jdtype
        self.cellmask = jnp.asarray(m, dtype)
        # interior node mask: free iff all 2^dim adjacent cells are in-union
        mp = np.pad(m, 1, constant_values=0.0)
        nshape = tuple(n + 1 for n in bbox.ncell)
        nm = np.ones(nshape)
        for t in itertools.product((0, 1), repeat=dim):
            nm = nm * mp[tuple(
                slice(t[d], t[d] + nshape[d]) for d in range(dim)
            )]
        self.nodemask = jnp.asarray(nm, dtype)
        # strict hole faces: no adjacent cell belongs to any box (outside
        # the bbox counts as hole too, so bbox-boundary faces of hole cells
        # qualify) — every such face is C-F data and gets the coarse
        # interpolation create_umac_grown would give it; faces with a box
        # neighbor are computed by the extrap and never overwritten
        self.holeface = []
        for d in range(dim):
            pad = [(0, 0)] * dim
            pad[d] = (1, 1)
            mp2 = np.pad(m, pad, constant_values=0.0)
            lo = mp2[tuple(
                slice(0, -1) if e == d else slice(None) for e in range(dim)
            )]
            hi = mp2[tuple(
                slice(1, None) if e == d else slice(None) for e in range(dim)
            )]
            self.holeface.append(jnp.asarray((1.0 - lo) * (1.0 - hi), dtype))

    # --- coarse data interpolated over the whole bbox ---------------------
    def _pc_bbox(self, crse_cc):
        sp = self.spec
        return prolong_cell(crse_cc, sp.ratio)[tuple(
            slice(sp.lo[d], sp.lo[d] + sp.ncell[d]) for d in range(self.dim)
        )]

    def _paste_holes(self, g, ng, crse_cc):
        interior = tuple(slice(ng, g.shape[d] - ng) for d in range(self.dim))
        g = g.at[interior].set(jnp.where(
            self.cellmask > 0.0, g[interior], self._pc_bbox(crse_cc)
        ))
        return g

    # --- fills: parent fill + hole pasting --------------------------------
    def fill_vel(self, vel, ng):
        g = super().fill_vel(vel, ng)
        return jnp.stack([
            self._paste_holes(g[c], ng, self.crse_old["vel"][c])
            for c in range(self.dim)
        ])

    def fill_scal(self, s, ng, scomp):
        crse = (
            self.crse_old["rho"] if scomp == 0
            else self.crse_old["trac"][scomp - 1]
        )
        return self._paste_holes(super().fill_scal(s, ng, scomp), ng, crse)

    def fill_temp(self, s, ng):
        return self._paste_holes(
            super().fill_temp(s, ng), ng, self.crse_old["temp"]
        )

    def paste_hole_faces(self, umac):
        """Coarse-interpolated MAC velocities on strictly-hole faces (both
        neighbors outside every box) — the union-level analogue of
        create_umac_grown's C-F fill (NavierStokesBase.cpp:1161-1311). Box
        faces (>=1 neighbor in a box) are never touched."""
        if self.crse_umac is None:
            return umac
        pasted = []
        for d in range(self.dim):
            interp = _prolong_face_patch(
                self.crse_umac[d], d, self.spec
            ).astype(umac[d].dtype)
            pasted.append(
                jnp.where(self.holeface[d] > 0.0, interp, umac[d])
            )
        return tuple(pasted)

    def grow_umac(self, umac):
        return super().grow_umac(self.paste_hole_faces(umac))

    # --- interior Dirichlet values for the union solves -------------------
    def union_vals_vel(self, c):
        return self._pc_bbox(self.crse_new["vel"][c])

    def union_vals_scal(self, scomp):
        crse = (
            self.crse_new["rho"] if scomp == 0
            else self.crse_new["trac"][scomp - 1]
        )
        return self._pc_bbox(crse)

    def union_vals_temp(self):
        return self._pc_bbox(self.crse_new["temp"])

    def union_vals_mac(self):
        if self.crse_mac_phi is None:
            return jnp.zeros(self.spec.ncell, dtype=self.cellmask.dtype)
        return self._pc_bbox(self.crse_mac_phi)


def _prolong_node_patch(crse_p, spec: LevelSpec):
    """Bilinear interpolation of the coarse nodal field onto the fine
    patch's node grid (for C-F Dirichlet values of the fine projection)."""
    dim = crse_p.ndim
    r = spec.ratio
    out = crse_p
    for d in range(dim):
        n = out.shape[d]
        # refine nodes along d: new count (n-1)*r + 1
        idx_f = jnp.arange((n - 1) * r + 1)
        i0 = jnp.minimum(idx_f // r, n - 2)
        w = (idx_f - i0 * r).astype(out.dtype) / r
        a = jnp.take(out, i0, axis=d)
        b = jnp.take(out, i0 + 1, axis=d)
        shape = [1] * dim
        shape[d] = idx_f.shape[0]
        out = a + (b - a) * w.reshape(shape)
    return out[
        tuple(
            slice(spec.lo[d], spec.lo[d] + spec.ncell[d] + 1) for d in range(dim)
        )
    ]
