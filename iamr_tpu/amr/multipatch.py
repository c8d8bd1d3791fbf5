"""Multi-patch fine levels: a fine AMR level made of SEVERAL boxes.

This is the block-structured heart of the reference's data model — a fine
level is a BoxArray of grids, not one rectangle (amrex BoxArray /
DistributionMapping; SURVEY.md section 2.3.1). Here each box is a dense
array advanced by the same advance(); the per-box loop unrolls at trace
time into ONE fused program (boxes may have different shapes; a vmap over
congruent stacked box batches is the planned optimization).

Per-box elliptic solves use coarse-fine Dirichlet values at box boundaries
INCLUDING fine-fine seams (the reference's MLMG solves level-wide across
the BoxArray instead); seam differences sit at C-F truncation size — the
adjacent-boxes regression test tracks them against the single-patch union.

The FillPatch priority is reproduced: fine ghost cells covered by a SIBLING
box take the sibling's data (FillBoundary between fine grids); everything
else interpolates from the coarse level; physical domain sides use the BC
tables (reference FillPatchIterator semantics, NavierStokes.cpp:719-729).

Coupling masks generalize the single-patch machinery: refluxing and the MAC
sync registers only act on TRUE coarse-fine faces (faces of the box union),
not on fine-fine interfaces between siblings.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from iamr_tpu.amr.hierarchy import (
    LevelSpec,
    avg_down,
    avg_down_node,
    reflux_correct,
)
from iamr_tpu.amr.multilevel import (
    MLState,
    _interp_states,
    make_fine_config,
)
from iamr_tpu.ns.advance import advance, est_time_step
from iamr_tpu.ns.bcprovider import CoarseFineBCProvider, _prolong_node_patch
from iamr_tpu.ns.state import NSConfig, NSState


def union_covered_mask_np(specs: Sequence[LevelSpec], nc) -> np.ndarray:
    """Coarse-cell mask (1.0 where covered by ANY fine box); static numpy
    (specs are trace-time constants)."""
    m = np.zeros(nc)
    for sp in specs:
        m[tuple(slice(sp.crse_lo[d], sp.crse_lo[d] + sp.crse_ncell[d])
                for d in range(len(nc)))] = 1.0
    return m


def _overlap(lo_a, hi_a, lo_b, hi_b, dim):
    """Half-open box intersection; None if empty."""
    lo = tuple(max(lo_a[d], lo_b[d]) for d in range(dim))
    hi = tuple(min(hi_a[d], hi_b[d]) for d in range(dim))
    if any(lo[d] >= hi[d] for d in range(dim)):
        return None
    return lo, hi


class MultiPatchBCProvider(CoarseFineBCProvider):
    """CoarseFineBCProvider + sibling-fine ghost pasting.

    siblings: list of (spec, fields) with fields a dict holding the
    sibling's CURRENT (start-of-subcycle) "vel"/"rho"/"trac"/"temp".
    """

    def __init__(self, *args, siblings=None, **kw):
        super().__init__(*args, **kw)
        self.siblings = siblings or []

    def _paste_siblings(self, g, ng, getter):
        """Overwrite ghost cells of the grown array g (own box grown by ng,
        fine global coords) with sibling interior data where covered."""
        dim = self.dim
        my_lo = tuple(self.spec.lo[d] - ng for d in range(dim))
        my_hi = tuple(
            self.spec.lo[d] + self.spec.ncell[d] + ng for d in range(dim)
        )
        for spec_s, fields_s in self.siblings:
            ov = _overlap(
                my_lo, my_hi, spec_s.lo,
                tuple(spec_s.lo[d] + spec_s.ncell[d] for d in range(dim)),
                dim,
            )
            if ov is None:
                continue
            lo, hi = ov
            dst = tuple(
                slice(lo[d] - my_lo[d], hi[d] - my_lo[d]) for d in range(dim)
            )
            src = tuple(
                slice(lo[d] - spec_s.lo[d], hi[d] - spec_s.lo[d])
                for d in range(dim)
            )
            g = g.at[dst].set(getter(fields_s)[src])
        return g

    def fill_vel(self, vel, ng):
        g = super().fill_vel(vel, ng)
        out = []
        for c in range(self.dim):
            out.append(
                self._paste_siblings(g[c], ng, lambda f, c=c: f["vel"][c])
            )
        return jnp.stack(out)

    def fill_scal(self, s, ng, scomp):
        g = super().fill_scal(s, ng, scomp)
        getter = (
            (lambda f: f["rho"])
            if scomp == 0
            else (lambda f: f["trac"][scomp - 1])
        )
        return self._paste_siblings(g, ng, getter)

    def fill_temp(self, s, ng):
        g = super().fill_temp(s, ng)
        return self._paste_siblings(g, ng, lambda f: f["temp"])


def _fields_of(state: NSState) -> Dict:
    return {
        "vel": state.vel, "rho": state.rho, "trac": state.trac,
        "temp": state.temp,
    }


def _masked_deltas(deltas, specs, b, covered_np):
    """Zero register entries on fine-fine faces: a patch-boundary face whose
    OUTSIDE coarse cell is covered by a sibling is not a C-F face."""
    sp = specs[b]
    dim = len(deltas)
    out = []
    for d in range(dim):
        delta = deltas[d]
        for side in (0, 1):
            cf = sp.crse_lo[d] if side == 0 else sp.crse_lo[d] + sp.crse_ncell[d]
            if cf <= 0 or cf >= delta.shape[d] - 1:
                continue
            out_cell = cf - 1 if side == 0 else cf
            idx = [
                slice(sp.crse_lo[e], sp.crse_lo[e] + sp.crse_ncell[e])
                for e in range(dim)
            ]
            idx[d] = cf
            oidx = list(idx)
            oidx[d] = out_cell
            keep = 1.0 - covered_np[tuple(oidx)]
            delta = delta.at[tuple(idx)].set(delta[tuple(idx)] * keep)
        out.append(delta)
    return tuple(out)


def union_bbox_spec(specs: Sequence[LevelSpec]) -> LevelSpec:
    """Bounding-box LevelSpec of a multi-box fine level (always coarse-cell
    aligned since every member box is)."""
    dim = specs[0].dim
    lo = tuple(min(sp.lo[d] for sp in specs) for d in range(dim))
    hi = tuple(max(sp.lo[d] + sp.ncell[d] for sp in specs) for d in range(dim))
    return LevelSpec(
        lo=lo, ncell=tuple(hi[d] - lo[d] for d in range(dim)),
        ratio=specs[0].ratio,
    )


def _box_slices(sp: LevelSpec, bbox: LevelSpec, face_dim=None, node=False):
    """Index of box sp inside the bbox array (cell/face/node centering)."""
    sl = []
    for d in range(sp.dim):
        o = sp.lo[d] - bbox.lo[d]
        n = sp.ncell[d] + (1 if (node or face_dim == d) else 0)
        sl.append(slice(o, o + n))
    return tuple(sl)


def _subcycle_union(
    crse, crse_new, crse_aux, fines, cfg, cfgs_f, specs, r, fixed_mg_cycles,
    hit,
):
    """Advance the WHOLE multi-box fine level as ONE bounding-box array:
    scatter box data into the bbox (holes from coarse interpolation), run r
    subcycles with UnionBCProvider (level-wide union elliptic solves,
    reference MLMG semantics). Returns (bbox fine state, subcycle-averaged
    fine_avg registers for _couple_levels, (cellmask, nodemask))."""
    from iamr_tpu.amr.multilevel import init_fine_from_coarse
    from iamr_tpu.ns.bcprovider import UnionBCProvider

    def _acc(sums, tree, w):
        if tree is None:
            return None
        if isinstance(tree, (tuple, list)):
            if sums is None:
                sums = [None] * len(tree)
            return [_acc(s0, t0, w) for s0, t0 in zip(sums, tree)]
        return w * tree if sums is None else sums + w * tree

    dim = cfg.dim
    bbox = union_bbox_spec(specs)
    cfg_u = make_fine_config(cfg, bbox)
    dt_f = crse.dt / r
    u = init_fine_from_coarse(cfg_u, bbox, crse)
    for sp, f in zip(specs, fines):
        cs = _box_slices(sp, bbox)
        ns_ = _box_slices(sp, bbox, node=True)
        u = u._replace(
            vel=u.vel.at[(slice(None),) + cs].set(f.vel),
            rho=u.rho.at[cs].set(f.rho),
            trac=u.trac.at[(slice(None),) + cs].set(f.trac),
            temp=u.temp.at[cs].set(f.temp),
            p=u.p.at[ns_].set(f.p),
            gradp=u.gradp.at[(slice(None),) + cs].set(f.gradp),
        )
    u = u._replace(time=fines[0].time, dt=dt_f)
    # congruent multi-box levels run the hyperbolic phases per box
    # (gather -> vmap -> scatter; amr/boxbatch.UnionBoxExec) — FLOPs scale
    # with sum(box volumes) and the traced program is nbox-independent
    from iamr_tpu.amr.boxbatch import UnionBoxExec, congruent

    bexec = (
        UnionBoxExec(cfg.geom, specs, bbox=bbox)
        if congruent(specs) and len(specs) > 1
        else None
    )
    fine_avg = {}
    masks = None
    for k in range(r):
        th0, th1 = k / r, (k + 1) / r
        bcp = UnionBCProvider(
            cfg_u, bbox, specs, cfg.geom,
            _interp_states(crse, crse_new, th0),
            _interp_states(crse, crse_new, th1),
            crse_p=crse_new.p, crse_mac_phi=crse_aux["mac_phi"],
            crse_umac=crse_aux["umac"],
        )
        masks = (bcp.cellmask, bcp.nodemask)
        u, aux = advance(
            u._replace(dt=dt_f), cfg_u, fixed_mg_cycles, hit=hit, bcp=bcp,
            return_aux=True, boxes=bexec,
        )
        for key in (
            "flux_rho", "umac", "flux_trac", "flux_vel",
            "vflux_vel", "vflux_trac",
        ):
            fine_avg[key] = _acc(fine_avg.get(key), aux[key], 1.0 / r)
        fine_avg["vel_new"] = _acc(fine_avg.get("vel_new"), u.vel, 1.0 / r)
    return u, fine_avg, masks


def _gather_box(u, sp: LevelSpec, bbox: LevelSpec):
    """Extract one box's NSState from the bbox union state."""
    cs = _box_slices(sp, bbox)
    ns_ = _box_slices(sp, bbox, node=True)
    return NSState(
        vel=u.vel[(slice(None),) + cs],
        rho=u.rho[cs],
        trac=u.trac[(slice(None),) + cs],
        temp=u.temp[cs],
        p=u.p[ns_],
        gradp=u.gradp[(slice(None),) + cs],
        time=u.time, dt=u.dt,
        dsdt=None if u.dsdt is None else u.dsdt[cs],
    )


def advance_two_level_multipatch(
    crse: NSState,
    fines: Tuple[NSState, ...],
    cfg: NSConfig,
    specs: Tuple[LevelSpec, ...],
    fixed_mg_cycles: Optional[int] = None,
    hit=None,
    union: bool = True,
):
    """One coarse step with r subcycles of a MULTI-BOX fine level.

    All boxes share the coarse dt/r. union=True (default) advances the level
    as ONE bounding-box array with level-wide union elliptic solves
    (_subcycle_union; reference MLMG solves across the whole BoxArray);
    union=False keeps the legacy per-box advance with sibling ghost pasting
    and Dirichlet fine-fine seams. Coupling (avgDown, reflux, MAC sync
    registers) runs per box with fine-fine faces masked out; one mac_sync
    solve + one sync projection serve the union.
    """
    from iamr_tpu.amr.sync import (
        interface_delta_umac,
        interp_cell_to_fine,
        mac_sync_velocity,
        sync_aofs,
        sync_aofs_vel,
        sync_project,
    )

    dim = cfg.dim
    r = specs[0].ratio
    dt_c = crse.dt
    nb = len(specs)
    cfgs_f = [make_fine_config(cfg, sp) for sp in specs]
    covered_np = union_covered_mask_np(specs, cfg.geom.ncell)
    covered = jnp.asarray(covered_np, crse.rho.dtype)

    crse_new, crse_aux = advance(
        crse, cfg, fixed_mg_cycles, hit=hit, return_aux=True
    )

    dt_f = dt_c / r
    if union:
        # level-wide union advance + the FULL sync machinery of
        # multilevel._couple_levels in its union-masked form (Vsync/Ssync
        # reflux, implicit sync diffusion, composite sync projection)
        from iamr_tpu.amr.multilevel import _couple_levels

        bbox = union_bbox_spec(specs)
        cfg_u = make_fine_config(cfg, bbox)
        u_new, fine_avg, (fmask, nodemask) = _subcycle_union(
            crse, crse_new, crse_aux, fines, cfg, cfgs_f, specs, r,
            fixed_mg_cycles, hit,
        )
        crse_out, fine_u = _couple_levels(
            cfg, cfg_u, bbox, crse_new, crse_aux, u_new, fine_avg,
            dt_c, fixed_mg_cycles,
            union={"cmask": covered, "fmask": fmask, "nodemask": nodemask},
        )
        fines_out = [_gather_box(fine_u, sp, bbox) for sp in specs]
        dt_next = est_time_step(cfg, crse_out)
        for b in range(nb):
            dt_next = jnp.minimum(
                dt_next, r * est_time_step(cfgs_f[b], fines_out[b])
            )
        dt_next = jnp.minimum(dt_next, cfg.change_max * dt_c)
        return (
            crse_out._replace(dt=dt_next),
            tuple(f._replace(dt=dt_next / r) for f in fines_out),
        )
    else:
        fines_k = [f._replace(dt=dt_f) for f in fines]
        flux_sums = [None] * nb
        umac_sums = [None] * nb
        for k in range(r):
            th0, th1 = k / r, (k + 1) / r
            olds = [_fields_of(f) for f in fines_k]
            new_fk = []
            for b in range(nb):
                siblings = [
                    (specs[c], olds[c]) for c in range(nb) if c != b
                ]
                bcp = MultiPatchBCProvider(
                    cfgs_f[b], specs[b], cfg.geom,
                    _interp_states(crse, crse_new, th0),
                    _interp_states(crse, crse_new, th1),
                    crse_p=crse_new.p, crse_mac_phi=crse_aux["mac_phi"],
                    crse_umac=crse_aux["umac"],
                    siblings=siblings,
                )
                fb, aux_b = advance(
                    fines_k[b]._replace(dt=dt_f), cfgs_f[b], fixed_mg_cycles,
                    hit=hit, bcp=bcp, return_aux=True,
                )
                new_fk.append(fb)
                fr = aux_b["flux_rho"]
                if flux_sums[b] is None:
                    flux_sums[b] = [f / r for f in fr]
                    umac_sums[b] = [u / r for u in aux_b["umac"]]
                else:
                    flux_sums[b] = [
                        s0 + f / r for s0, f in zip(flux_sums[b], fr)
                    ]
                    umac_sums[b] = [
                        s0 + u / r for s0, u in zip(umac_sums[b], aux_b["umac"])
                    ]
            fines_k = new_fk
        fines_new = fines_k

    # --- coupling: avgDown + reflux per box (fine-fine faces masked) -------
    crse_out = crse_new
    for b in range(nb):
        sp = specs[b]
        rho_c = avg_down(crse_out.rho, fines_new[b].rho, sp)
        vel_c = jnp.stack(
            [avg_down(crse_out.vel[c], fines_new[b].vel[c], sp) for c in range(dim)]
        )
        trac_c = jnp.stack(
            [
                avg_down(crse_out.trac[t], fines_new[b].trac[t], sp)
                for t in range(cfg.ntrac)
            ]
        )
        temp_c = avg_down(crse_out.temp, fines_new[b].temp, sp)
        p_c = avg_down_node(crse_out.p, fines_new[b].p, sp)
        gradp_c = jnp.stack(
            [
                avg_down(crse_out.gradp[c], fines_new[b].gradp[c], sp)
                for c in range(dim)
            ]
        )
        crse_out = crse_out._replace(
            rho=rho_c, vel=vel_c, trac=trac_c, temp=temp_c, p=p_c,
            gradp=gradp_c,
        )
    dxc = cfg.geom.dx
    for b in range(nb):
        # mask the correction where the outside cell is sibling-covered:
        # apply reflux then restore covered cells from the pre-reflux state
        before = crse_out.rho
        after = reflux_correct(
            before, crse_aux["flux_rho"], tuple(flux_sums[b]), specs[b],
            tuple(dt_c / dxc[d] for d in range(dim)),
        )
        crse_out = crse_out._replace(
            rho=jnp.where(covered > 0.0, before, after)
        )

    # --- one mac_sync + sync projection for the union ----------------------
    deltas_tot = None
    for b in range(nb):
        db = interface_delta_umac(crse_aux["umac"], tuple(umac_sums[b]), specs[b])
        db = _masked_deltas(db, specs, b, covered_np)
        deltas_tot = (
            db if deltas_tot is None else tuple(a + x for a, x in zip(deltas_tot, db))
        )
    # the elliptic spread uses the union covered mask: temporarily emulate
    # via a spec-free call (mac_sync_velocity zeroes rhs under ONE spec;
    # here we zero under the union before the solve)
    from iamr_tpu.ops import mg
    from iamr_tpu.ops.stencil import mac_div
    from iamr_tpu.solvers.mac import beta_from_rho, mac_poisson_bc

    rhs = mac_div(deltas_tot, dxc) * (1.0 - covered)
    bc = mac_poisson_bc(cfg.dom)
    beta = beta_from_rho(crse_out.rho, cfg.dom)
    phi_s, _, _ = mg.mg_solve(
        -rhs, jnp.zeros_like(crse_out.rho), beta, 0.0, 1.0, dxc, bc,
        rtol=1e-10, atol=1e-14, fixed_cycles=fixed_mg_cycles,
    )
    ucorr = tuple(-c for c in mg.get_fluxes(phi_s, beta, 1.0, dxc, bc))

    ssync_rho = -dt_c * sync_aofs(cfg, crse_out.rho, ucorr, 0, True)
    trac_sync = []
    for t in range(cfg.ntrac):
        ds = (1.0 - covered) * (
            -dt_c * sync_aofs(cfg, crse_out.trac[t], ucorr, 1 + t, cfg.do_cons_trac)
        )
        trac_sync.append(crse_out.trac[t] + ds)
    vsync = jnp.stack(
        [
            (1.0 - covered) * (-dt_c * a)
            for a in sync_aofs_vel(
                cfg, crse_out.vel, ucorr,
                rho=crse_out.rho if cfg.do_mom_diff else None,
            )
        ]
    )
    if cfg.do_mom_diff:
        # momentum-units Vsync -> velocity (NavierStokes.cpp:1529-1546)
        vsync = vsync / (crse_out.rho + ssync_rho)
    vsync_p, phi_sync = sync_project(
        cfg, vsync, crse_out.rho, dt_c, specs[0], fixed_cycles=fixed_mg_cycles
    )
    crse_out = crse_out._replace(
        rho=crse_out.rho + ssync_rho,
        trac=jnp.stack(trac_sync),
        vel=crse_out.vel + vsync_p,
        p=crse_out.p + phi_sync,
    )
    fines_out = []
    for b in range(nb):
        fb = fines_new[b]._replace(
            vel=fines_new[b].vel
            + jnp.stack(
                [interp_cell_to_fine(vsync_p[c], specs[b]) for c in range(dim)]
            ),
            rho=fines_new[b].rho + interp_cell_to_fine(ssync_rho, specs[b]),
            p=fines_new[b].p + _prolong_node_patch(phi_sync, specs[b]),
        )
        fines_out.append(fb)

    # next dt (computeNewDt across all boxes)
    dt_next = est_time_step(cfg, crse_out)
    for b in range(nb):
        dt_next = jnp.minimum(dt_next, r * est_time_step(cfgs_f[b], fines_out[b]))
    dt_next = jnp.minimum(dt_next, cfg.change_max * dt_c)
    return (
        crse_out._replace(dt=dt_next),
        tuple(f._replace(dt=dt_next / r) for f in fines_out),
    )


def regrid_multipatch(cfg, old_specs, old_fines, new_specs, crse):
    """State transfer at a multi-box regrid: new boxes initialize from the
    coarse level, then inherit fine data where an OLD box overlaps
    (NavierStokesBase::init(old) FillPatch-from-old semantics)."""
    from iamr_tpu.amr.multilevel import init_fine_from_coarse

    dim = cfg.dim
    out = []
    for sp in new_specs:
        f = init_fine_from_coarse(cfg, sp, crse)
        hi_sp = tuple(sp.lo[d] + sp.ncell[d] for d in range(dim))
        for osp, of in zip(old_specs or [], old_fines or []):
            ov = _overlap(
                sp.lo, hi_sp, osp.lo,
                tuple(osp.lo[d] + osp.ncell[d] for d in range(dim)), dim,
            )
            if ov is None:
                continue
            lo, hi = ov
            dst = tuple(slice(lo[d] - sp.lo[d], hi[d] - sp.lo[d]) for d in range(dim))
            src = tuple(
                slice(lo[d] - osp.lo[d], hi[d] - osp.lo[d]) for d in range(dim)
            )
            f = f._replace(
                vel=f.vel.at[(slice(None),) + dst].set(of.vel[(slice(None),) + src]),
                rho=f.rho.at[dst].set(of.rho[src]),
                trac=f.trac.at[(slice(None),) + dst].set(
                    of.trac[(slice(None),) + src]
                ),
                temp=f.temp.at[dst].set(of.temp[src]),
                gradp=f.gradp.at[(slice(None),) + dst].set(
                    of.gradp[(slice(None),) + src]
                ),
            )
        out.append(f._replace(time=crse.time, dt=crse.dt))
    return tuple(out)
