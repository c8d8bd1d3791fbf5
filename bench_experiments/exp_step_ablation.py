"""IN-STEP phase attribution for the spectral HIT step at 256^3 by
ablation: time the FULL jitted step, then re-jit it with one phase at a
time monkeypatched to a free dummy and report the delta. Unlike
exp_step_breakdown_spectral.py (isolated-phase timing), this measures each
phase's cost INSIDE the fused program — including what XLA CSE already
shares — so perf work targets real in-step milliseconds.

Usage: python exp_step_ablation.py [n]
"""

import os
import sys
import time

sys.setrecursionlimit(100000)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp


def timeit(f, *args, reps=10):
    out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import dataclasses

    from iamr_tpu.config.parmparse import ParmParse
    import iamr_tpu.ns.advance as adv
    import iamr_tpu.ops.pallas_godunov as pg
    import iamr_tpu.solvers.spectral as spectral
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs

    pp = ParmParse.from_string(
        f"""
        amr.n_cell = {n} {n} {n}
        ns.cfl = 0.7
        ns.init_iter = 0
        ns.vel_visc_coef = 1.e-4
        ns.scal_diff_coefs = 0.0
        geometry.prob_lo = -0.5 -0.5 -0.5
        geometry.prob_hi = 0.5 0.5 0.5
        geometry.is_periodic = 1 1 1
        ns.lo_bc = 0 0 0
        ns.hi_bc = 0 0 0
        prob.probtype = 100
        turb.nmodes = 4
        turb.div_free_force = 1
        """
    )
    cfg = config_from_inputs(pp)
    cfg = dataclasses.replace(cfg, dtype="float32")
    state = init_state(cfg)
    state = state._replace(dt=jnp.asarray(0.005, cfg.jdtype))
    hit = adv.make_hit_forcing(cfg)

    def step_fn():
        # a FRESH wrapper each call so jit re-traces under the live patches
        return jax.jit(lambda s: adv.advance(s, cfg, hit=hit, spectral=True))

    t_full = timeit(step_fn(), state)
    print(f"FULL step: {t_full*1e3:.2f} ms "
          f"({n**3/t_full/1e6:.1f} Mcells/s)", flush=True)

    orig = {
        "mac_project": adv.mac_project,
        "level_project": adv.level_project,
        "diffuse_scalar": adv.diff.diffuse_scalar,
        "extrap_vel_to_faces": adv.extrap_vel_to_faces,
        "extrap_plm_fused": getattr(pg, "extrap_plm_fused", None),
        "godunov_plm_fused_multi": pg.godunov_plm_fused_multi,
        "advect_field": adv.advect_field,
        "est_time_step": adv.est_time_step,
        "get_force": adv.get_force,
        "visc_terms_component": adv.diff.visc_terms_component,
        "solve_cell_helmholtz": spectral.solve_cell_helmholtz,
        "solve_nodal_poisson": spectral.solve_nodal_poisson,
    }

    ncell = tuple(cfg.geom.ncell)

    def dummy_mac(umac, rho, dom, dx, **kw):
        return umac, jnp.zeros(ncell, umac[0].dtype), 0

    def dummy_nodal(vel, rho_half, p, gradp, dt, dom, dx, **kw):
        return vel, p, gradp, 0

    def dummy_diffuse(ss, so, *a, **kw):
        return ss, None

    def dummy_extrap(vel_g, force_g, dt, dx, ncell_, recs, bl, bh, **kw):
        # cell-averaged faces, no limiting: frees the extrap math but keeps
        # real-shaped face arrays flowing downstream
        out = []
        for d in range(3):
            v = vel_g[d][3:-3, 3:-3, 3:-3] if vel_g[d].ndim == 3 else vel_g[d]
            sl_lo = [slice(None)] * 3
            sl_lo[d] = slice(0, ncell_[d])
            pad = [(0, 0)] * 3
            pad[d] = (0, 1)
            out.append(jnp.pad(v[tuple(sl_lo)], pad))
        return tuple(out)

    def dummy_multi(sgs, umac, umac_g, dt, dx, ncell_, iconsv, flist, rows,
                    conv, **kw):
        fl = tuple(jnp.zeros_like(u) for u in umac)
        z = jnp.zeros(tuple(ncell_), sgs[0].dtype)
        return [(fl, z) for _ in sgs]

    def dummy_advect(s_g, umac, umac_g, dt, dx, ncell_, iconserv, **kw):
        z = jnp.zeros(tuple(ncell_), s_g.dtype)
        return (tuple(jnp.zeros_like(u) for u in umac), z)

    def dummy_est(cfg_, st, hit_=None):
        return st.dt

    def dummy_force(cfg_, rho, t, hit_=None, **kw):
        shp = (3,) + ncell
        return jnp.zeros(shp, rho.dtype)

    def dummy_visc(s, mf, dx, rec, **kw):
        return jnp.zeros_like(s)

    def dummy_helm(rhs, a0, b0, dx):
        return rhs

    def dummy_npoisson(rhs, s0, dx):
        return rhs[tuple(slice(0, -1) for _ in range(rhs.ndim))] * 0.0 \
            if rhs.shape[0] == ncell[0] + 1 else jnp.zeros(ncell, rhs.dtype)

    ablations = [
        ("advect multi (pallas fused)", [(pg, "godunov_plm_fused_multi",
                                          dummy_multi),
                                         (adv, "advect_field",
                                          dummy_advect)]),
        ("est_time_step", [(adv, "est_time_step", dummy_est)]),
        ("hit force evals", [(adv, "get_force", dummy_force)]),
        ("visc_terms", [(adv.diff, "visc_terms_component", dummy_visc)]),
        ("extrap (pallas fused)", [(pg, "extrap_plm_fused",
            lambda *a, **k: dummy_extrap(*a, **k)),
            (adv, "extrap_vel_to_faces", dummy_extrap)]),
        ("MAC projection (solve+grad)", [(adv, "mac_project", dummy_mac)]),
        ("nodal projection (solve+grad)", [(adv, "level_project",
                                            dummy_nodal)]),
        ("CN diffusion (3 comps)", [(adv.diff, "diffuse_scalar",
                                     dummy_diffuse)]),
        ("spectral solves only (all FFTs)", [
            (spectral, "solve_cell_helmholtz", dummy_helm),
        ]),
    ]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only:
        ablations = [a for a in ablations if any(k in a[0] for k in only)]

    for name, patches in ablations:
        saved = []
        try:
            for mod, attr, repl in patches:
                if getattr(mod, attr, None) is None:
                    continue
                saved.append((mod, attr, getattr(mod, attr)))
                setattr(mod, attr, repl)
            t = timeit(step_fn(), state)
            print(f"  -{name}: {t*1e3:.2f} ms  (in-step cost "
                  f"{(t_full-t)*1e3:+.2f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001 - report and move on
            print(f"  -{name}: FAILED ({type(e).__name__}: {e})", flush=True)
        finally:
            for mod, attr, old in saved:
                setattr(mod, attr, old)


if __name__ == "__main__":
    main()
