"""On-chip timing of each phase of the SPECTRAL-path HIT step at 256^3.

The production bench path (bench.py) is spectral; bench_components2.py
profiles the MG path. This script times the spectral step's actual
constituents so perf work targets the real bottleneck.

Usage: python exp_step_breakdown_spectral.py [n]
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
import numpy as np


def timeit(f, *args, reps=5, name=""):
    out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import dataclasses

    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.advance import (
        advance,
        est_time_step,
        get_force,
        make_hit_forcing,
        mu_faces,
    )
    from iamr_tpu.ns.bcprovider import PhysBCProvider
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs
    from iamr_tpu.ops.godunov import advect_field, extrap_vel_to_faces
    from iamr_tpu.solvers import diffusion as diff
    from iamr_tpu.solvers.mac import mac_project
    from iamr_tpu.solvers.nodal_proj import level_project

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
    dt = 0.005
    state = state._replace(dt=jnp.asarray(dt, cfg.jdtype))
    hit = make_hit_forcing(cfg)
    bcp = PhysBCProvider(cfg)
    dx = cfg.geom.dx
    recs = [bcp.vel_bcrec(c) for c in range(3)]
    periodic = (True,) * 3
    zero3 = ((0.0,) * 3,) * 3

    # --- HIT forcing eval (called twice per step)
    t_force = timeit(
        jax.jit(lambda rho: get_force(cfg, rho, 0.1, hit)), state.rho,
        name="hit force eval",
    )

    # --- explicit visc terms for prediction (3 components)
    @jax.jit
    def viscterms(vel):
        mf = mu_faces(cfg)
        return jnp.stack([
            diff.visc_terms_component(
                vel[c], mf, dx, recs[c],
                poisson_bc=bcp.vel_diff_bc(c)[0],
                poisson_bvals=bcp.vel_diff_bc(c)[1],
            )
            for c in range(3)
        ])

    t_visc = timeit(viscterms, state.vel, name="visc_terms x3")

    # --- extrap vel to faces (fills included)
    @jax.jit
    def extrap(vel, forcing):
        vel_g = bcp.fill_vel(vel, 3)
        force_g = bcp.fill_force(forcing)
        return extrap_vel_to_faces(
            vel_g, force_g, dt, dx, cfg.geom.ncell, recs, zero3, zero3,
            use_forces_in_trans=cfg.use_forces_in_trans,
        )

    forcing = jnp.zeros_like(state.vel)
    t_extrap = timeit(extrap, state.vel, forcing, name="extrap_vel_to_faces")
    umac = jax.jit(extrap)(state.vel, forcing)

    # --- MAC projection, spectral
    from iamr_tpu.parallel.reduce import invariant_mean

    @jax.jit
    def macp(umac, rho):
        bc, bv = bcp.mac_bc()
        u2, phi, _ = mac_project(
            umac, rho, cfg.dom, dx, bc=bc, bvals=bv,
            spectral_beta0=1.0 / invariant_mean(rho),
        )
        return u2

    t_mac = timeit(macp, umac, state.rho, name="mac_project spectral")
    umac = macp(umac, state.rho)

    # --- one advect_field, convective (velocity component shape)
    @jax.jit
    def adv1(vel, umac):
        umac_g = bcp.grow_umac(umac)
        v_g = bcp.fill_vel(vel, 3)
        fl, a = advect_field(
            v_g[0], umac, umac_g, dt, dx, cfg.geom.ncell, False,
            s_cc=vel[0], periodic=periodic,
        )
        return a

    t_adv1 = timeit(adv1, state.vel, umac, name="advect_field (1 field)")

    # --- all 5 advections as the step does them (3 vel + rho + trac)
    @jax.jit
    def adv5(vel, rho, trac, umac):
        umac_g = bcp.grow_umac(umac)
        vel_g = bcp.fill_vel(vel, 3)
        outs = []
        for c in range(3):
            fl, a = advect_field(
                vel_g[c], umac, umac_g, dt, dx, cfg.geom.ncell, False,
                s_cc=vel[c], periodic=periodic,
            )
            outs.append(a)
        rho_g = bcp.fill_scal(rho, 3, 0)
        fl, a = advect_field(
            rho_g, umac, umac_g, dt, dx, cfg.geom.ncell, True,
            periodic=periodic,
        )
        outs.append(a)
        s_g = bcp.fill_scal(trac[0], 3, 1)
        fl, a = advect_field(
            s_g, umac, umac_g, dt, dx, cfg.geom.ncell, False, s_cc=trac[0],
            periodic=periodic,
        )
        outs.append(a)
        return jnp.stack(outs)

    t_adv5 = timeit(adv5, state.vel, state.rho, state.trac, umac,
                    name="advect x5 (3 vel + rho + trac)")

    # --- CN diffusion, spectral, vmapped x3
    @jax.jit
    def cn3(vel, rho):
        alpha = rho / dt
        vbc, vbv = bcp.vel_diff_bc(0)
        sp_args = (invariant_mean(alpha), cfg.vel_visc_coef)

        def one(ss, so):
            return diff.diffuse_scalar(
                ss, so, alpha, alpha, mu_faces(cfg), 1.0, dx, recs[0],
                theta=cfg.be_cn_theta, poisson_bc=vbc, poisson_bvals=vbv,
                spectral=sp_args,
            )[0]

        return jax.vmap(one)(vel, vel)

    t_cn = timeit(cn3, state.vel, state.rho, name="CN diffusion spectral x3")

    # --- nodal projection, spectral
    @jax.jit
    def nodp(vel, rho, p, gradp):
        bc_, phi_bc = bcp.nodal()
        return level_project(
            vel, rho, p, gradp, dt, cfg.dom, dx, bc=bc_, phi_bc=phi_bc,
            spectral_sigma0=1.0 / invariant_mean(rho),
        )[0]

    t_nod = timeit(nodp, state.vel, state.rho, state.p, state.gradp,
                   name="nodal project spectral")

    # --- est_time_step
    t_dt = timeit(jax.jit(lambda s: est_time_step(cfg, s, hit)), state,
                  name="est_time_step")

    # --- full spectral step
    step = jax.jit(lambda s: advance(s, cfg, hit=hit, spectral=True))
    t_step = timeit(step, state, reps=3, name="FULL spectral step")

    cells = n**3
    est = (2 * t_force + t_visc + t_extrap + t_mac + t_adv5 + t_cn + t_nod
           + t_dt)
    print(f"\nn={n}^3: step {t_step*1e3:.1f} ms -> "
          f"{cells/t_step/1e6:.1f} Mcells/s")
    print(f"sum-of-parts: {est*1e3:.1f} ms "
          f"(force x2 {2*t_force*1e3:.1f}, visc {t_visc*1e3:.1f}, "
          f"extrap {t_extrap*1e3:.1f}, mac {t_mac*1e3:.1f}, "
          f"adv5 {t_adv5*1e3:.1f}, cn {t_cn*1e3:.1f}, "
          f"nodal {t_nod*1e3:.1f}, estdt {t_dt*1e3:.1f})")


if __name__ == "__main__":
    main()
