"""Finer-grained on-chip timing of every phase of the HIT step.

Usage: python bench_components2.py [n]
"""

import sys
import time

import jax
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
    if name:
        print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from __graft_entry__ import _make
    from iamr_tpu.ns.advance import (
        advance,
        est_time_step,
        get_force,
        make_hit_forcing,
        mu_faces,
    )
    from iamr_tpu.ns.bcprovider import PhysBCProvider
    from iamr_tpu.ops.godunov import (
        advect_field,
        extrap_vel_to_faces,
        grow_umac_transverse,
    )
    from iamr_tpu.solvers import diffusion as diff
    from iamr_tpu.solvers.mac import mac_project
    from iamr_tpu.solvers.nodal_proj import level_project

    cfg, state = _make(n, dim=3, dtype="float32")
    dx = cfg.geom.dx
    bcp = PhysBCProvider(cfg)
    dt = 0.005
    recs = [bcp.vel_bcrec(c) for c in range(3)]
    periodic = (True,) * 3
    zero3 = ((0.0,) * 3,) * 3

    # --- extrap only
    @jax.jit
    def extrap(vel):
        vel_g = bcp.fill_vel(vel, 3)
        force_g = bcp.fill_force(jnp.zeros_like(vel))
        return extrap_vel_to_faces(
            vel_g, force_g, dt, dx, cfg.geom.ncell, recs, zero3, zero3
        )

    t_extrap = timeit(extrap, state.vel, name="extrap")
    umac = extrap(state.vel)

    # --- one advect_field (conservative)
    @jax.jit
    def adv1(rho, umac):
        umac_g = bcp.grow_umac(umac)
        rho_g = bcp.fill_scal(rho, 3, 0)
        fl, a = advect_field(
            rho_g, umac, umac_g, dt, dx, cfg.geom.ncell, True,
            periodic=periodic,
        )
        return a

    t_adv1 = timeit(adv1, state.rho, umac, name="adv1")

    # --- MAC projection (4 cycles)
    @jax.jit
    def macp(umac, rho):
        bc, bv = bcp.mac_bc()
        u2, phi, _ = mac_project(
            umac, rho, cfg.dom, dx, fixed_cycles=4, bc=bc, bvals=bv
        )
        return u2

    t_mac = timeit(macp, umac, state.rho, name="mac4")

    # --- one CN diffusion solve (1 cycle)
    @jax.jit
    def cn(u, rho):
        alpha = rho / dt
        vbc, vbv = bcp.vel_diff_bc(0)
        out, _ = diff.diffuse_scalar(
            u, u, alpha, alpha, mu_faces(cfg), 1.0, dx, recs[0],
            theta=0.5, fixed_cycles=1, poisson_bc=vbc, poisson_bvals=vbv,
        )
        return out

    t_cn = timeit(cn, state.vel[0], state.rho, name="cn1")

    # --- nodal projection (4 cycles)
    @jax.jit
    def nodp(vel, rho, p, gradp):
        bc_, phi_bc = bcp.nodal()
        return level_project(
            vel, rho, p, gradp, dt, cfg.dom, dx, fixed_cycles=4, bc=bc_,
            phi_bc=phi_bc,
        )[0]

    t_nod = timeit(nodp, state.vel, state.rho, state.p, state.gradp, name="nodal4")

    # --- HIT forcing eval
    hit = make_hit_forcing(cfg)
    if hit is not None:
        t_force = timeit(
            jax.jit(lambda rho: get_force(cfg, rho, 0.1, hit)), state.rho
        )
    else:
        t_force = 0.0

    # --- est_time_step
    t_dt = timeit(
        jax.jit(lambda s: est_time_step(cfg, s, hit)), state
    )

    # --- full step
    step = jax.jit(lambda s: advance(s, cfg, fixed_mg_cycles=4, hit=hit))
    t_step = timeit(step, state, reps=3, name="step")

    cells = n**3
    print(
        f"n={n}^3 extrap={t_extrap*1e3:.1f} adv1={t_adv1*1e3:.1f} "
        f"mac4={t_mac*1e3:.1f} cn1={t_cn*1e3:.1f} nodal4={t_nod*1e3:.1f} "
        f"force={t_force*1e3:.1f} estdt={t_dt*1e3:.1f} "
        f"step={t_step*1e3:.1f}ms -> {cells/t_step/1e6:.1f}M cells/s"
    )
    est = (
        t_extrap + 5 * t_adv1 + t_mac + 3 * t_cn + t_nod + 2 * t_force + t_dt
    )
    print(f"sum-of-parts estimate: {est*1e3:.1f}ms (vel 3x + rho + trac)")


if __name__ == "__main__":
    main()
