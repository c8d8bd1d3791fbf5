"""Component-level timing on the real chip: where does the step time go?

Usage: python bench_components.py [n]
Times (with honest scalar-fetch sync): advection (extrap+edges+aofs),
cell MG V-cycles (MAC solve), nodal MG V-cycles, CN solve, full step.
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=5):
    out = f(*args)
    s = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    s = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from __graft_entry__ import _make
    from iamr_tpu.ns.advance import advance, get_force, mu_faces
    from iamr_tpu.ns.bcprovider import PhysBCProvider
    from iamr_tpu.core.fill import fill_ghost
    from iamr_tpu.ops.godunov import (
        compute_edge_states,
        compute_fluxes_and_aofs,
        extrap_vel_to_faces,
        grow_umac_transverse,
    )
    from iamr_tpu.ops import mg
    from iamr_tpu.ops.mg import PERIODIC, PoissonBC
    from iamr_tpu.ops import mg_nodal
    from iamr_tpu.ops.mg_nodal import N_PERIODIC, NodalBC

    cfg, state = _make(n, dim=3, dtype="float32")
    dx = cfg.geom.dx
    bcp = PhysBCProvider(cfg)
    dt = 0.01

    # --- advection bundle
    @jax.jit
    def advect(vel, rho):
        vel_g = bcp.fill_vel(vel, 3)
        force_g = jnp.zeros_like(vel_g[:, 1:-1, 1:-1, 1:-1])
        force_g = bcp.fill_force(jnp.zeros_like(vel))
        recs = [bcp.vel_bcrec(c) for c in range(3)]
        zero3 = ((0.0,) * 3,) * 3
        umac = extrap_vel_to_faces(
            vel_g, force_g, dt, dx, cfg.geom.ncell, recs, zero3, zero3
        )
        umac_g = grow_umac_transverse(umac, (True,) * 3)
        rho_g = bcp.fill_scal(rho, 3, 0)
        edges = compute_edge_states(
            rho_g, umac_g, dt, dx, cfg.geom.ncell, True, periodic=(True,) * 3
        )
        _, aofs = compute_fluxes_and_aofs(edges, umac, dx, True)
        return aofs

    t_adv = timeit(advect, state.vel, state.rho)

    # --- cell MG, 4 cycles
    bc = PoissonBC(lo=(PERIODIC,) * 3, hi=(PERIODIC,) * 3)
    beta = tuple(
        jnp.ones(tuple(nn + (1 if d == e else 0) for e, nn in enumerate(cfg.geom.ncell)),
                 dtype=jnp.float32)
        for d in range(3)
    )
    rhs = state.rho - jnp.mean(state.rho)

    @jax.jit
    def cellmg(r):
        phi, res, _ = mg.mg_solve(
            r, jnp.zeros_like(r), beta, 0.0, 1.0, dx, bc, fixed_cycles=4
        )
        return phi

    t_cell = timeit(cellmg, rhs)

    # --- nodal MG, 4 cycles
    nbc = NodalBC(lo=(N_PERIODIC,) * 3, hi=(N_PERIODIC,) * 3)
    sigma = jnp.ones(cfg.geom.ncell, dtype=jnp.float32)
    nrhs = jnp.zeros(tuple(x + 1 for x in cfg.geom.ncell), dtype=jnp.float32)
    nrhs = nrhs.at[1:-1, 1:-1, 1:-1].set(1.0)

    @jax.jit
    def nodalmg(r):
        phi, res, _ = mg_nodal.nodal_solve(r, sigma, dx, nbc, fixed_cycles=4)
        return phi

    t_nodal = timeit(nodalmg, nrhs)

    # --- full step
    step = jax.jit(lambda s: advance(s, cfg, fixed_mg_cycles=4))
    t_step = timeit(step, state, reps=3)

    cells = n**3
    print(f"n={n}^3  advect={t_adv*1e3:.1f}ms  cellMG(4cyc)={t_cell*1e3:.1f}ms  "
          f"nodalMG(4cyc)={t_nodal*1e3:.1f}ms  step={t_step*1e3:.1f}ms  "
          f"-> {cells/t_step/1e6:.1f}M cells/s")


if __name__ == "__main__":
    main()
