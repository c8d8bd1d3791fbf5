"""Compare the full HIT 256^3 step on TPU: spectral solvers vs fixed-4-cycle MG.

Reports per-step wall time and max nodal divergence after 3 steps for both
paths (the decision data for making spectral the production path on
all-periodic uniform-rho runs)."""

import dataclasses
import os
import sys
import time

sys.setrecursionlimit(100000)

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import advance, make_hit_forcing
from iamr_tpu.ns.probs import init_state
from iamr_tpu.ns.state import config_from_inputs
from iamr_tpu.ops.mg_nodal import NodalBC, N_PERIODIC, div_cell_to_node


def run(n, steps, spectral):
    pp = ParmParse.from_string(
        f"""
        max_step = {steps}
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
    state = state._replace(dt=jnp.asarray(5e-3, dtype=cfg.jdtype))
    hit = make_hit_forcing(cfg)

    step = jax.jit(
        lambda s: advance(s, cfg, fixed_mg_cycles=4, hit=hit, spectral=spectral)
    )
    s = step(state)
    _ = float(jnp.max(jnp.abs(s.vel)))
    t0 = time.perf_counter()
    for _ in range(steps):
        s = step(s)
    umax = float(jnp.max(jnp.abs(s.vel)))
    wall = (time.perf_counter() - t0) / steps

    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    div = div_cell_to_node(tuple(s.vel[d] for d in range(3)), cfg.geom.dx, bc)
    max_div = float(jnp.max(jnp.abs(div)))
    print(
        f"spectral={spectral}: {wall*1e3:.1f} ms/step "
        f"({n**3/wall/1e6:.1f} Mcells/s), max_div={max_div:.3e}, "
        f"div*dx/umax={max_div/(n*umax):.3e}, umax={umax:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for sp in (False, True):
        run(n, steps, sp)
