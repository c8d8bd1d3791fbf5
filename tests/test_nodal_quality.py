"""Pin the f32 nodal-projection quality against an f64 run of the SAME
config (round-3 VERDICT weak item 7): the post-step normalized cell
divergence of an approximate projection is discretization-limited, so the
f32 figure must track the f64 one — a quiet f32 degradation (an
under-converged solve, a lost demean, a bad mixed-precision cast) shows up
as the ratio exploding even when the absolute number still "looks small".

Reference contract: the nodal projection is APPROXIMATE — it drives the
FEM nodal divergence of the projected field to solver tolerance, leaving
O(h^2) divergence in derived cell measures (Projection.cpp:166-449).
"""

import dataclasses

import numpy as np
import pytest


def _post_step_div(dtype):
    import jax.numpy as jnp

    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.advance import advance, make_hit_forcing
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs
    from iamr_tpu.ops.mg_nodal import NodalBC, N_PERIODIC, div_cell_to_node

    n = 32
    pp = ParmParse.from_string(f"""
        amr.n_cell = {n} {n} {n}
        ns.cfl = 0.7
        ns.init_iter = 0
        ns.vel_visc_coef = 1.e-4
        geometry.prob_lo = -0.5 -0.5 -0.5
        geometry.prob_hi = 0.5 0.5 0.5
        geometry.is_periodic = 1 1 1
        prob.probtype = 100
        turb.nmodes = 4
        turb.div_free_force = 1
    """)
    cfg = config_from_inputs(pp)
    cfg = dataclasses.replace(cfg, dtype=dtype)
    state = init_state(cfg)
    state = state._replace(dt=jnp.asarray(5e-3, cfg.jdtype))
    hit = make_hit_forcing(cfg)
    for _ in range(3):
        state = advance(state, cfg, fixed_mg_cycles=4, hit=hit)
    bc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    div = div_cell_to_node(tuple(state.vel[d] for d in range(3)),
                           cfg.geom.dx, bc)
    umax = float(jnp.max(jnp.abs(state.vel)))
    dx = float(cfg.geom.dx[0])
    return float(jnp.max(jnp.abs(div))) / (umax / dx)


@pytest.mark.slow
def test_f32_nodal_divergence_tracks_f64():
    d64 = _post_step_div("float64")
    d32 = _post_step_div("float32")
    # both are discretization-limited (identical config): the f32 run may
    # add a precision floor but must stay within a small factor of f64;
    # 3x headroom guards real regressions (under-converged solve, lost
    # demean, bad mixed-precision cast)
    assert d32 <= 3.0 * d64 + 1e-6, (d32, d64)
    # and the absolute level itself stays at the approximate-projection
    # truncation scale for this flow
    assert d32 < 5e-2, d32
