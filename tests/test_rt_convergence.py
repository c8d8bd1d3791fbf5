"""RayleighTaylor 2-level accuracy: the composite AMR solution must beat
the coarse-uniform solution against a fine-uniform reference (the point of
the sync machinery — reflux + mac_sync + composite sync projection keep the
composite solution consistent; BASELINE.md parity config family).

Protocol: fixed dt (ns.fixed_dt) so all runs hit the same times; the fine
uniform run takes 2x steps of dt/2 (what the subcycled fine level does).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.multilevel import (
    MLState,
    advance_two_level_subcycled,
    init_fine_from_coarse,
    make_fine_config,
)
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs

pytestmark = pytest.mark.slow

RT = """
max_step = 4
amr.n_cell = {nx} {ny}
ns.cfl = 0.5
ns.init_iter = 1
ns.fixed_dt = {dt}
ns.gravity = -9.8
ns.vel_visc_coef = 0.0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 0.5 1.0
geometry.is_periodic = 1 0
ns.lo_bc = 0 4
ns.hi_bc = 0 4
prob.probtype = 10
prob.rho_1 = 1.0
prob.rho_2 = 2.0
prob.perturbation_amplitude = 0.05
"""


def _cfg(nx, ny, dt):
    return config_from_inputs(
        ParmParse.from_string(RT.format(nx=nx, ny=ny, dt=dt))
    )


def _restrict2(a):
    return 0.25 * (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2])


def test_rt_two_level_beats_coarse_uniform():
    nxc, nyc = 16, 32
    dt = 2e-3
    nsteps = 4

    # fine-uniform reference: 2x resolution, dt/2, 2x steps
    cfg_f = _cfg(2 * nxc, 2 * nyc, dt / 2)
    sf = initialize(cfg_f)
    sf = sf._replace(dt=jnp.asarray(dt / 2, cfg_f.jdtype))
    stepf = make_step(cfg_f)
    for _ in range(2 * nsteps):
        sf = stepf(sf)

    # coarse-uniform
    cfg_c = _cfg(nxc, nyc, dt)
    sc = initialize(cfg_c)
    sc = sc._replace(dt=jnp.asarray(dt, cfg_c.jdtype))
    stepc = make_step(cfg_c)
    for _ in range(nsteps):
        sc = stepc(sc)

    # 2-level AMR: fine patch over the interface band (mixing region)
    spec = LevelSpec(lo=(0, 16), ncell=(2 * nxc, 32), ratio=2)
    s0 = initialize(cfg_c)
    s0 = s0._replace(dt=jnp.asarray(dt, cfg_c.jdtype))
    ml = MLState(crse=s0, fine=init_fine_from_coarse(cfg_c, spec, s0))
    step2 = jax.jit(
        lambda m: advance_two_level_subcycled(m, cfg_c, spec)
    )
    for _ in range(nsteps):
        ml = step2(ml)

    assert abs(float(ml.crse.time) - float(sf.time)) < 1e-12
    # compare on the fine patch region (where the action is)
    lo, nc = spec.lo, spec.ncell
    ref_patch = np.asarray(
        sf.vel[:, lo[0]:lo[0] + nc[0], lo[1]:lo[1] + nc[1]]
    )
    amr_patch = np.asarray(ml.fine.vel)
    err_amr = float(np.sqrt(np.mean((amr_patch - ref_patch) ** 2)))
    max_amr = float(np.max(np.abs(amr_patch - ref_patch)))

    # coarse solution prolonged (PC) to fine cells on the same region
    cpro = np.asarray(sc.vel).repeat(2, axis=1).repeat(2, axis=2)
    diff_c = cpro[:, lo[0]:lo[0] + nc[0], lo[1]:lo[1] + nc[1]] - ref_patch
    err_crse = float(np.sqrt(np.mean(diff_c ** 2)))
    max_crse = float(np.max(np.abs(diff_c)))

    assert np.isfinite(err_amr)
    # the AMR composite recovers a clear fraction of the fine solution on
    # the refined region (L2; the max norm is dominated by the C-F band
    # where both carry interpolation-order error) and never does worse
    assert err_amr < 0.75 * err_crse, (err_amr, err_crse)
    assert max_amr < 1.0 * max_crse, (max_amr, max_crse)
