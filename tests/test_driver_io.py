"""Driver IO subsystems: run_log, velocity time-averaging (NS_average),
dump_plane slices, and do_mom_diff conservative momentum advection."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.state import config_from_inputs
from iamr_tpu.ns.driver import IOHooks, run

BASE = """
max_step = 3
ns.cfl = 0.5
ns.init_iter = 1
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
prob.probtype = 8
prob.density_ic = 1.0
prob.velocity_ic = 1.0 0.0
prob.forcevort = 0.3
"""


def test_mom_diff_matches_convective_for_constant_density():
    sa = run(config_from_inputs(ParmParse.from_string(BASE)), max_steps=3)
    sb = run(
        config_from_inputs(ParmParse.from_string(BASE + "\nns.do_mom_diff = 1\n")),
        max_steps=3,
    )
    assert bool(jnp.all(jnp.isfinite(sb.vel)))
    # for smooth constant-density flow the conservative and convective forms
    # agree to advection truncation error
    assert float(jnp.max(jnp.abs(sa.vel - sb.vel))) < 5e-2


def test_run_log_average_dump_plane():
    with tempfile.TemporaryDirectory() as d:
        pp = ParmParse.from_string(
            BASE
            + f"""
ns.avg_interval = 1
amr.run_log = {d}/runlog
amr.run_log_terse = {d}/runlog.terse
ns.dump_plane = 3
ns.dump_plane_name = {d}/slabs/vel-
amr.plot_int = 3
amr.plot_file = {d}/plt
"""
        )
        cfg = config_from_inputs(pp)
        hooks = IOHooks(cfg, pp)
        run(cfg, max_steps=3, callback=hooks)
        assert len(open(f"{d}/runlog").readlines()) == 3
        assert len(open(f"{d}/runlog.terse").readlines()) == 3
        assert os.path.exists(f"{d}/slabs/vel-00001.bin")
        avg = hooks.time_average()
        assert avg is not None
        assert np.isfinite(avg[0]).all() and np.isfinite(avg[1]).all()
        from iamr_tpu.io.plotfile import read_plotfile

        f, _ = read_plotfile(f"{d}/plt00003")
        assert "x_vel_average" in f and "x_vel_rms" in f
