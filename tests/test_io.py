"""Plotfile round-trip, checkpoint/restart determinism (the reference's
Euler_restart regression requirement, Test/IAMR-tests.ini:115-127), and
derived-field sanity."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.core.geometry import Geometry
from iamr_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from iamr_tpu.io.plotfile import read_plotfile, write_plotfile
from iamr_tpu.ns.advance import make_step
from iamr_tpu.ns.derive import derive, max_values, sum_integrated_quantities
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs


def test_plotfile_roundtrip(tmp_path):
    geom = Geometry(
        ncell=(8, 6), prob_lo=(0.0, 0.0), prob_hi=(1.0, 0.75),
        periodic=(True, True),
    )
    rng = np.random.default_rng(0)
    fields = {
        "x_velocity": rng.standard_normal((8, 6)),
        "density": rng.uniform(1, 2, (8, 6)),
    }
    p = str(tmp_path / "plt00000")
    write_plotfile(p, geom, fields, time=1.5)
    back, t = read_plotfile(p)
    assert t == 1.5
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_plotfile_roundtrip_3d(tmp_path):
    geom = Geometry(
        ncell=(4, 6, 8), prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3,
        periodic=(True,) * 3,
    )
    rng = np.random.default_rng(1)
    fields = {"density": rng.standard_normal((4, 6, 8))}
    p = str(tmp_path / "plt00001")
    write_plotfile(p, geom, fields)
    back, _ = read_plotfile(p)
    np.testing.assert_array_equal(back["density"], fields["density"])


TG = """
max_step = 10
amr.n_cell = 16 16
ns.cfl = 0.5
ns.init_iter = 1
ns.vel_visc_coef = 1e-2
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
"""


def test_restart_determinism(tmp_path):
    cfg = config_from_inputs(ParmParse.from_string(TG))
    state = initialize(cfg)
    step = make_step(cfg)
    # run 3 steps, checkpoint, run 3 more
    for _ in range(3):
        state = step(state)
    ck = str(tmp_path / "chk00003")
    save_checkpoint(ck, state, step=3)
    cont = state
    for _ in range(3):
        cont = step(cont)

    # restart from the checkpoint and run the same 3 steps
    restored, nstep = load_checkpoint(ck, cfg)
    assert nstep == 3
    for _ in range(3):
        restored = step(restored)

    np.testing.assert_array_equal(np.asarray(cont.vel), np.asarray(restored.vel))
    np.testing.assert_array_equal(np.asarray(cont.p), np.asarray(restored.p))
    np.testing.assert_array_equal(np.asarray(cont.rho), np.asarray(restored.rho))
    assert float(cont.time) == float(restored.time)


def test_derive_and_diagnostics():
    cfg = config_from_inputs(ParmParse.from_string(TG))
    state = initialize(cfg)
    mv = derive(cfg, state, "mag_vort")
    assert mv.shape == cfg.geom.ncell
    # TG vorticity: max = 2 * 2pi * vf approximately
    assert 10.0 < float(jnp.max(mv)) < 14.0
    ke = derive(cfg, state, "energy")
    assert float(jnp.max(ke)) <= 0.5 + 1e-12
    q = sum_integrated_quantities(cfg, state)
    np.testing.assert_allclose(q["mass"], 1.0, rtol=1e-12)
    mx = max_values(state)
    assert 0.9 < mx["max|ux|"] <= 1.0


def test_refine_checkpoint_and_backward_compat(tmp_path):
    """ConvertCheckpoint equivalent + ns.gradp_in_checkpoint back-compat
    (load a checkpoint missing gradp/temp -> Gp recomputed from p)."""
    import json
    import numpy as np
    import jax.numpy as jnp
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.io.checkpoint import (
        load_checkpoint,
        refine_checkpoint,
        save_checkpoint,
    )
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs

    pp = ParmParse.from_string(
        """
        ns.cfl = 0.5
        amr.n_cell = 16 16
        geometry.is_periodic = 1 1
        prob.probtype = 8
        prob.velocity_ic = 1.0 0.0
        """
    )
    cfg = config_from_inputs(pp)
    state = init_state(cfg)._replace(dt=jnp.asarray(0.01, jnp.float64))
    p1 = str(tmp_path / "chk0")
    save_checkpoint(p1, state, 5)

    # refine onto 32^2
    p2 = str(tmp_path / "chk0_fine")
    refine_checkpoint(p1, p2, ratio=2)
    ppf = ParmParse.from_string(
        """
        ns.cfl = 0.5
        amr.n_cell = 32 32
        geometry.is_periodic = 1 1
        prob.probtype = 8
        """
    )
    cfgf = config_from_inputs(ppf)
    fine, step = load_checkpoint(p2, cfgf)
    assert step == 5 and fine.rho.shape == (32, 32)
    # pc prolongation preserves means
    np.testing.assert_allclose(
        float(jnp.mean(fine.rho)), float(jnp.mean(state.rho)), rtol=1e-13
    )

    # backward compat: drop gradp + temp from the file
    z = dict(np.load(str(tmp_path / "chk0/state.npz")))
    z.pop("gradp"); z.pop("temp")
    np.savez(str(tmp_path / "chk0/state.npz"), **z)
    back, _ = load_checkpoint(p1, cfg)
    assert back.gradp.shape == state.gradp.shape
    assert bool(jnp.all(back.temp == 1.0))


def test_convergence_harness():
    from iamr_tpu.utils.convergence import convergence_order, richardson_order
    import numpy as np

    # manufactured: error = C h^2
    out = convergence_order(
        run_at=lambda n: n,
        error_of=lambda sol, n: 3.0 / n**2,
        resolutions=[16, 32, 64],
    )
    assert abs(out["order"] - 2.0) < 1e-12

    x = np.linspace(0, 1, 65)[:-1]
    f = lambda n: np.sin(2 * np.pi * (np.arange(n) + 0.5) / n)
    # first-order-perturbed fields
    sols = [f(n) + (1.0 / n) * np.cos(2 * np.pi * (np.arange(n) + 0.5) / n)
            for n in (16, 32, 64)]
    p = richardson_order(*sols)
    assert 0.5 < p < 2.5


def test_multilevel_plotfile(tmp_path):
    """Two-level plotfile: Header declares finest_level=1 with ref_ratio,
    both Level_k dirs round-trip."""
    import numpy as np
    from iamr_tpu.core.geometry import Geometry
    from iamr_tpu.io.plotfile import write_plotfile, read_plotfile

    geom = Geometry((16, 16), (0.0, 0.0), (1.0, 1.0), (True, True), 0)
    rng = np.random.RandomState(0)
    f0 = {"density": rng.randn(16, 16)}
    f1 = {"density": rng.randn(16, 16)}  # fine patch 16^2 at lo=(8,8)
    p = str(tmp_path / "plt00000")
    write_plotfile(p, geom, f0, time=1.5, fine_levels=[(f1, (8, 8), 2)])
    hdr = open(p + "/Header").read().splitlines()
    assert hdr[5] == "1"  # finest_level
    import os

    assert os.path.exists(p + "/Level_1/Cell_D_00000")
    back, t = read_plotfile(p)  # reads level 0
    np.testing.assert_allclose(back["density"], f0["density"])


@pytest.mark.slow
def test_multilevel_restart_determinism(tmp_path):
    """2-level checkpoint mid-run + restart == uninterrupted run
    (Amr::checkPoint/restart; the Euler_restart regression analogue at
    AMR depth). Bitwise: the restart resumes the same jitted program on
    identical state."""
    from iamr_tpu.ns.driver import run_from_inputs

    inputs = "/root/reference/Exec/run3d/regtest.3d.euler"
    common = (
        "amr.max_level=1", "amr.n_cell=16 16 16", "amr.regrid_int=0",
        "amr.plot_int=-1",
    )
    ref = run_from_inputs(
        inputs, overrides=common + ("max_step=4", "amr.check_int=-1")
    )
    chk = run_from_inputs(
        inputs,
        overrides=common + (
            "max_step=2", f"amr.check_file={tmp_path}/chk", "amr.check_int=2",
        ),
    )
    out = run_from_inputs(
        inputs,
        overrides=common + (
            "max_step=4", f"amr.restart={tmp_path}/chk00002",
            "amr.check_int=-1",
        ),
    )
    for lvl in ("crse", "fine"):
        for f in ("vel", "rho", "p", "gradp", "trac"):
            a = np.asarray(getattr(getattr(out, lvl), f))
            b = np.asarray(getattr(getattr(ref, lvl), f))
            np.testing.assert_allclose(a, b, atol=1e-13, err_msg=f"{lvl}.{f}")


@pytest.mark.slow
def test_particle_restart_determinism(tmp_path):
    """Checkpoints carry the tracer particles (the reference stores the
    particle container in chk*/; restart_from_nonparticle_chkfile covers
    missing sidecars): checkpoint mid-run + restart reproduces the
    uninterrupted particle trajectories exactly."""
    from iamr_tpu.ns.driver import run_from_inputs

    inputs = "/root/reference/Exec/run_2d_particles/regtest.inputs"
    common = (
        "amr.max_level=0", "amr.plot_int=-1",
        f"particles.timestamp_dir={tmp_path}/ts",
    )
    run_from_inputs(
        inputs,
        overrides=common + (
            "max_step=4", "amr.check_int=-1",
            f"particles.particle_output_file={tmp_path}/ref_particles",
        ),
    )
    run_from_inputs(
        inputs,
        overrides=common + (
            "max_step=2", f"amr.check_file={tmp_path}/chk", "amr.check_int=2",
        ),
    )
    run_from_inputs(
        inputs,
        overrides=common + (
            "max_step=4", f"amr.restart={tmp_path}/chk00002",
            "amr.check_int=-1",
            f"particles.particle_output_file={tmp_path}/out_particles",
        ),
    )
    a = np.loadtxt(f"{tmp_path}/ref_particles", skiprows=1)
    b = np.loadtxt(f"{tmp_path}/out_particles", skiprows=1)
    np.testing.assert_allclose(b, a, atol=1e-14)


def test_multibox_plotfile_level(tmp_path):
    """A fine level with a BoxArray of several grids: one FAB file per
    grid, Cell_H lists them all, the Header's per-level section carries
    the grid count and per-grid physical extents."""
    from iamr_tpu.io.plotfile import write_plotfile

    geom = Geometry((16, 16), (0.0, 0.0), (1.0, 1.0), (True, True), 0)
    rng = np.random.RandomState(3)
    f0 = {"density": rng.randn(16, 16)}
    g1 = ({"density": rng.randn(8, 8)}, (2, 2))
    g2 = ({"density": rng.randn(6, 10)}, (20, 18))
    p = str(tmp_path / "plt00000")
    write_plotfile(p, geom, f0, time=0.5, fine_levels=[([g1, g2], 2)])
    hdr = open(p + "/Header").read().splitlines()
    assert hdr[5] == "1"  # finest_level
    cellh = open(p + "/Level_1/Cell_H").read()
    assert cellh.count("FabOnDisk") == 2
    assert os.path.exists(p + "/Level_1/Cell_D_00001")
    # per-level section: "1 2 <time>" (level 1 has 2 grids)
    assert any(l.startswith("1 2 ") for l in hdr)
