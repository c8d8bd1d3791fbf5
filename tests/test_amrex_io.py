"""AMReX-format checkpoint interop (io/amrex_chk.py) and VisMF FabOnDisk
offset semantics.

The reference's checkpoints are AMReX chk directories (NavierStokesBase::
checkPoint via VisMF, cpp:856-897); restart must accept them
(cpp:2684-2727), and the plotfile/checkpoint FAB offsets must follow the
VisMF convention (offset = FAB header start; AMReX's VisMF::readFAB and
yt both seek there and skip the header line) for fcompare/amrvis/yt to
read our files."""

import os

import numpy as np
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.io.amrex_chk import (
    read_checkpoint_amrex,
    write_checkpoint_amrex,
)
from iamr_tpu.io.checkpoint import (
    load_checkpoint,
    load_checkpoint_ml,
    save_checkpoint,
)
from iamr_tpu.io.plotfile import write_plotfile
from iamr_tpu.io.vismf import box_str, write_vismf
from iamr_tpu.ns.driver import initialize
from iamr_tpu.ns.state import config_from_inputs


def _cfg(n=8, dim=2, extra=""):
    d = " ".join([str(n)] * dim)
    per = " ".join(["1"] * dim)
    return config_from_inputs(ParmParse.from_string(f"""
        amr.n_cell = {d}
        ns.cfl = 0.5
        ns.init_iter = 1
        ns.vel_visc_coef = 1e-3
        geometry.is_periodic = {per}
        prob.probtype = 11
        prob.velocity_factor = 1.0
        {extra}
    """))


def _rand_state(cfg, seed=0):
    from iamr_tpu.ns.state import NSState

    rng = np.random.RandomState(seed)
    n = cfg.geom.ncell
    dim = cfg.dim
    return NSState(
        vel=jnp.asarray(rng.standard_normal((dim,) + n)),
        rho=jnp.asarray(1.0 + rng.rand(*n)),
        trac=jnp.asarray(rng.rand(cfg.ntrac, *n)),
        temp=jnp.asarray(1.0 + rng.rand(*n)),
        p=jnp.asarray(rng.standard_normal(tuple(x + 1 for x in n))),
        gradp=jnp.asarray(rng.standard_normal((dim,) + n)),
        time=jnp.asarray(0.25),
        dt=jnp.asarray(0.01),
        dsdt=(jnp.asarray(rng.rand(*n)) if cfg.do_temp else None),
    )


def test_fab_offset_points_at_header(tmp_path):
    """FabOnDisk offsets must locate the FAB *header* (AMReX/yt seek there
    and readline() past it), not the payload."""
    from iamr_tpu.core.geometry import Geometry

    geom = Geometry(ncell=(6, 4), prob_lo=(0.0, 0.0), prob_hi=(1.0, 1.0),
                    periodic=(True, True))
    p = str(tmp_path / "plt")
    write_plotfile(p, geom, {"density": np.arange(24.0).reshape(6, 4)})
    hdr = open(os.path.join(p, "Level_0", "Cell_H")).read().splitlines()
    fab_line = next(ln for ln in hdr if ln.startswith("FabOnDisk:"))
    fname, offset = fab_line.split()[1], int(fab_line.split()[2])
    with open(os.path.join(p, "Level_0", fname), "rb") as f:
        f.seek(offset)
        assert f.read(4) == b"FAB ", "offset does not point at a FAB header"


def test_amrex_checkpoint_roundtrip_two_level(tmp_path):
    """write_checkpoint_amrex -> read back: exact (the npz path's bar)."""
    from iamr_tpu.amr.hierarchy import LevelSpec

    # do_temp on: temp (and dsdt) travel in the checkpoint like the
    # reference's Divu/Dsdt state types
    cfg = _cfg(8, extra="ns.do_temp = 1\nns.temp_cond_coef = 0.01")
    crse = _rand_state(cfg, 1)
    fine = _rand_state(cfg, 2)._replace(dt=jnp.asarray(0.005))
    spec = LevelSpec(lo=(4, 4), ncell=(8, 8), ratio=2)
    p = str(tmp_path / "chk00007")
    write_checkpoint_amrex(p, [crse, fine], [spec], cfg, step=7)

    states, specs, step = read_checkpoint_amrex(p, cfg)
    assert step == 7 and len(states) == 2
    assert specs[0].lo == (4, 4) and specs[0].ratio == 2
    for a, b in zip(states, [crse, fine]):
        for f in ("vel", "rho", "trac", "temp", "p", "gradp", "dsdt"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), f
            )
        assert float(a.dt) == float(b.dt)
    assert float(states[0].time) == 0.25

    # and load_checkpoint_ml auto-detects the format
    states2, specs2, step2 = load_checkpoint_ml(p, cfg)
    assert step2 == 7 and len(states2) == 2
    np.testing.assert_array_equal(
        np.asarray(states2[1].vel), np.asarray(fine.vel)
    )


def test_reference_style_checkpoint_restarts(tmp_path):
    """A chk directory written the way the C++ writes it — dump_old (2 MF
    entries, old+new), a multi-FAB BoxArray, AMReX's stream formatting of
    Geometry/IntVect lines, and NO Gradp state — must restart: tolerant
    Header parse, new-data selection, box pasting, Gp recomputed from p
    (ns.gradp_in_checkpoint=0 semantics, NavierStokesBase.cpp:2714-2724)."""
    cfg = _cfg(8)
    rng = np.random.RandomState(3)
    n = (8, 8)
    vel = rng.standard_normal((2,) + n)
    rho = 1.0 + rng.rand(*n)
    trac = rng.rand(1, *n)
    p = rng.standard_normal((9, 9))
    state_data = np.concatenate([vel, rho[None], trac], 0)

    chk = str(tmp_path / "chk00006")
    lev = os.path.join(chk, "Level_0")
    os.makedirs(lev)
    # State_Type as TWO fabs (left/right halves), old AND new dumped
    left = state_data[:, :4, :]
    right = state_data[:, 4:, :]
    write_vismf(os.path.join(lev, "SD_0_New_MF"),
                [(left, (0, 0), (3, 7)), (right, (4, 0), (7, 7))], 4)
    write_vismf(os.path.join(lev, "SD_0_Old_MF"),
                [(0.0 * left, (0, 0), (3, 7)),
                 (0.0 * right, (4, 0), (7, 7))], 4)
    write_vismf(os.path.join(lev, "SD_1_New_MF"),
                [(p[None], (0, 0), (8, 8))], 1, typ=(1, 1))
    # no SD_2 (Gradp): older-checkpoint back-compat path

    hdr = "\n".join([
        "CheckPointVersion_1.0",
        "2",
        "0.75",
        "0",
        "0",
        "(0 (0,0)(0.125,0.125))(RealBox 0 1 0 1 )((0,0) (7,7) (0,0))P(1,1)",
        "",              # ref_ratio (none: single level)
        "0.02 ",         # dt_level
        "0.02 ",         # dt_min
        "1 ",            # n_cycle
        "6 ",            # level_steps
        "0 ",            # level_count
        "0",
        "(0 (0,0)(0.125,0.125))(RealBox 0 1 0 1 )((0,0) (7,7) (0,0))P(1,1)",
        "(2 0",
        "((0,0) (3,7) (0,0))",
        "((4,0) (7,7) (0,0))",
        ")",
        "((0,0) (7,7) (0,0))",
        "(2 0",
        "((0,0) (3,7) (0,0))",
        "((4,0) (7,7) (0,0))",
        ")",
        "0.73", "0.73", "0.75", "0.75",
        "2",
        "Level_0/SD_0_New_MF",
        "Level_0/SD_0_Old_MF",
        "((0,0) (8,8) (1,1))",
        "(1 0",
        "((0,0) (8,8) (1,1))",
        ")",
        "0.73", "0.73", "0.75", "0.75",
        "1",
        "Level_0/SD_1_New_MF",
    ]) + "\n"
    with open(os.path.join(chk, "Header"), "w") as f:
        f.write(hdr)

    state, step = load_checkpoint(chk, cfg)
    assert step == 6
    np.testing.assert_array_equal(np.asarray(state.vel), vel)
    np.testing.assert_array_equal(np.asarray(state.rho), rho)
    np.testing.assert_array_equal(np.asarray(state.p), p)
    assert float(state.time) == 0.75 and float(state.dt) == 0.02
    # Gp recomputed from the pressure (not zeros)
    assert float(jnp.max(jnp.abs(state.gradp))) > 0.0


def test_amrex_restart_matches_npz_restart(tmp_path):
    """Continuing a run from an amrex-format checkpoint must produce the
    same trajectory as continuing from the npz checkpoint of the same
    state (Euler_restart determinism, Test/IAMR-tests.ini:115-127)."""
    from iamr_tpu.ns.advance import make_step

    cfg = _cfg(16)
    state = initialize(cfg)
    step_fn = make_step(cfg)
    for _ in range(2):
        state = step_fn(state)

    p_npz = str(tmp_path / "chknpz")
    p_amx = str(tmp_path / "chkamx")
    save_checkpoint(p_npz, state, step=2)
    write_checkpoint_amrex(p_amx, [state], [], cfg, step=2)

    s_npz, st1 = load_checkpoint(p_npz, cfg)
    s_amx, st2 = load_checkpoint(p_amx, cfg)
    assert st1 == st2 == 2
    out_npz = step_fn(s_npz)
    out_amx = step_fn(s_amx)
    np.testing.assert_array_equal(
        np.asarray(out_npz.vel), np.asarray(out_amx.vel)
    )
    np.testing.assert_array_equal(
        np.asarray(out_npz.p), np.asarray(out_amx.p)
    )


def test_velocity_plotfile_ingestion(tmp_path):
    """ns.velocity_plotfile ADDS scale * plotfile velocity to the IC
    (BL_USE_VELOCITY, NavierStokes.cpp:356-422)."""
    from iamr_tpu.ns.probs import init_state

    rng = np.random.RandomState(5)
    n = (8, 8)
    u = rng.standard_normal(n)
    v = rng.standard_normal(n)
    cfg0 = _cfg(8)
    p = str(tmp_path / "plt_vel")
    write_plotfile(p, cfg0.geom, {
        "x_velocity": u, "y_velocity": v, "density": np.ones(n),
    })

    cfg = _cfg(8, extra=f"""
        ns.velocity_plotfile = {p}
        ns.velocity_plotfile_scale = 0.5
    """)
    base = init_state(cfg0)
    st = init_state(cfg)
    np.testing.assert_allclose(
        np.asarray(st.vel[0]), np.asarray(base.vel[0]) + 0.5 * u, rtol=0,
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(st.vel[1]), np.asarray(base.vel[1]) + 0.5 * v, rtol=0,
        atol=1e-14,
    )
