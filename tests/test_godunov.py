"""Godunov advection tests: slope limiters against oracles, constancy
preservation, translation accuracy, and MAC prediction sanity."""

import jax.numpy as jnp
import numpy as np

from iamr_tpu.core.bc import BCRec, MathBC
from iamr_tpu.core.fill import fill_ghost
from iamr_tpu.ops.godunov import (
    compute_edge_states,
    compute_fluxes_and_aofs,
    extrap_vel_to_faces,
    grow_umac_transverse,
    slope2,
    slope4,
)

I2 = BCRec(lo=(MathBC.int_dir, MathBC.int_dir), hi=(MathBC.int_dir, MathBC.int_dir))


def test_slopes_exact_for_smooth_monotone():
    # linear data: slope = exact derivative * 1 (per-cell units)
    n = 16
    q = jnp.arange(n, dtype=jnp.float64)[:, None] * jnp.ones((n, n))
    s2 = slope2(q, 0)
    np.testing.assert_allclose(np.asarray(s2), 1.0, rtol=1e-14)
    s4 = slope4(q, 0)
    np.testing.assert_allclose(np.asarray(s4), 1.0, rtol=1e-14)


def test_slopes_limited_at_extrema():
    q = jnp.asarray([0.0, 1.0, 0.0, 1.0, 0.0, 1.0])[:, None] * jnp.ones((6, 4))
    s2 = slope2(q, 0)
    np.testing.assert_allclose(np.asarray(s2), 0.0, atol=1e-14)
    s4 = slope4(q, 0)
    np.testing.assert_allclose(np.asarray(s4), 0.0, atol=1e-14)


def _gauss(n, cx, cy, w=0.1):
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    r2 = np.minimum((X - cx) % 1.0, (cx - X) % 1.0) ** 2 + np.minimum(
        (Y - cy) % 1.0, (cy - Y) % 1.0
    ) ** 2
    return np.exp(-r2 / (2 * w * w)), dx


def _advect_steps(s0, umac, dt, dx, nsteps, iconserv, periodic=(True, True), scheme="plm"):
    s = jnp.asarray(s0)
    umac_g = grow_umac_transverse(umac, periodic)
    for _ in range(nsteps):
        sg = fill_ghost(s, 3, I2)
        edges = compute_edge_states(sg, umac_g, dt, (dx, dx), s.shape, iconserv, periodic=periodic, scheme=scheme)
        _, aofs = compute_fluxes_and_aofs(
            edges, umac, (dx, dx), iconserv, s_cc=s
        )
        s = s - dt * aofs
    return np.asarray(s)


def test_constancy_preservation():
    # constant field advected by any div-free umac stays constant
    n = 32
    dx = 1.0 / n
    rng = np.random.default_rng(0)
    # build div-free umac from a streamfunction on nodes
    psi = rng.standard_normal((n + 1, n + 1)) * dx  # velocities O(1), CFL=0.2
    psi[-1, :] = psi[0, :]
    psi[:, -1] = psi[:, 0]
    u = (psi[:, 1:] - psi[:, :-1]) / dx  # x-faces: d psi / dy
    v = -(psi[1:, :] - psi[:-1, :]) / dx
    umac = (jnp.asarray(u), jnp.asarray(v))
    s0 = np.full((n, n), 3.7)
    s = _advect_steps(s0, umac, 0.2 * dx, dx, 5, iconserv=True)
    np.testing.assert_allclose(s, 3.7, rtol=1e-13)
    s = _advect_steps(s0, umac, 0.2 * dx, dx, 5, iconserv=False)
    np.testing.assert_allclose(s, 3.7, rtol=1e-13)


def test_conservation():
    n = 32
    dx = 1.0 / n
    s0, _ = _gauss(n, 0.5, 0.5)
    rng = np.random.default_rng(1)
    psi = rng.standard_normal((n + 1, n + 1)) * dx  # velocities O(1), CFL=0.2
    psi[-1, :] = psi[0, :]
    psi[:, -1] = psi[:, 0]
    u = (psi[:, 1:] - psi[:, :-1]) / dx
    v = -(psi[1:, :] - psi[:-1, :]) / dx
    umac = (jnp.asarray(u), jnp.asarray(v))
    s = _advect_steps(s0, umac, 0.1 * dx, dx, 10, iconserv=True)
    np.testing.assert_allclose(s.sum(), s0.sum(), rtol=1e-12)


def test_translation_convergence():
    # uniform-velocity translation of a smooth periodic profile: O(dx^2)
    # in L2 (max-norm degrades at extrema under the limiter, as expected)
    errs = []
    for n in (32, 64):
        dx = 1.0 / n
        x = (np.arange(n) + 0.5) * dx
        X, Y = np.meshgrid(x, x, indexing="ij")
        s0 = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y) + 2.0
        vel = (1.0, 0.5)
        umac = (
            jnp.full((n + 1, n), vel[0]),
            jnp.full((n, n + 1), vel[1]),
        )
        dt = 0.5 * dx / max(vel)
        T = 0.25
        nsteps = int(round(T / dt))
        dt = T / nsteps
        s = _advect_steps(s0, umac, dt, dx, nsteps, iconserv=False)
        exact = (
            np.sin(2 * np.pi * (X - vel[0] * T)) * np.sin(2 * np.pi * (Y - vel[1] * T))
            + 2.0
        )
        errs.append(np.sqrt(np.mean((s - exact) ** 2)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.7, (order, errs)


def test_extrap_vel_uniform_flow():
    # uniform velocity + zero force must predict exactly that on all faces
    n = 16
    dx = 1.0 / n
    vel = np.zeros((2, n, n))
    vel[0] = 0.7
    vel[1] = -0.3
    bcrecs = [I2, I2]
    vel_g = jnp.stack([fill_ghost(jnp.asarray(vel[c]), 3, I2) for c in range(2)])
    force_g = jnp.zeros((2, n + 2, n + 2))
    umac = extrap_vel_to_faces(
        vel_g, force_g, 0.01, (dx, dx), (n, n), bcrecs,
        bcvals_lo=((0.0, 0.0), (0.0, 0.0)), bcvals_hi=((0.0, 0.0), (0.0, 0.0)),
    )
    assert umac[0].shape == (n + 1, n)
    assert umac[1].shape == (n, n + 1)
    np.testing.assert_allclose(np.asarray(umac[0]), 0.7, rtol=1e-14)
    np.testing.assert_allclose(np.asarray(umac[1]), -0.3, rtol=1e-14)


def test_extrap_vel_noslip_walls():
    # no-slip box: normal velocities on boundary faces must be exactly zero
    n = 16
    dx = 1.0 / n
    from iamr_tpu.core.bc import PhysBC, velocity_bcrec

    phys = [PhysBC.NoSlipWall, PhysBC.NoSlipWall]
    bcrecs = [velocity_bcrec(phys, phys, c) for c in range(2)]
    rng = np.random.default_rng(2)
    vel = rng.standard_normal((2, n, n)) * 0.1
    vel_g = jnp.stack(
        [fill_ghost(jnp.asarray(vel[c]), 3, bcrecs[c]) for c in range(2)]
    )
    force_g = jnp.zeros((2, n + 2, n + 2))
    umac = extrap_vel_to_faces(
        vel_g, force_g, 0.01, (dx, dx), (n, n), bcrecs,
        bcvals_lo=((0.0, 0.0), (0.0, 0.0)), bcvals_hi=((0.0, 0.0), (0.0, 0.0)),
    )
    np.testing.assert_allclose(np.asarray(umac[0][0, :]), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(umac[0][-1, :]), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(umac[1][:, 0]), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(umac[1][:, -1]), 0.0, atol=1e-15)


def test_3d_translation_smoke():
    n = 16
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    s0 = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    umac = (
        jnp.full((n + 1, n, n), 1.0),
        jnp.full((n, n + 1, n), 0.0),
        jnp.full((n, n, n + 1), 0.0),
    )
    bc3 = BCRec(lo=(MathBC.int_dir,) * 3, hi=(MathBC.int_dir,) * 3)
    s = jnp.asarray(s0)
    umac_g = grow_umac_transverse(umac, (True, True, True))
    dt = 0.5 * dx
    for _ in range(4):
        sg = fill_ghost(s, 3, bc3)
        edges = compute_edge_states(sg, umac_g, dt, (dx,) * 3, s.shape, False, periodic=(True,) * 3)
        _, aofs = compute_fluxes_and_aofs(edges, umac, (dx,) * 3, False, s_cc=s)
        s = s - dt * aofs
    exact = np.sin(2 * np.pi * (X - 4 * dt)) * np.cos(2 * np.pi * Y)
    assert np.max(np.abs(np.asarray(s) - exact)) < 0.05


# ---------------------------------------------------------------------------
# PPM (Godunov_PPM) — parabolic normal predictor


def test_ppm_constancy_and_conservation():
    n = 32
    dx = 1.0 / n
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((n + 1, n + 1)) * dx
    psi[-1, :] = psi[0, :]
    psi[:, -1] = psi[:, 0]
    u = (psi[:, 1:] - psi[:, :-1]) / dx
    v = -(psi[1:, :] - psi[:-1, :]) / dx
    umac = (jnp.asarray(u), jnp.asarray(v))
    s0 = np.full((n, n), 3.7)
    s = _advect_steps(s0, umac, 0.2 * dx, dx, 5, iconserv=True, scheme="ppm")
    np.testing.assert_allclose(s, 3.7, rtol=1e-12)
    g0, _ = _gauss(n, 0.5, 0.5)
    g = _advect_steps(g0, umac, 0.1 * dx, dx, 10, iconserv=True, scheme="ppm")
    np.testing.assert_allclose(g.sum(), g0.sum(), rtol=1e-12)


def test_ppm_beats_plm_on_smooth_translation():
    # PPM's parabolic reconstruction should be at least as accurate as PLM
    # on a smooth translated profile, and at least 2nd order
    errs = {"plm": [], "ppm": []}
    for n in (32, 64):
        dx = 1.0 / n
        x = (np.arange(n) + 0.5) * dx
        X, Y = np.meshgrid(x, x, indexing="ij")
        s0 = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y) + 2.0
        vel = (1.0, 0.5)
        umac = (jnp.full((n + 1, n), vel[0]), jnp.full((n, n + 1), vel[1]))
        dt = 0.5 * dx / max(vel)
        T = 0.25
        nsteps = int(round(T / dt))
        dt = T / nsteps
        exact = (
            np.sin(2 * np.pi * (X - vel[0] * T)) * np.sin(2 * np.pi * (Y - vel[1] * T))
            + 2.0
        )
        for scheme in ("plm", "ppm"):
            s = _advect_steps(s0, umac, dt, dx, nsteps, iconserv=False, scheme=scheme)
            errs[scheme].append(np.sqrt(np.mean((s - exact) ** 2)))
    order = np.log2(errs["ppm"][0] / errs["ppm"][1])
    assert order > 1.7, (order, errs)
    assert errs["ppm"][1] <= errs["plm"][1] * 1.1, errs


def test_ppm_end_to_end_vortex():
    # full step with ns.advection_scheme = Godunov_PPM stays finite and
    # sane on the ConvectedVortex config (probtype 8)
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.state import config_from_inputs
    from iamr_tpu.ns.driver import initialize, run

    pp = ParmParse.from_string(
        """
        max_step = 3
        ns.cfl = 0.5
        ns.init_iter = 1
        ns.advection_scheme = Godunov_PPM
        amr.n_cell = 32 32
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        prob.probtype = 8
        prob.density_ic = 1.0
        prob.velocity_ic = 1.0 0.0
        prob.forcevort = 0.3
        """
    )
    cfg = config_from_inputs(pp)
    state = run(cfg, max_steps=3)
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    assert float(jnp.max(jnp.abs(state.vel))) < 3.0


# ---------------------------------------------------------------------------
# BDS (ns.advection_scheme = BDS)


def test_bds_constancy_and_conservation():
    n = 32
    dx = 1.0 / n
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((n + 1, n + 1)) * dx
    psi[-1, :] = psi[0, :]
    psi[:, -1] = psi[:, 0]
    u = (psi[:, 1:] - psi[:, :-1]) / dx
    v = -(psi[1:, :] - psi[:-1, :]) / dx
    umac = (jnp.asarray(u), jnp.asarray(v))
    s0 = np.full((n, n), 3.7)
    s = _advect_steps(s0, umac, 0.2 * dx, dx, 5, iconserv=True, scheme="bds")
    np.testing.assert_allclose(s, 3.7, rtol=1e-12)
    g0, _ = _gauss(n, 0.5, 0.5)
    g = _advect_steps(g0, umac, 0.1 * dx, dx, 10, iconserv=True, scheme="bds")
    np.testing.assert_allclose(g.sum(), g0.sum(), rtol=1e-12)


def test_bds_monotone_and_second_order():
    # square-wave advection stays within bounds (limiter); smooth profile
    # converges at 2nd order
    n = 64
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    sq = ((np.abs(X - 0.5) < 0.15) & (np.abs(Y - 0.5) < 0.15)).astype(float)
    umac = (jnp.full((n + 1, n), 1.0), jnp.full((n, n + 1), 0.5))
    s = _advect_steps(sq, umac, 0.4 * dx, dx, 20, iconserv=True, scheme="bds")
    # edge states are convex combinations of limited in-cell profile values
    # (exact piecewise corner coupling, ops/bds.py); the unsplit flux-form
    # update still admits ~1% square-wave over/undershoot, as in the
    # reference's BDS
    assert s.min() > -0.01 and s.max() < 1.01, (s.min(), s.max())

    # high transverse CFL (0.9): the corner-coupling regime the gamma terms
    # exist for — bounds stay at the few-percent level and mass is exact
    um2 = (jnp.full((n + 1, n), 1.0), jnp.full((n, n + 1), 1.0))
    s2 = _advect_steps(sq, um2, 0.9 * dx, dx, 20, iconserv=True, scheme="bds")
    assert s2.min() > -0.02 and s2.max() < 1.03, (s2.min(), s2.max())
    np.testing.assert_allclose(s2.sum(), sq.sum(), rtol=1e-12)

    errs = []
    for nn in (32, 64):
        dxx = 1.0 / nn
        xx = (np.arange(nn) + 0.5) * dxx
        XX, YY = np.meshgrid(xx, xx, indexing="ij")
        s0 = np.sin(2 * np.pi * XX) * np.sin(2 * np.pi * YY) + 2.0
        vel = (1.0, 0.5)
        um = (jnp.full((nn + 1, nn), vel[0]), jnp.full((nn, nn + 1), vel[1]))
        dt = 0.5 * dxx / max(vel)
        T = 0.25
        nsteps = int(round(T / dt))
        dt = T / nsteps
        s = _advect_steps(s0, um, dt, dxx, nsteps, iconserv=False, scheme="bds")
        exact = (
            np.sin(2 * np.pi * (XX - vel[0] * T))
            * np.sin(2 * np.pi * (YY - vel[1] * T))
            + 2.0
        )
        errs.append(np.sqrt(np.mean((s - exact) ** 2)))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.6, (order, errs)


def test_bds_3d_translation():
    n = 16
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    s0 = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) + 2.0
    vel = (1.0, 0.5, 0.25)
    umac = (
        jnp.full((n + 1, n, n), vel[0]),
        jnp.full((n, n + 1, n), vel[1]),
        jnp.full((n, n, n + 1), vel[2]),
    )
    I3 = BCRec(lo=(MathBC.int_dir,) * 3, hi=(MathBC.int_dir,) * 3)
    s = jnp.asarray(s0)
    dt = 0.5 * dx
    umac_g = grow_umac_transverse(umac, (True,) * 3)
    for _ in range(8):
        sg = fill_ghost(s, 3, I3)
        edges = compute_edge_states(
            sg, umac_g, dt, (dx,) * 3, s.shape, True, periodic=(True,) * 3,
            scheme="bds",
        )
        _, aofs = compute_fluxes_and_aofs(edges, umac, (dx,) * 3, True)
        s = s - dt * aofs
    s = np.asarray(s)
    T = 8 * dt
    exact = (
        np.sin(2 * np.pi * (X - vel[0] * T)) * np.cos(2 * np.pi * (Y - vel[1] * T))
        + 2.0
    )
    assert np.sqrt(np.mean((s - exact) ** 2)) < 0.1
    np.testing.assert_allclose(s.sum(), s0.sum(), rtol=1e-12)


def test_bds_end_to_end_from_reference_inputs():
    # the BDS tracer-advection regtest config (2D), short run
    from iamr_tpu.ns.driver import run_from_inputs

    state = run_from_inputs(
        "/root/reference/Exec/run2d/regtest.2d.traceradvect_bds",
        overrides=(
            "max_step=3", "amr.max_level=0", "ns.init_iter=1",
            "amr.plot_int=-1", "amr.check_int=-1", "amr.n_cell=32 32",
        ),
    )
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    t = state.trac[0]
    # few-percent bound: unsplit flux-form over/undershoot (see ops/bds.py)
    assert float(jnp.min(t)) > -0.05 and float(jnp.max(t)) < 1.05
