"""Tracer-particle advection tests + HIT forcing/IC sanity."""

import pytest
import numpy as np
import jax.numpy as jnp

from iamr_tpu.core.geometry import Geometry
from iamr_tpu.ns.forcing_hit import HITForcing, init_hit_velocity
from iamr_tpu.ns.particles import (
    advect_with_umac,
    from_positions,
    particle_count,
    read_ascii_init_file,
    redistribute,
)

pytestmark = pytest.mark.slow


def _geom2(n=16, periodic=True):
    return Geometry(
        ncell=(n, n), prob_lo=(0.0, 0.0), prob_hi=(1.0, 1.0),
        periodic=(periodic, periodic),
    )


def test_uniform_translation():
    geom = _geom2()
    parts = from_positions([[0.25, 0.5], [0.7, 0.1]])
    umac = (jnp.full((17, 16), 0.5), jnp.full((16, 17), -0.25))
    dt = 0.1
    for _ in range(4):
        parts = advect_with_umac(parts, umac, dt, geom)
    np.testing.assert_allclose(
        np.asarray(parts.pos[0]), [(0.25 + 0.2) % 1, (0.5 - 0.1) % 1], rtol=1e-12
    )


def test_rotation_stays_on_circle():
    # solid-body-like rotation about domain center from a streamfunction
    n = 64
    geom = _geom2(n)
    dx = 1.0 / n
    xn = np.arange(n + 1) * dx
    xc = (np.arange(n) + 0.5) * dx
    # psi = -0.5 * r^2 (solid rotation omega=1)
    PSI = lambda x, y: -0.5 * ((x - 0.5) ** 2 + (y - 0.5) ** 2)
    psi_xfaces = PSI(xn[:, None], xc[None, :] * 0 + xc[None, :])
    u = np.zeros((n + 1, n))
    v = np.zeros((n, n + 1))
    # u = -dpsi/dy at x-faces
    psi_nodes = PSI(xn[:, None], xn[None, :])
    u = -(psi_nodes[:, 1:] - psi_nodes[:, :-1]) / dx
    v = (psi_nodes[1:, :] - psi_nodes[:-1, :]) / dx
    parts = from_positions([[0.8, 0.5]])
    dt = 0.02
    r0 = 0.3
    for _ in range(50):
        parts = advect_with_umac(parts, (jnp.asarray(u), jnp.asarray(v)), dt, geom)
    p = np.asarray(parts.pos[0])
    r = np.hypot(p[0] - 0.5, p[1] - 0.5)
    assert abs(r - r0) < 2e-3, (r, r0)


def test_redistribute_kills_escapees():
    geom = _geom2(periodic=False)
    parts = from_positions([[0.5, 0.5], [1.2, 0.5], [-0.1, 0.3]])
    parts = redistribute(parts, geom)
    np.testing.assert_array_equal(np.asarray(parts.alive), [True, False, False])


def test_particle_count():
    geom = _geom2(4)
    parts = from_positions([[0.1, 0.1], [0.12, 0.13], [0.9, 0.9]])
    cnt = particle_count(parts, geom)
    assert int(cnt[0, 0]) == 2
    assert int(cnt[3, 3]) == 1
    assert int(jnp.sum(cnt)) == 3


def test_ascii_init_file(tmp_path):
    p = tmp_path / "particle_file"
    p.write_text("3\n0.1 0.2\n0.3 0.4\n0.5 0.6\n")
    pos = read_ascii_init_file(str(p), 2)
    assert pos.shape == (3, 2)
    np.testing.assert_allclose(pos[2], [0.5, 0.6])


def _geom3(n=16):
    return Geometry(
        ncell=(n, n, n), prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3,
        periodic=(True,) * 3,
    )


def test_hit_forcing_divergence_free():
    geom = _geom3(32)
    f = HITForcing.create(geom, nmodes=2, div_free=True, seed=7)
    assert f.k.shape[0] > 5
    force = f.eval(geom, 0.3, dtype=jnp.float64)
    assert force.shape == (3, 32, 32, 32)
    assert bool(jnp.all(jnp.isfinite(force)))
    # spectral divergence of the analytic curl field: ~0 relative to |f|
    fh = [np.fft.fftn(np.asarray(force[c])) for c in range(3)]
    k = np.fft.fftfreq(32, d=1.0 / 32) * 2j * np.pi
    div = (
        fh[0] * k[:, None, None] + fh[1] * k[None, :, None] + fh[2] * k[None, None, :]
    )
    rel = np.abs(div).max() / max(np.abs(fh[0]).max(), 1e-30)
    assert rel < 1e-10, rel


def test_hit_forcing_time_modulation():
    geom = _geom3(8)
    f = HITForcing.create(geom, nmodes=1, seed=3)
    f0 = f.eval(geom, 0.0, dtype=jnp.float64)
    f1 = f.eval(geom, 0.5, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(f0 - f1))) > 1e-8  # time-varying


def test_hit_ic_properties():
    geom = _geom3(32)
    u = init_hit_velocity(geom, urms=1.5, kpeak=4.0, seed=1)
    rms = np.sqrt(np.mean(np.sum(u**2, axis=0)) / 3.0)
    np.testing.assert_allclose(rms, 1.5, rtol=1e-10)
    uh = [np.fft.fftn(u[c]) for c in range(3)]
    k = np.fft.fftfreq(32, d=1.0 / 32) * 2j * np.pi
    div = (
        uh[0] * k[:, None, None] + uh[1] * k[None, :, None] + uh[2] * k[None, None, :]
    )
    assert np.abs(div).max() / np.abs(uh[0]).max() < 1e-10


def test_particle_regtest_from_reference_inputs(tmp_path):
    """The Part-2d regression config (Exec/run_2d_particles/regtest.inputs):
    30 seeded particles from the ascii particle_file advect with the flow
    and write Timestamp output."""
    import os

    import jax.numpy as jnp

    from iamr_tpu.ns.driver import run_from_inputs

    os.chdir(tmp_path)  # timestamp_dir is relative
    state = run_from_inputs(
        "/root/reference/Exec/run_2d_particles/regtest.inputs",
        overrides=(
            "max_step=3", "amr.max_level=0", "ns.init_iter=1",
            "amr.plot_int=-1", "amr.check_int=-1",
        ),
    )
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    ts = tmp_path / "particle_dir" / "Timestamp"
    assert ts.exists()
    lines = ts.read_text().strip().splitlines()
    assert len(lines) == 3 * 30  # 3 steps x 30 particles


def test_hit_ic_from_csv_file(tmp_path):
    """prob.ic_file loads a gen_hit_ic.py-format spectral IC (Utilities
    read_csv path, Tutorials/HIT/prob_init.cpp:43-86)."""
    import numpy as np
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs

    n = 8
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                rows.append([i, j, k, *rng.randn(3)])
    f = tmp_path / "hit_ic.csv"
    np.savetxt(f, np.asarray(rows), delimiter=",", header="x,y,z,u,v,w")
    pp = ParmParse.from_string(
        f"""
        ns.cfl = 0.5
        amr.n_cell = 8 8 8
        geometry.is_periodic = 1 1 1
        prob.probtype = 100
        prob.ic_file = {f}
        prob.ic_n = 8
        """
    )
    cfg = config_from_inputs(pp)
    state = init_state(cfg)
    got = np.asarray(state.vel)
    want = np.asarray(rows)[:, 3:].T.reshape(3, n, n, n)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_read_binary_roundtrip(tmp_path):
    import numpy as np
    from iamr_tpu.utils.fileio import read_binary

    data = np.random.RandomState(1).randn(4, 3, 2, 6)
    f = tmp_path / "turb.bin"
    data.astype("<f8").tofile(f)
    back = read_binary(str(f), 4, 3, 2, 6)
    np.testing.assert_array_equal(back, data)


def test_read_fixed_grids():
    """amr.regrid_file parser (Tutorials/Particles/fixed_grids_ml)."""
    from iamr_tpu.amr.hierarchy import read_fixed_grids

    grids = read_fixed_grids(
        "/root/reference/Tutorials/Particles/fixed_grids_ml", 2
    )
    assert len(grids) == 2
    assert grids[0] == [((4, 4), (33, 33)), ((36, 40), (41, 49))]
    assert grids[1] == [((16, 20), (33, 33))]


def test_composite_mac_velocity_picks_finest():
    """Particles inside a fine patch advect with the fine umac; outside,
    with the coarse one (AmrTracerParticleContainer finest-containing-
    level semantics)."""
    from iamr_tpu.amr.hierarchy import LevelSpec
    from iamr_tpu.ns.particles import _composite_mac_velocity

    n = 16
    geom_c = Geometry(ncell=(n, n), prob_lo=(0.0, 0.0), prob_hi=(1.0, 1.0),
                      periodic=(True, True))
    spec = LevelSpec(lo=(8, 8), ncell=(16, 16), ratio=2)
    geom_f = spec.fine_geom(geom_c)
    umac_c = (jnp.full((n + 1, n), 1.0), jnp.full((n, n + 1), 0.5))
    # fine patch carries a DIFFERENT constant velocity
    nf = spec.ncell
    umac_f = (jnp.full((nf[0] + 1, nf[1]), 3.0),
              jnp.full((nf[0], nf[1] + 1), -1.0))
    # patch covers [0.25, 0.75)^2; one particle inside, one outside
    pos = jnp.asarray([[0.5, 0.5], [0.1, 0.9]])
    u = _composite_mac_velocity(
        [(umac_c, geom_c), (umac_f, geom_f)], pos
    )
    np.testing.assert_allclose(np.asarray(u[0]), [3.0, -1.0], atol=1e-13)
    np.testing.assert_allclose(np.asarray(u[1]), [1.0, 0.5], atol=1e-13)


@pytest.mark.slow
def test_particles_tutorial_runs():
    """The reference multilevel Particles tutorial (3 levels, fixed grids
    from amr.regrid_file, 4 tracer particles) runs verbatim and advects
    the particles."""
    import tempfile

    from iamr_tpu.ns.driver import run_from_inputs

    with tempfile.TemporaryDirectory() as td:
        states = run_from_inputs(
            "/root/reference/Tutorials/Particles/inputs_ml",
            overrides=(
                "max_step=2", f"particles.timestamp_dir={td}/pd",
                "amr.plot_int=-1", "amr.check_int=-1",
            ),
        )
        assert len(states) == 3  # max_level = 2
        import os

        ts = open(os.path.join(td, "pd", "Timestamp")).read().split("\n")
        rows = [r for r in ts if r.strip()]
        assert len(rows) == 8  # 4 particles x 2 steps
        # particles moved between the two steps
        r0 = [float(x) for x in rows[0].split()[2:]]
        r4 = [float(x) for x in rows[4].split()[2:]]
        assert any(abs(a - b) > 1e-6 for a, b in zip(r0, r4))
