"""Anisotropic-grid nodal solves and the inputs-filename dimension hint.

Both bugs surfaced running the reference FlowPastCylinder tutorial
(Tutorials/FlowPastCylinder/inputs.2d.flow_past_cylinder-x): its
`amr.n_cell = 64 64 16` mis-detected as a 3D run (the reference fixes DIM
at compile time, amr2d.ex), and the resulting thin-z anisotropic domain
made the fixed-omega nodal Jacobi smoother diverge (residual ~9e35)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)


def test_nodal_solve_anisotropic_converges():
    from iamr_tpu.ops.mg_nodal import (N_DIRICHLET, N_NEUMANN, N_PERIODIC,
                                       NodalBC, div_cell_to_node, nodal_solve)

    n = (32, 32, 16)
    bc = NodalBC((N_NEUMANN, N_PERIODIC, N_PERIODIC),
                 (N_DIRICHLET, N_PERIODIC, N_PERIODIC))
    rng = np.random.RandomState(5)
    sigma = jnp.ones(n, jnp.float64)
    u = tuple(jnp.asarray(rng.rand(*n) - 0.5, jnp.float64) for _ in range(3))
    for dxs in ((1 / 32, 1 / 32, 1 / 64), (1 / 32, 1 / 32, 1 / 16)):
        rhs = div_cell_to_node(u, dxs, bc)
        phi, res, it = nodal_solve(rhs, sigma, dxs, bc, rtol=1e-10, atol=0.0,
                                   max_vcycles=60)
        bn = float(jnp.max(jnp.abs(rhs)))
        assert float(res) / bn < 1e-10, (dxs, float(res) / bn, int(it))


def test_safe_omega_values():
    from iamr_tpu.ops.mg_nodal import _jacobi_safe_omega

    # isotropic: the tuned damping is preserved exactly
    assert _jacobi_safe_omega((0.1, 0.1), 2) == 0.85
    assert _jacobi_safe_omega((0.1, 0.1, 0.1), 3) == 0.85
    # 2:1 anisotropy: damping shrinks below the divergence threshold
    w = _jacobi_safe_omega((0.1, 0.1, 0.05), 3)
    assert 0.0 < w < 0.85


def test_dim_hint_from_path():
    from iamr_tpu.ns.state import dim_hint_from_path

    assert dim_hint_from_path("inputs.2d.flow_past_cylinder-x") == 2
    assert dim_hint_from_path("/a/b/regtest.3d.euler") == 3
    assert dim_hint_from_path("inputs.3d.forced") == 3
    assert dim_hint_from_path("inputs_2d") == 2
    assert dim_hint_from_path("inputs.hit") is None
    # no false positive on e.g. "p2d5" style tokens inside words
    assert dim_hint_from_path("grid2dump") is None


def test_2d_tutorial_with_3component_ncell_parses_as_2d():
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.state import config_from_inputs, dim_hint_from_path

    path = ("/root/reference/Tutorials/FlowPastCylinder/"
            "inputs.2d.flow_past_cylinder-x")
    pp = ParmParse.from_file(path, ["amr.max_level=0"])
    cfg = config_from_inputs(pp, dim_hint=dim_hint_from_path(path))
    assert cfg.dim == 2
    assert cfg.geom.ncell == (64, 64)


@pytest.mark.slow
def test_flow_past_cylinder_tutorial_runs():
    """The reference FlowPastCylinder 2D tutorial inputs run NaN-free
    through the driver (previously: parsed as 3D, nodal MG diverged,
    dt collapsed to ~1e-138)."""
    from iamr_tpu.ns.driver import run_from_inputs

    state = run_from_inputs(
        "/root/reference/Tutorials/FlowPastCylinder/"
        "inputs.2d.flow_past_cylinder-x",
        overrides=("max_step=3", "amr.max_level=0", "ns.init_iter=1",
                   "amr.plot_int=-1", "amr.check_int=-1"),
    )
    assert bool(jnp.all(jnp.isfinite(state.vel)))
    m = float(jnp.max(jnp.abs(state.vel)))
    assert 0.5 < m < 10.0, m
