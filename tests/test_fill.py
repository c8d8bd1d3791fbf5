import jax.numpy as jnp
import numpy as np
import pytest

from iamr_tpu.core.bc import (
    BCRec,
    MathBC,
    PhysBC,
    SCALAR_BC,
    make_bcrec,
    velocity_bcrec,
)
from iamr_tpu.core.fill import fill_ghost, interior


def _bc2(lo, hi):
    return BCRec(lo=(lo, lo), hi=(hi, hi))


def test_periodic_wrap():
    a = jnp.arange(12.0).reshape(3, 4)
    g = fill_ghost(a, 1, _bc2(MathBC.int_dir, MathBC.int_dir))
    assert g.shape == (5, 6)
    np.testing.assert_allclose(g[0, 1:-1], a[-1])
    np.testing.assert_allclose(g[-1, 1:-1], a[0])
    np.testing.assert_allclose(g[1:-1, 0], a[:, -1])
    # corner: wraps both dims
    assert g[0, 0] == a[-1, -1]


def test_ext_dir_value():
    a = jnp.ones((4, 4))
    g = fill_ghost(
        a, 2, _bc2(MathBC.ext_dir, MathBC.ext_dir), vals_lo=(5.0, 7.0), vals_hi=(6.0, 8.0)
    )
    assert g.shape == (8, 8)
    np.testing.assert_allclose(g[0:2, 3], 5.0)
    np.testing.assert_allclose(g[-2:, 3], 6.0)
    np.testing.assert_allclose(g[3, 0:2], 7.0)
    np.testing.assert_allclose(g[3, -2:], 8.0)


def test_foextrap_copies_edge():
    a = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    g = fill_ghost(a, 1, _bc2(MathBC.foextrap, MathBC.foextrap))
    assert g[0, 1] == 1.0 and g[0, 2] == 2.0
    assert g[-1, 1] == 3.0 and g[2, 0] == 3.0


def test_reflect_even_odd():
    a = jnp.arange(1.0, 5.0).reshape(4, 1) * jnp.ones((4, 4))
    g_even = fill_ghost(a, 2, _bc2(MathBC.reflect_even, MathBC.reflect_even))
    # mirror about the face: ghost1 = c0, ghost2 = c1
    np.testing.assert_allclose(g_even[1, 3], 1.0)
    np.testing.assert_allclose(g_even[0, 3], 2.0)
    np.testing.assert_allclose(g_even[-2, 3], 4.0)
    np.testing.assert_allclose(g_even[-1, 3], 3.0)
    g_odd = fill_ghost(a, 1, _bc2(MathBC.reflect_odd, MathBC.reflect_odd))
    np.testing.assert_allclose(g_odd[0, 2], -1.0)
    np.testing.assert_allclose(g_odd[-1, 2], -4.0)


def test_hoextrap_exact_for_linear_and_quadratic():
    # linear field: extrapolation must be exact
    x = (jnp.arange(6) + 0.5)[:, None] * jnp.ones((6, 6))
    a = 2.0 * x + 1.0
    g = fill_ghost(a, 2, _bc2(MathBC.hoextrap, MathBC.hoextrap))
    np.testing.assert_allclose(g[1, 3], 2.0 * (-0.5) + 1.0, rtol=1e-12)
    np.testing.assert_allclose(g[0, 3], 2.0 * (-1.5) + 1.0, rtol=1e-12)
    np.testing.assert_allclose(g[-1, 3], 2.0 * 7.5 + 1.0, rtol=1e-12)
    # quadratic
    a2 = x**2
    g2 = fill_ghost(a2, 1, _bc2(MathBC.hoextrap, MathBC.hoextrap))
    np.testing.assert_allclose(g2[0, 3], 0.25, rtol=1e-12)


def test_interior_roundtrip():
    a = jnp.arange(16.0).reshape(4, 4)
    g = fill_ghost(a, 3, _bc2(MathBC.foextrap, MathBC.foextrap))
    np.testing.assert_allclose(interior(g, 3), a)


def test_3d_fill():
    a = jnp.arange(27.0).reshape(3, 3, 3)
    bc = BCRec(lo=(MathBC.int_dir,) * 3, hi=(MathBC.int_dir,) * 3)
    g = fill_ghost(a, 1, bc)
    assert g.shape == (5, 5, 5)
    assert g[0, 1, 1] == a[-1, 0, 0]


def test_bc_tables_match_reference():
    # NoSlipWall scalar -> foextrap; Inflow scalar -> ext_dir (NS_BC.H:17-20)
    bc = make_bcrec([PhysBC.NoSlipWall, PhysBC.Inflow], [PhysBC.Outflow, PhysBC.Symmetry], SCALAR_BC)
    assert bc.lo == (MathBC.foextrap, MathBC.ext_dir)
    assert bc.hi == (MathBC.foextrap, MathBC.reflect_even)
    # velocity: normal component at NoSlipWall -> ext_dir, SlipWall normal -> ext_dir,
    # SlipWall tangential -> hoextrap (NS_BC.H:7-15)
    u = velocity_bcrec([PhysBC.SlipWall, PhysBC.SlipWall], [PhysBC.SlipWall, PhysBC.SlipWall], comp=0)
    assert u.lo[0] == MathBC.ext_dir and u.lo[1] == MathBC.hoextrap
    v = velocity_bcrec([PhysBC.SlipWall, PhysBC.SlipWall], [PhysBC.SlipWall, PhysBC.SlipWall], comp=1)
    assert v.lo[0] == MathBC.hoextrap and v.lo[1] == MathBC.ext_dir
