"""Exactness of the fused Pallas ExtrapVelToFaces kernel vs the XLA path
(interpret mode; same arithmetic required to f32 roundoff)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iamr_tpu.core.bc import BCRec, MathBC
from iamr_tpu.ops.godunov import extrap_vel_to_faces
from iamr_tpu.ops.pallas_godunov import extrap_plm_fused


def _setup(n0, n1, n2, periodic, seed=0):
    rng = np.random.RandomState(seed)
    n = (n0, n1, n2)
    mode = "wrap" if periodic else "edge"
    vel = 0.4 * rng.randn(3, *n).astype(np.float32)
    vel_g = jnp.asarray(
        np.stack([np.pad(vel[c], 3, mode=mode) for c in range(3)])
    )
    force = rng.randn(3, *n).astype(np.float32)
    force_g = jnp.asarray(
        np.stack([np.pad(force[c], 1, mode=mode) for c in range(3)])
    )
    return vel_g, force_g


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("force", [True, False])
@pytest.mark.parametrize("n", [(16, 16, 16), (16, 24, 32), (8, 8, 16)])
def test_extrap_fused_matches_xla(periodic, force, n):
    dx = tuple(1.0 / x for x in n)
    dt = 0.004
    vel_g, force_g = _setup(*n, periodic)
    if not force:
        force_g = jnp.zeros_like(force_g)
    # interior BCs everywhere: the XLA path applies no face pinning, so the
    # comparison isolates the predictor core (pinning is shared caller code)
    recs = [BCRec((MathBC.int_dir,) * 3, (MathBC.int_dir,) * 3)
            for _ in range(3)]
    zero3 = ((0.0,) * 3,) * 3
    ref = extrap_vel_to_faces(
        vel_g, force_g, dt, dx, n, recs, zero3, zero3
    )
    got = extrap_plm_fused(vel_g, force_g, dt, dx, n, interpret=True)
    for d in range(3):
        assert got[d].shape == ref[d].shape, (d, got[d].shape, ref[d].shape)
        err = float(jnp.max(jnp.abs(got[d] - ref[d])))
        assert err < 2e-6, (d, err)


def test_extrap_fused_no_force_none():
    n = (16, 16, 16)
    dx = tuple(1.0 / x for x in n)
    vel_g, _ = _setup(*n, True)
    recs = [BCRec((MathBC.int_dir,) * 3, (MathBC.int_dir,) * 3)
            for _ in range(3)]
    zero3 = ((0.0,) * 3,) * 3
    ref = extrap_vel_to_faces(
        vel_g, jnp.zeros((3, n[0] + 2, n[1] + 2, n[2] + 2), jnp.float32),
        0.004, dx, n, recs, zero3, zero3,
    )
    got = extrap_plm_fused(vel_g, None, 0.004, dx, n, interpret=True)
    for d in range(3):
        err = float(jnp.max(jnp.abs(got[d] - ref[d])))
        assert err < 2e-6, (d, err)
