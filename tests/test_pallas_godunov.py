"""Exactness of the fused Pallas PLM advection kernel vs the XLA path
(interpret mode; same arithmetic required to f32 roundoff)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iamr_tpu.ops.godunov import (
    compute_edge_states,
    compute_fluxes_and_aofs,
    grow_umac_transverse,
)
from iamr_tpu.ops.pallas_godunov import godunov_plm_fused


def _setup(n0, n1, n2, periodic, seed=0):
    rng = np.random.RandomState(seed)
    n = (n0, n1, n2)
    s = rng.rand(*n).astype(np.float32)
    # ghosts: wrap (periodic) or edge (the kernel is BC-agnostic — ghosts
    # arrive pre-filled either way)
    mode = "wrap" if periodic else "edge"
    s_g = jnp.asarray(np.pad(s, 3, mode=mode))
    umac = tuple(
        jnp.asarray(
            (0.3 * rng.randn(*[nn + (1 if d == e else 0)
                               for e, nn in enumerate(n)])).astype(np.float32)
        )
        for d in range(3)
    )
    if periodic:
        umac = tuple(
            u.at[tuple(slice(None) if e != d else -1 for e in range(3))].set(
                u[tuple(slice(None) if e != d else 0 for e in range(3))]
            )
            for d, u in enumerate(umac)
        )
    per = (periodic,) * 3
    ug = grow_umac_transverse(umac, per)
    return jnp.asarray(s), s_g, umac, ug, per


@pytest.mark.parametrize("iconserv", [True, False])
@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("force", [False, True])
def test_fused_matches_xla(iconserv, periodic, force):
    n = (16, 16, 16)
    dx = tuple(1.0 / x for x in n)
    dt = 0.004
    s, s_g, umac, ug, per = _setup(*n, periodic)
    rng = np.random.RandomState(5)
    fgr = (
        jnp.asarray(np.pad(rng.rand(*n).astype(np.float32), 1, mode="edge"))
        if force else None
    )
    edges = compute_edge_states(
        s_g, ug, dt, dx, n, iconserv, force_g=fgr, periodic=per
    )
    fl_ref, a_ref = compute_fluxes_and_aofs(
        edges, umac, dx, iconserv, s_cc=None if iconserv else s
    )
    fl, a = godunov_plm_fused(
        s_g, umac, ug, dt, dx, n, iconserv, force_g=fgr, periodic=per,
        interpret=True,
    )
    for d in range(3):
        err = float(jnp.max(jnp.abs(fl[d] - fl_ref[d])))
        assert err < 2e-6, (d, err)
    scale = max(1.0, float(jnp.max(jnp.abs(a_ref))))
    assert float(jnp.max(jnp.abs(a - a_ref))) < 2e-5 * scale


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_multi_matches_single(periodic):
    """The one-call multi-field kernel (shared MAC blocks, per-field
    iconserv/conv/force flags) must reproduce the single-field fused kernel
    field-by-field (identical arithmetic, so tight f32 tolerance)."""
    from iamr_tpu.ops.pallas_godunov import godunov_plm_fused_multi

    n = (16, 16, 16)
    dx = tuple(1.0 / x for x in n)
    dt = 0.004
    s0, s_g0, umac, ug, per = _setup(*n, periodic, seed=1)
    rng = np.random.RandomState(7)
    # 5 fields like a real step: vel x3 convective w/ force, rho
    # conservative, tracer convective
    sgs, forces, rows, icons = [], [], [], []
    for j in range(3):
        sgs.append(jnp.asarray(np.pad(
            rng.rand(*n).astype(np.float32), 3,
            mode="wrap" if periodic else "edge")))
        forces.append(jnp.asarray(np.pad(
            rng.rand(*n).astype(np.float32), 1, mode="edge")))
        rows.append(j)
        icons.append(False)
    sgs.append(s_g0)
    rows.append(-1)
    icons.append(True)
    sgs.append(jnp.asarray(np.pad(
        rng.rand(*n).astype(np.float32), 3,
        mode="wrap" if periodic else "edge")))
    rows.append(-1)
    icons.append(False)
    convs = [not ic for ic in icons]
    out = godunov_plm_fused_multi(
        sgs, umac, ug, dt, dx, n, icons, forces, rows, convs,
        periodic=per, interpret=True,
    )
    for j in range(5):
        fl_ref, a_ref = godunov_plm_fused(
            sgs[j], umac, ug, dt, dx, n, icons[j],
            force_g=forces[rows[j]] if rows[j] >= 0 else None,
            periodic=per, interpret=True,
        )
        fl, a = out[j]
        for d in range(3):
            err = float(jnp.max(jnp.abs(fl[d] - fl_ref[d])))
            assert err < 1e-6, (j, d, err)
        assert float(jnp.max(jnp.abs(a - a_ref))) < 1e-5, j
