"""Box-batched FEM nodal MG (ops/mg_nodal_batch.py BatchNodal) vs the
single-array nodal solver: same discrete system (free nodes = nodes with
all adjacent cells box-covered; others Dirichlet), solutions agree to
solver tolerance; duplicated seam-node copies stay equal."""

import jax.numpy as jnp
import numpy as np

from iamr_tpu.ops.mg_nodal import (
    N_PERIODIC,
    NodalBC,
    nodal_solve,
)
from iamr_tpu.ops.mg_nodal_batch import BatchNodal


def _gather_nodes(dense, lo, bshape):
    return jnp.stack([
        dense[tuple(slice(l[d], l[d] + bshape[d] + 1)
                    for d in range(len(bshape)))]
        for l in lo
    ])


def _gather_cells(dense, lo, bshape):
    return jnp.stack([
        dense[tuple(slice(l[d], l[d] + bshape[d]) for d in range(len(bshape)))]
        for l in lo
    ])


def test_tiling_matches_dense_periodic():
    """4 boxes tiling a periodic domain: batch == dense (both mean-free)."""
    n = (32, 32)
    bshape = (16, 16)
    lo = np.array([[0, 0], [16, 0], [0, 16], [16, 16]])
    bc = NodalBC(lo=(N_PERIODIC, N_PERIODIC), hi=(N_PERIODIC, N_PERIODIC))
    dx = (1.0 / 32, 1.0 / 32)
    rng = np.random.RandomState(0)
    sigma_d = jnp.asarray(1.0 + 0.3 * rng.rand(*n))
    # node rhs with the periodic duplicated-DOF convention (wrap row/col)
    r = rng.randn(32, 32)
    r -= r.mean()
    rhs_d = jnp.asarray(np.pad(r, ((0, 1), (0, 1)), mode="wrap"))
    phi_d, _, _ = nodal_solve(rhs_d, sigma_d, dx, bc, rtol=1e-11)

    bn = BatchNodal(lo, bshape, n, (True, True), bc)
    rhs_b = _gather_nodes(rhs_d, lo, bshape)
    sigma_b = _gather_cells(sigma_d, lo, bshape)
    phi_b, ncyc, res = bn.solve(rhs_b, sigma_b, dx, rtol=1e-11)
    ref_b = _gather_nodes(phi_d, lo, bshape)
    # both are mean-free solutions of the same singular system; remove the
    # (tiny) mean-convention difference by comparing demeaned values
    db = phi_b - jnp.mean(phi_b)
    dr = ref_b - jnp.mean(ref_b)
    err = float(jnp.max(jnp.abs(db - dr)))
    scale = max(1.0, float(jnp.max(jnp.abs(phi_d))))
    assert err < 1e-7 * scale, (err, int(ncyc), float(res))
    # duplicated seam copies bitwise equal: box 0 hi-x edge == box 1 lo-x
    seam0 = phi_b[0, -1, :]
    seam1 = phi_b[1, 0, :]
    assert float(jnp.max(jnp.abs(seam0 - seam1))) == 0.0


def test_scattered_boxes_match_union_nodal():
    """Two separated boxes, C-F Dirichlet nodes pinned to smooth data: box
    nodes match the interior_mask union solve."""
    n = (64, 64)
    bshape = (16, 16)
    lo = np.array([[8, 8], [40, 24]])
    bc = NodalBC(lo=(N_PERIODIC, N_PERIODIC), hi=(N_PERIODIC, N_PERIODIC))
    dx = (1.0 / 64, 1.0 / 64)
    rng = np.random.RandomState(1)

    sigma_glob = 1.0 + 0.25 * rng.rand(*n)
    # union-node free mask over the whole domain (duplicated-DOF wrap)
    covered = np.zeros(n)
    for l in lo:
        covered[l[0]:l[0] + 16, l[1]:l[1] + 16] = 1.0
    cp = np.pad(covered, 1, mode="wrap")
    nmask = np.ones((65, 65))
    for t0 in (0, 1):
        for t1 in (0, 1):
            nmask *= cp[t0:t0 + 65, t1:t1 + 65]
    # smooth Dirichlet data at constrained nodes
    ii, jj = np.meshgrid(np.arange(65), np.arange(65), indexing="ij")
    g_glob = np.sin(2 * np.pi * ii / 64) * np.cos(4 * np.pi * jj / 64)

    # rhs supported on free nodes, mean-free so the union's demean is a
    # no-op and both paths solve the identical system
    r = rng.randn(65, 65) * nmask
    r[-1, :] = r[0, :]
    r[:, -1] = r[:, 0]
    own = np.ones((65, 65))
    own[-1, :] = 0.0
    own[:, -1] = 0.0
    # zero the own-weighted sum by subtracting on free nodes only, so the
    # union path's unconditional demean is a no-op
    w = nmask * own
    r = r - (r * own).sum() / w.sum() * nmask
    rhs_glob = jnp.asarray(r)

    sigma_u = jnp.asarray(sigma_glob * covered)  # holes zeroed (caller rule)
    phi_u, _, _ = nodal_solve(
        rhs_glob, sigma_u, dx, bc, rtol=1e-12,
        interior_mask=jnp.asarray(nmask),
        phi_bc=jnp.asarray(g_glob),
    )

    bn = BatchNodal(lo, bshape, n, (True, True), bc)
    rhs_b = _gather_nodes(rhs_glob, lo, bshape)
    sigma_b = _gather_cells(jnp.asarray(sigma_glob), lo, bshape)
    g_pad = jnp.stack([
        jnp.asarray(np.pad(g_glob[:64, :64], 2, mode="wrap")[
            l[0] + 1:l[0] + 20, l[1] + 1:l[1] + 20
        ])
        for l in lo
    ])
    phi_b, ncyc, res = bn.solve(rhs_b, sigma_b, dx, g_pad=g_pad, rtol=1e-12)
    for k, l in enumerate(lo):
        ref = phi_u[l[0]:l[0] + 17, l[1]:l[1] + 17]
        # the union path demeans even this pinned (non-singular) system —
        # a harmless constant only if rhs is mean-free, which we enforced
        err = float(jnp.max(jnp.abs(phi_b[k] - ref)))
        assert err < 5e-8, (k, err, int(ncyc), float(res))


def test_memory_is_batch_sized():
    """No bbox-sized arrays in the compiled nodal solve."""
    import jax

    n = (256, 256)
    bshape = (16, 16)
    lo = np.array([[0, 0], [224, 224]])
    bc = NodalBC(lo=(N_PERIODIC, N_PERIODIC), hi=(N_PERIODIC, N_PERIODIC))
    bn = BatchNodal(lo, bshape, n, (True, True), bc)
    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(2, 17, 17))
    sigma = jnp.ones((2, 16, 16))
    g_pad = jnp.zeros((2, 19, 19))

    def run(rhs):
        phi, _, _ = bn.solve(rhs, sigma, (1.0 / 256, 1.0 / 256),
                             g_pad=g_pad, rtol=1e-9)
        return phi

    compiled = jax.jit(run).lower(rhs).compile()
    stats = compiled.memory_analysis()
    peak = int(stats.temp_size_in_bytes)
    bbox_bytes = 257 * 257 * 8
    assert peak < bbox_bytes / 4, (peak, bbox_bytes)
    out = run(rhs)
    assert np.isfinite(np.asarray(out)).all()
