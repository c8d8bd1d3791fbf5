"""Box-batched cell MG (ops/mg_batch.py BatchPoisson).

The batch solves the SAME discrete system as the dense / masked-union
solver (unknowns = box cells, C-F ghost cells Dirichlet), so solutions
must agree to solver tolerance; memory never materializes the union
bounding box (reference: MLMG solves one AMR level across its BoxArray,
SURVEY.md section 2.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iamr_tpu.ops.mg import DIRICHLET, NEUMANN, PERIODIC, PoissonBC, mg_solve
from iamr_tpu.ops.mg_batch import BatchPoisson, batch_cell_maps


def _beta_faces(rng, nbox, bshape, lo, dom, fn):
    """Per-box face arrays of a GLOBAL coefficient field (seam faces get
    identical values in both adjacent boxes)."""
    dim = len(bshape)
    out = []
    for d in range(dim):
        shp = tuple(bshape[e] + (1 if e == d else 0) for e in range(dim))
        b = np.empty((nbox,) + shp)
        for k in range(nbox):
            idx = np.meshgrid(*[
                np.arange(lo[k][e], lo[k][e] + shp[e]) for e in range(dim)
            ], indexing="ij")
            b[k] = fn(d, *idx)
        out.append(jnp.asarray(b))
    return out


def _gather_batch(dense, lo, bshape):
    return jnp.stack([
        dense[tuple(slice(l[d], l[d] + bshape[d]) for d in range(len(bshape)))]
        for l in lo
    ])


def test_tiling_matches_dense_periodic_poisson():
    """4 boxes tiling a periodic domain: batch solve == dense solve."""
    n = (32, 32)
    bshape = (16, 16)
    lo = np.array([[0, 0], [16, 0], [0, 16], [16, 16]])
    touch = np.zeros((4, 2, 2), bool)  # periodic: no phys sides
    bc = PoissonBC(lo=(PERIODIC, PERIODIC), hi=(PERIODIC, PERIODIC))
    dx = (1.0 / 32, 1.0 / 32)
    rng = np.random.RandomState(0)
    rhs_d = rng.randn(*n)
    rhs_d -= rhs_d.mean()
    rhs_d = jnp.asarray(rhs_d)
    beta_fn = lambda d, i, j: 1.0 + 0.3 * np.sin(2 * np.pi * i / 32) * np.cos(
        2 * np.pi * j / 32
    )
    bx = jnp.asarray(beta_fn(0, *np.meshgrid(np.arange(33), np.arange(32),
                                             indexing="ij")))
    by = jnp.asarray(beta_fn(1, *np.meshgrid(np.arange(32), np.arange(33),
                                             indexing="ij")))
    phi_d, _, _ = mg_solve(rhs_d, jnp.zeros(n), (bx, by),
                           0.0, 1.0, dx, bc, rtol=1e-11)

    bp = BatchPoisson(lo, bshape, n, (True, True), bc, touch)
    rhs_b = _gather_batch(rhs_d, lo, bshape)
    alpha_b = jnp.zeros((4,) + bshape)
    beta_b = _beta_faces(rng, 4, bshape, lo, n, beta_fn)
    phi_b, ncyc, res = bp.solve(rhs_b, alpha_b, beta_b, 0.0, 1.0, dx,
                                rtol=1e-11)
    ref_b = _gather_batch(phi_d, lo, bshape)
    # both mean-free solutions of the same singular system
    err = float(jnp.max(jnp.abs(phi_b - ref_b)))
    scale = float(jnp.max(jnp.abs(phi_d)))
    assert err < 1e-8 * max(scale, 1.0), (err, int(ncyc), float(res))


def test_tiling_matches_dense_walls_helmholtz():
    """Dirichlet/Neumann walls + a=1 Helmholtz: batch == dense."""
    n = (32, 32)
    bshape = (16, 16)
    lo = np.array([[0, 0], [16, 0], [0, 16], [16, 16]])
    touch = np.zeros((4, 2, 2), bool)
    for k in range(4):
        for d in range(2):
            touch[k, d, 0] = lo[k][d] == 0
            touch[k, d, 1] = lo[k][d] + 16 == 32
    bc = PoissonBC(lo=(DIRICHLET, NEUMANN), hi=(DIRICHLET, NEUMANN))
    dx = (1.0 / 32, 1.0 / 32)
    rng = np.random.RandomState(1)
    rhs_d = jnp.asarray(rng.randn(*n))
    alpha_d = jnp.asarray(1.0 + 0.2 * rng.rand(*n))
    beta_fn = lambda d, i, j: 1.0 + 0.1 * (i % 7) / 7.0 + 0.05 * (j % 5) / 5.0
    bx = jnp.asarray(beta_fn(0, *np.meshgrid(np.arange(33), np.arange(32),
                                             indexing="ij")))
    by = jnp.asarray(beta_fn(1, *np.meshgrid(np.arange(32), np.arange(33),
                                             indexing="ij")))
    phi_d, _, _ = mg_solve(rhs_d, alpha_d, (bx, by), 1.0, 1.0, dx, bc,
                           rtol=1e-11)

    bp = BatchPoisson(lo, bshape, n, (False, False), bc, touch)
    rhs_b = _gather_batch(rhs_d, lo, bshape)
    alpha_b = _gather_batch(alpha_d, lo, bshape)
    beta_b = _beta_faces(rng, 4, bshape, lo, n, beta_fn)
    phi_b, ncyc, res = bp.solve(rhs_b, alpha_b, beta_b, 1.0, 1.0, dx,
                                rtol=1e-11)
    ref_b = _gather_batch(phi_d, lo, bshape)
    err = float(jnp.max(jnp.abs(phi_b - ref_b)))
    assert err < 1e-9, (err, int(ncyc), float(res))


def test_scattered_boxes_match_union_masked_solve():
    """Two separated boxes with C-F Dirichlet ghosts: the batch solves the
    same system as the masked-union solve (holes pinned to the same coarse
    data), so box cells agree to solver tolerance."""
    n = (64, 64)  # fine index space
    bshape = (16, 16)
    lo = np.array([[8, 8], [40, 32]])
    touch = np.zeros((2, 2, 2), bool)
    bc = PoissonBC(lo=(PERIODIC, PERIODIC), hi=(PERIODIC, PERIODIC))
    dx = (1.0 / 64, 1.0 / 64)
    rng = np.random.RandomState(2)

    # global smooth Dirichlet data g (plays the coarse interpolation)
    ii, jj = np.meshgrid(np.arange(64) + 0.5, np.arange(64) + 0.5,
                         indexing="ij")
    g_glob = np.sin(2 * np.pi * ii / 64) * np.cos(4 * np.pi * jj / 64)

    # union solve over the WHOLE periodic domain with hole cells everywhere
    # outside the boxes: exactly the batch's system (unknowns = box cells,
    # hole cells Dirichlet-pinned to g), no bbox-edge BC ambiguity
    blo = (0, 0)
    mask = np.zeros(n)
    for l in lo:
        mask[l[0]:l[0] + 16, l[1]:l[1] + 16] = 1.0
    rhs_glob = rng.randn(64, 64)
    alpha_glob = 1.0 + 0.2 * rng.rand(64, 64)
    rhs_u = jnp.asarray(rhs_glob)
    alpha_u = jnp.asarray(alpha_glob)
    beta_fn = lambda d, i, j: 1.0 + 0.25 * np.sin(2 * np.pi * (i + 2 * j) / 64)
    bxg = beta_fn(0, *np.meshgrid(np.arange(65), np.arange(64), indexing="ij"))
    byg = beta_fn(1, *np.meshgrid(np.arange(64), np.arange(65), indexing="ij"))
    beta_u = (jnp.asarray(bxg), jnp.asarray(byg))
    phi_u, _, _ = mg_solve(
        rhs_u, alpha_u, beta_u, 1.0, 1.0, dx, bc, rtol=1e-11,
        interior_mask=jnp.asarray(mask),
        interior_vals=jnp.asarray(g_glob),
    )

    bp = BatchPoisson(lo, bshape, n, (True, True), bc, touch)
    rhs_b = _gather_batch(jnp.asarray(rhs_glob), lo, bshape)
    alpha_b = _gather_batch(jnp.asarray(alpha_glob), lo, bshape)
    beta_b = _beta_faces(rng, 2, bshape, lo, n, beta_fn)
    # C-F ghosts: global g at the ghost ring
    cf = jnp.stack([
        jnp.asarray(np.pad(g_glob, 1, mode="wrap")[
            l[0]:l[0] + 18, l[1]:l[1] + 18
        ])
        for l in lo
    ])
    phi_b, ncyc, res = bp.solve(rhs_b, alpha_b, beta_b, 1.0, 1.0, dx,
                                cf_ghosts=cf, rtol=1e-12)
    for k, l in enumerate(lo):
        ref = phi_u[l[0]:l[0] + 16, l[1]:l[1] + 16]
        err = float(jnp.max(jnp.abs(phi_b[k] - ref)))
        assert err < 1e-8, (k, err, int(ncyc), float(res))


def test_memory_is_batch_sized():
    """The solver's traced program must never materialize a bbox-sized
    array: peak live bytes stay O(sum box volumes), not O(bbox)."""
    import jax

    n = (256, 256)
    bshape = (16, 16)
    # two tiny far-apart boxes in a big index space: bbox would be ~256^2
    lo = np.array([[0, 0], [240, 240]])
    touch = np.zeros((2, 2, 2), bool)
    bc = PoissonBC(lo=(PERIODIC, PERIODIC), hi=(PERIODIC, PERIODIC))
    bp = BatchPoisson(lo, bshape, n, (True, True), bc, touch)
    rhs = jnp.ones((2,) + bshape).at[:, 8, 8].set(-255.0)
    rhs = rhs - jnp.mean(rhs)
    alpha = jnp.zeros((2,) + bshape)
    beta = tuple(
        jnp.ones((2,) + tuple(bshape[e] + (1 if e == d else 0)
                              for e in range(2)))
        for d in range(2)
    )
    cf = jnp.zeros((2, 18, 18))

    def run(rhs):
        phi, _, _ = bp.solve(rhs, alpha, beta, 1.0, 1.0,
                             (1.0 / 256, 1.0 / 256), cf_ghosts=cf,
                             rtol=1e-10)
        return phi

    lowered = jax.jit(run).lower(rhs)
    compiled = lowered.compile()
    stats = compiled.memory_analysis()
    bbox_bytes = 256 * 256 * 8
    batch_bytes = 2 * 16 * 16 * 8
    peak = int(stats.temp_size_in_bytes)
    # peak live temp must be a small multiple of the batch, far below bbox
    assert peak < bbox_bytes / 4, (peak, bbox_bytes)
    assert peak < 80 * batch_bytes, (peak, batch_bytes)
    out = run(rhs)
    assert np.isfinite(np.asarray(out)).all()
