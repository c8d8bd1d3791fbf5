"""Node-centered Laplacian multigrid for the approximate nodal projection.

TPU-native equivalent of amrex MLNodeLaplacian + Hydro::NodalProjector
(reference call sites: Source/Projection.cpp:2385-2567). Solves

    L(phi) = D(sigma G(phi)) = rhs

on node-centered phi with cell-centered sigma (= 1/rho), where
  * G: nodes -> cells, (G phi)_d = (avg of hi-side-d corner nodes
    - avg of lo-side-d corner nodes) / dx_d
  * D: cells -> nodes, adjoint of -G (so L is symmetric negative definite)

Boundary treatment matches the reference's semantics (Projection.cpp
scaleVar/set_boundary_velocity): sigma = 0 outside the domain for wall /
inflow / symmetry boundaries (pure Neumann via zero exterior flux), phi = 0
Dirichlet at outflow nodes, periodic wrap otherwise. Node arrays carry the
duplicated periodic DOF (shape n+1); wrap-padding keeps both copies equal.

Smoother: weighted Jacobi (the 9/27-point nodal stencil couples same-color
nodes, so red-black offers no decoupling; Jacobi vectorizes perfectly on the
VPU). Restriction: full-weighting (bilinear P transpose); prolongation:
bilinear on nodes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from iamr_tpu.parallel.reduce import invariant_matvec, invariant_mean, invariant_sum
from iamr_tpu.ops.stencil import sl

# node BC kinds per (dim, side)
N_PERIODIC = 0
N_NEUMANN = 1  # wall/inflow/symmetry: sigma=0 outside
N_DIRICHLET = 2  # outflow: phi=0 on boundary nodes


@dataclasses.dataclass(frozen=True)
class NodalBC:
    lo: Tuple[int, ...]
    hi: Tuple[int, ...]

    @property
    def dim(self):
        return len(self.lo)


def _pad_cells(u, bc: NodalBC, dim):
    """Pad a cell array by one cell per side: wrap if periodic else zeros."""
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            lo = sl(u, d, -1, None)
            hi = sl(u, d, 0, 1)
        else:
            shp = list(u.shape)
            shp[d] = 1
            lo = jnp.zeros(shp, dtype=u.dtype)
            hi = jnp.zeros(shp, dtype=u.dtype)
        u = jnp.concatenate([lo, u, hi], axis=d)
    return u


def _corner_avg(phi, d_target, dim):
    """Average nodal phi over the 2^(dim-1) node pairs, differenced along
    d_target, yielding the cell-centered derivative numerator * dx."""
    # first difference along d_target (nodes -> "edges" along d)
    out = sl(phi, d_target, 1, None) - sl(phi, d_target, 0, -1)
    # then average along every other dim (nodes -> cells)
    for d in range(dim):
        if d == d_target:
            continue
        out = 0.5 * (sl(out, d, 1, None) + sl(out, d, 0, -1))
    return out


def grad_node_to_cell(phi, dx):
    """G: nodal phi -> cell-centered gradient vector (tuple of cell arrays)."""
    dim = phi.ndim
    return tuple(_corner_avg(phi, d, dim) / dx[d] for d in range(dim))


def div_cell_to_node(u, dx, bc: NodalBC, inflow_vals=None):
    """D: cell vector field -> nodal divergence (adjoint of -G).

    u: tuple of cell arrays; exterior cells are zero (wall) or wrapped
    (periodic) per bc.

    inflow_vals: optional {(d, side): value} of the prescribed NORMAL
    velocity outside inflow faces — the reference keeps inflow velocity in
    the projection divergence and zeroes the normal component only at
    non-inflow faces (Projection::set_boundary_velocity,
    Projection.cpp:2570-2620 + LinOpBCType::inflow mapping 2448-2462).
    """
    dim = len(u)
    out = None
    for d in range(dim):
        ud = _pad_cells(u[d], bc, dim)
        if inflow_vals:
            for side in (0, 1):
                v = inflow_vals.get((d, side))
                if v is None:
                    continue
                idx = [slice(None)] * dim
                idx[d] = slice(0, 1) if side == 0 else slice(-1, None)
                ud = ud.at[tuple(idx)].set(v)
        # difference along d (cells -> node-planes), average transversally
        t = sl(ud, d, 1, None) - sl(ud, d, 0, -1)
        for e in range(dim):
            if e == d:
                continue
            t = 0.5 * (sl(t, e, 1, None) + sl(t, e, 0, -1))
        t = t / dx[d]
        out = t if out is None else out + t
    return out


def _pad_nodes(phi, bc: NodalBC):
    """Pad a node array by one node per side.

    Periodic dims use the duplicated-DOF convention (node 0 == node n), so
    the node left of 0 is n-1 and right of n is 1. Non-periodic sides pad
    zero (their stencil coefficients vanish because sigma=0 outside).
    """
    dim = phi.ndim
    for d in range(dim):
        nn = phi.shape[d]
        if bc.lo[d] == N_PERIODIC:
            lo = sl(phi, d, nn - 2, nn - 1)
            hi = sl(phi, d, 1, 2)
        else:
            shp = list(phi.shape)
            shp[d] = 1
            lo = jnp.zeros(shp, dtype=phi.dtype)
            hi = jnp.zeros(shp, dtype=phi.dtype)
        phi = jnp.concatenate([lo, phi, hi], axis=d)
    return phi


def _fem_element_matrix(dx):
    """Element stiffness K[a][b] for a bilinear/trilinear element of size dx.

    K = sum_d S_d (x) prod_{e!=d} M_e with 1D stiffness S = (1/dx)[[1,-1],[-1,1]]
    and 1D mass M = (dx/6)[[2,1],[1,2]]. Returned as a dict keyed by corner
    index tuples a, b in {0,1}^dim (static Python floats).
    """
    import itertools

    import numpy as np

    dim = len(dx)
    S = [np.array([[1.0, -1.0], [-1.0, 1.0]]) / dx[d] for d in range(dim)]
    M = [np.array([[2.0, 1.0], [1.0, 2.0]]) * dx[d] / 6.0 for d in range(dim)]
    corners = list(itertools.product((0, 1), repeat=dim))
    K = {}
    for a in corners:
        for b in corners:
            val = 0.0
            for d in range(dim):
                term = 1.0
                for e in range(dim):
                    mat = S[e] if e == d else M[e]
                    term *= mat[a[e], b[e]]
                val += term
            K[(a, b)] = float(val)
    return K


def _dirichlet_mask(shape, bc: NodalBC, dtype):
    """1 where phi is an unknown, 0 at Dirichlet (outflow) boundary nodes."""
    m = jnp.ones(shape, dtype=dtype)
    for d in range(len(shape)):
        if bc.lo[d] == N_DIRICHLET:
            idx = [slice(None)] * len(shape)
            idx[d] = slice(0, 1)
            m = m.at[tuple(idx)].set(0.0)
        if bc.hi[d] == N_DIRICHLET:
            idx = [slice(None)] * len(shape)
            idx[d] = slice(-1, None)
            m = m.at[tuple(idx)].set(0.0)
    return m


def apply_nodal(phi, sigma, dx, bc: NodalBC):
    """L(phi): sigma-weighted bilinear/trilinear FEM Laplacian at nodes.

    The solver operator is the finite-element stencil, NOT D(sigma G(phi)):
    the plain divergence-of-cell-gradient stencil decouples into checkerboard
    sublattices on square cells (zero edge-neighbor coupling), which defeats
    multigrid and enlarges the nullspace. The reference's MLNodeLaplacian
    makes the same choice; D and G remain the projection's divergence and
    correction operators (hence "approximate" projection).

    L = -(1/V) * assemble(sigma * K_elem), exterior sigma = 0 (wall/inflow
    Neumann) or wrapped (periodic).
    """
    import itertools

    dim = phi.ndim
    vol = 1.0
    for h in dx:
        vol *= h
    K = _fem_element_matrix(dx)
    sp = _pad_cells(sigma, bc, dim)  # cells, padded by 1: shape nn+1 per dim
    pp = _pad_nodes(phi, bc)  # nodes, padded by 1: shape nn+2 per dim
    nshape = tuple(s + 1 for s in sigma.shape)
    out = jnp.zeros(nshape, dtype=phi.dtype)
    # node n's adjacent cells are c = n-1+t (t in {0,1}^dim); in padded-cell
    # coords that cell is sp[n+t]. For neighbor offset o in {-1,0,1}^dim the
    # admissible (t, a_d, b_d) per dim are fixed; phi_{n+o} = pp[n+1+o].
    for o in itertools.product((-1, 0, 1), repeat=dim):
        phi_o = pp[tuple(slice(1 + o[d], 1 + o[d] + nshape[d]) for d in range(dim))]
        coef = jnp.zeros(nshape, dtype=phi.dtype)
        choices = []
        for d in range(dim):
            if o[d] == -1:
                choices.append([(0, 1, 0)])
            elif o[d] == 1:
                choices.append([(1, 0, 1)])
            else:
                choices.append([(0, 1, 1), (1, 0, 0)])
        for combo in itertools.product(*choices):
            t = tuple(c[0] for c in combo)
            a = tuple(c[1] for c in combo)
            b = tuple(c[2] for c in combo)
            sig = sp[tuple(slice(t[d], t[d] + nshape[d]) for d in range(dim))]
            coef = coef + sig * K[(a, b)]
        out = out - coef * phi_o / vol
    return out


def _jacobi_safe_omega(dx, dim: int, cap: float = 0.85) -> float:
    """Static per-level weighted-Jacobi damping that cannot diverge.

    Gershgorin: lambda_max(D^-1 A) <= max_i sum_j |a_ij| / |a_ii|, and
    Jacobi diverges iff omega * lambda_max > 2. On isotropic grids the
    bound stays ~2.3 and the tuned omega = 0.85 is returned unchanged; on
    anisotropic grids (dz != dx — e.g. a 3D tutorial domain with a thin
    z-extent) the trilinear FEM stencil loses diagonal dominance and the
    fixed 0.85 DIVERGES (observed: residual 9e35 at dz = dx/2), so the
    damping shrinks to 1.8 / bound. The bound is evaluated for locally
    constant sigma (a python float — the fused Pallas smoothers need a
    static omega); 1.8 instead of the exact 2.0 margin absorbs smooth
    sigma variation, and sigma -> 0 (EB, walls) only removes off-diagonal
    weight."""
    import itertools as _it

    K = _fem_element_matrix(dx)
    diag_abs = 0.0
    absrow = 0.0
    for o in _it.product((-1, 0, 1), repeat=dim):
        choices = []
        for d in range(dim):
            if o[d] == -1:
                choices.append([(0, 1, 0)])
            elif o[d] == 1:
                choices.append([(1, 0, 1)])
            else:
                choices.append([(0, 1, 1), (1, 0, 0)])
        coef = 0.0
        for combo in _it.product(*choices):
            a = tuple(c[1] for c in combo)
            b = tuple(c[2] for c in combo)
            coef += K[(a, b)]
        if all(x == 0 for x in o):
            diag_abs = abs(coef)
        else:
            absrow += abs(coef)
    bound = (absrow + diag_abs) / diag_abs
    return float(min(cap, 1.8 / bound))


def avg_cell_to_node(s, bc: NodalBC):
    """Average a cell field to nodes (for divu sources in the nodal rhs)."""
    return _adjacent_cell_sum(s, bc) / (2 ** s.ndim)


def _adjacent_cell_sum(sigma, bc: NodalBC):
    """Sum of sigma over the 2^dim cells adjacent to each node."""
    dim = sigma.ndim
    s = _pad_cells(sigma, bc, dim)
    for d in range(dim):
        s = sl(s, d, 1, None) + sl(s, d, 0, -1)
    return s


def nodal_diag(sigma, dx, bc: NodalBC):
    """Diagonal of the FEM L: -(sum of adjacent sigma) * sum_d 1/(3^(dim-1) dx_d^2).

    (K[a,a] = sum_d (1/dx_d) prod_{e!=d} (dx_e/3), same for every corner.)
    """
    dim = sigma.ndim
    kap = sum(1.0 / (3 ** (dim - 1) * dx[d] ** 2) for d in range(dim))
    d = -_adjacent_cell_sum(sigma, bc) * kap
    # EB: nodes fully inside the body have sigma=0 all around -> diag 0;
    # pin them (their residual is identically 0, so the update stays 0)
    return jnp.where(d == 0.0, -kap, d)


def _coarsen_sigma(sigma, dim):
    for d in range(dim):
        idx0 = [slice(None)] * sigma.ndim
        idx1 = [slice(None)] * sigma.ndim
        idx0[d] = slice(0, None, 2)
        idx1[d] = slice(1, None, 2)
        sigma = 0.5 * (sigma[tuple(idx0)] + sigma[tuple(idx1)])
    return sigma


def _restrict_node(r, bc: NodalBC):
    """Full-weighting nodal restriction (R = P^T / 2 per dim, bilinear P).

    rc[j] = 0.5 r[2j] + 0.25 (r[2j-1] + r[2j+1]); missing neighbors wrap for
    periodic dims (duplicated-DOF convention) and drop (one-sided, the exact
    P^T row) at walls/outflow.
    """
    dim = r.ndim
    for d in range(dim):
        n = r.shape[d] - 1  # cells along d at this stage
        if bc.lo[d] == N_PERIODIC:
            lo = sl(r, d, n - 1, n)  # node -1 == node n-1
            hi = sl(r, d, 1, 2)      # node n+1 == node 1
        else:
            shp = list(r.shape)
            shp[d] = 1
            lo = jnp.zeros(shp, dtype=r.dtype)
            hi = jnp.zeros(shp, dtype=r.dtype)
        rp = jnp.concatenate([lo, r, hi], axis=d)  # node k at rp[k+1]
        nc = n // 2 + 1
        ctr = _stride2(rp, d, 1, nc)
        left = _stride2(rp, d, 0, nc)
        right = _stride2(rp, d, 2, nc)
        r = 0.5 * ctr + 0.25 * (left + right)
    return r


def _stride2(a, d, start, count):
    idx = [slice(None)] * a.ndim
    idx[d] = slice(start, start + 2 * count - 1, 2)
    return a[tuple(idx)]


def _prolong_node(e, dim):
    """Bilinear nodal prolongation: coincident nodes copy, odd nodes average."""
    for d in range(dim):
        even = e  # values at fine even nodes
        odd = 0.5 * (sl(e, d, 1, None) + sl(e, d, 0, -1))
        shp = list(even.shape)
        shp[d] = even.shape[d] + odd.shape[d]
        out = jnp.zeros(shp, dtype=e.dtype)
        idx_e = [slice(None)] * even.ndim
        idx_e[d] = slice(0, None, 2)
        idx_o = [slice(None)] * even.ndim
        idx_o[d] = slice(1, None, 2)
        out = out.at[tuple(idx_e)].set(even)
        out = out.at[tuple(idx_o)].set(odd)
        e = out
    return e


@dataclasses.dataclass
class NodalLevel:
    sigma: jnp.ndarray
    diag: jnp.ndarray
    mask: jnp.ndarray
    dx: Tuple[float, ...]
    nshape: Tuple[int, ...]
    omega: float = 0.85  # divergence-safe Jacobi damping (_jacobi_safe_omega)


def build_nodal_hierarchy(sigma, dx, bc: NodalBC, min_size: int = 2,
                          max_levels: int = 30, stop_dofs: int = 0,
                          mask0=None):
    """stop_dofs: stop coarsening once a level has <= stop_dofs NODES
    (dense-bottom truncation, see mg.build_hierarchy).

    mask0: optional extra node Dirichlet mask (0 = constrained) ANDed into
    every level's bc-derived mask — the level-wide multi-box solve, where
    nodes on/outside the union boundary carry coarse-interpolated Dirichlet
    data (via nodal_solve's phi_bc lifting). Coarse-level masks sample the
    fine mask at the coincident (stride-2) nodes; the solver machinery is
    already mask-driven everywhere, so this is pure data."""
    from iamr_tpu.parallel.context import constrain

    import numpy as _np

    dim = sigma.ndim
    levels = []
    cur_sigma, cur_dx = sigma, tuple(dx)
    cur_m = mask0
    while True:
        # multi-chip per-level layout (see iamr_tpu.parallel.context)
        cur_sigma = constrain(cur_sigma)
        cshape = tuple(cur_sigma.shape)
        nshape = tuple(n + 1 for n in cshape)
        diag = constrain(nodal_diag(cur_sigma, cur_dx, bc))
        mask = _dirichlet_mask(nshape, bc, sigma.dtype)
        if cur_m is not None:
            mask = mask * cur_m
        levels.append(NodalLevel(cur_sigma, diag, mask, cur_dx, nshape,
                                 _jacobi_safe_omega(cur_dx, dim)))
        if (
            len(levels) >= max_levels
            or any(n % 2 != 0 for n in cshape)
            or min(cshape) <= min_size
            or int(_np.prod(nshape)) <= stop_dofs
        ):
            break
        cur_sigma = _coarsen_sigma(cur_sigma, dim)
        cur_dx = tuple(2.0 * h for h in cur_dx)
        if cur_m is not None:
            cur_m = cur_m[tuple(slice(None, None, 2) for _ in range(dim))]
    return levels


def _use_pallas(lev: NodalLevel, dtype):
    from iamr_tpu.ops.pallas_mg import pallas_ok

    return pallas_ok(lev.nshape, dtype)


def _fused_gate(lev: NodalLevel, dtype, nsweeps: int, want_resid: bool):
    """Fused-smoother mode for this level, or None (see mg._fused_gate)."""
    import os

    import numpy as _np

    from iamr_tpu.parallel.context import active

    if active() is not None:
        return None, False
    if jnp.dtype(dtype) != jnp.float32:
        return None, False
    if int(_np.prod(lev.nshape)) < 16384:
        return None, False
    env = os.environ.get("IAMR_FUSED", "")
    if env == "0":
        return None, False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if not on_tpu and env != "1":
        return None, False
    from iamr_tpu.ops.pallas_fused import nodal_mode

    mode = nodal_mode(lev.nshape, dtype, want_resid, max(nsweeps, 1))
    return mode, (not on_tpu)


def _smooth2(phi, rhs, lev: NodalLevel, bc: NodalBC, nsweeps: int,
             want_resid: bool, omega: Optional[float] = None):
    """Jacobi smoother (+ optional masked residual), fused when possible."""
    if omega is None:
        omega = lev.omega
    mode, interp = _fused_gate(lev, rhs.dtype, nsweeps, want_resid)
    if mode == "sr":
        from iamr_tpu.ops.pallas_fused import nodal_smooth_sr

        upd = omega * lev.mask / lev.diag
        return nodal_smooth_sr(
            phi, lev.sigma, rhs, upd, lev.mask, lev.dx, bc.lo,
            nsweeps, want_resid, interpret=interp,
        )
    if mode is not None:
        from iamr_tpu.ops.pallas_fused import nodal_smooth_fused

        return nodal_smooth_fused(
            phi, lev.sigma, rhs, lev.dx, bc.lo, bc.hi, omega,
            nsweeps, want_resid, interpret=interp, mode=mode,
        )
    if nsweeps > 0:
        phi = _jacobi(phi, rhs, lev, bc, nsweeps, omega)
    r = _nodal_residual(phi, rhs, lev, bc) if want_resid else None
    return phi, r


def _sigp_for_kernel(sigma, bc: NodalBC):
    """Padded cells extended to nodes+2 per dim (kernel never reads the
    extra end row)."""
    sp = _pad_cells(sigma, bc, sigma.ndim)
    return jnp.pad(sp, [(0, 1)] * sigma.ndim, mode="edge")


def _jacobi(phi, rhs, lev: NodalLevel, bc: NodalBC, nsweeps: int,
            omega: Optional[float] = None):
    if omega is None:
        omega = lev.omega
    if _use_pallas(lev, phi.dtype):
        from iamr_tpu.ops.pallas_mg import fem_K_table, nodal_sweep

        K = fem_K_table(lev.dx)
        vol = 1.0
        for h in lev.dx:
            vol *= h
        sigp = _sigp_for_kernel(lev.sigma, bc)
        upd = omega * lev.mask / lev.diag

        def body(_, phi):
            phip = _pad_nodes(phi, bc)
            return nodal_sweep(phip, sigp, rhs, upd, K, vol)

    else:

        def body(_, phi):
            r = rhs - apply_nodal(phi, lev.sigma, lev.dx, bc)
            return (phi + omega * lev.mask * r / lev.diag)

    return jax.lax.fori_loop(0, nsweeps, body, phi)


def _nodal_residual(phi, rhs, lev: NodalLevel, bc: NodalBC):
    if _use_pallas(lev, phi.dtype):
        from iamr_tpu.ops.pallas_mg import fem_K_table, nodal_sweep

        K = fem_K_table(lev.dx)
        vol = 1.0
        for h in lev.dx:
            vol *= h
        sigp = _sigp_for_kernel(lev.sigma, bc)
        phip = _pad_nodes(phi, bc)
        return nodal_sweep(phip, sigp, rhs, lev.mask, K, vol, update=False)
    return lev.mask * (rhs - apply_nodal(phi, lev.sigma, lev.dx, bc))


def _bottom_cg(rhs, lev: NodalLevel, bc: NodalBC, iters: int = 32):
    """CG bottom solve for the FEM nodal Laplacian (see mg._bottom_cg).

    The assembled operator is NEGATIVE (semi-)definite (diag = -kap * sum
    of adjacent sigmas), so CG runs on -L x = -rhs. Dirichlet-masked
    throughout so the Krylov space stays in the solvable subspace."""

    def matvec(p):
        return -lev.mask * apply_nodal(p, lev.sigma, lev.dx, bc)

    dim = lev.sigma.ndim
    singular = all(
        bc.lo[d] != N_DIRICHLET and bc.hi[d] != N_DIRICHLET
        for d in range(dim)
    )
    if singular:
        # nullspace = constants; weight out the duplicated periodic DOFs
        own = jnp.ones_like(rhs)
        for d in range(dim):
            if bc.lo[d] == N_PERIODIC:
                idx = [slice(None)] * dim
                idx[d] = slice(-1, None)
                own = own.at[tuple(idx)].set(0.0)
        wsum = invariant_sum(own)

        def demean(x):
            # layout-invariant reductions: last-bit layout differences
            # seed thresholded-branch flips downstream (parallel/reduce.py)
            return x - invariant_sum(x * own) / wsum
    else:
        def demean(x):
            return x

    rhs = demean(-lev.mask * rhs)
    x = jnp.zeros_like(rhs)
    r = rhs
    p = r
    rs = invariant_sum(r * r)
    eps = jnp.asarray(1e-30, rhs.dtype)

    def body(_, carry):
        x, r, p, rs = carry
        # freeze once converged: iterating CG past convergence with fixed
        # iteration counts amplifies roundoff noise (rs/pap -> 0/0) and made
        # sharded and unsharded runs diverge at 1e-4 level
        active = rs > jnp.maximum(1e-28 * rs0, eps)
        ap = matvec(p)
        pap = invariant_sum(p * ap)
        alpha_k = jnp.where(active & (pap > eps), rs / jnp.maximum(pap, eps),
                            0.0)
        x = x + alpha_k * p
        r = demean(r - alpha_k * ap)
        rs_new = invariant_sum(r * r)
        beta_k = jnp.where(active, rs_new / jnp.maximum(rs, eps), 0.0)
        p = r + beta_k * p
        return x, r, p, rs_new

    rs0 = rs
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return lev.mask * x


# dense-bottom size cap in NODES (9^3 = 729 in 3D)
NODAL_DENSE_BOTTOM_DOFS = 1000


def _nodal_own(lev: NodalLevel, bc: NodalBC):
    """Weights of 'owned' nodes: 1 except the duplicated hi-side copy in
    periodic dims (and 0 on Dirichlet-masked nodes)."""
    dim = lev.sigma.ndim
    own = jnp.ones(lev.nshape, dtype=lev.sigma.dtype)
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            idx = [slice(None)] * dim
            idx[d] = slice(-1, None)
            own = own.at[tuple(idx)].set(0.0)
    return own * lev.mask


def _bottom_dense_inv_nodal(lev: NodalLevel, bc: NodalBC):
    """Dense bottom (pseudo)inverse for the FEM nodal op (see
    mg._bottom_dense_inv for rationale). The operator is restricted to the
    Dirichlet mask; masked-out DOFs get identity rows so the matrix stays
    invertible (their rhs is always 0). Singular all-periodic/Neumann
    operators are shifted on the own-weighted constants nullspace."""
    import numpy as _np

    nshape = lev.nshape
    ndof = int(_np.prod(nshape))
    if ndof > 4096:
        # hierarchy stopped early (odd extent) on a level too big to
        # materialize — fall back to the CG bottom
        return None
    dtype = lev.sigma.dtype
    eye = jnp.eye(ndof, dtype=dtype).reshape((ndof,) + nshape)
    cols = jax.vmap(
        lambda e: (
            -(lev.mask * apply_nodal(lev.mask * e, lev.sigma, lev.dx, bc))
        ).ravel()
    )(eye)
    A = cols.T
    dim = lev.sigma.ndim
    # identity on masked-out DOFs — both Dirichlet-masked nodes and
    # EB-covered nodes (sigma = 0 in every adjacent cell -> zero diag AND
    # zero row/column; inv() of that is garbage, mg_nodal.py:256)
    scale = invariant_mean(jnp.abs(lev.diag))
    # covered test: nodal_diag PINS zero-diag (fully covered) nodes to -kap,
    # so test the adjacent sigma sum, not the diag
    adj = _adjacent_cell_sum(lev.sigma, bc)
    alive = (lev.mask * (adj > 0.0).astype(dtype)).ravel()
    A = A + jnp.diag(1.0 - alive)
    singular = all(
        bc.lo[d] != N_DIRICHLET and bc.hi[d] != N_DIRICHLET
        for d in range(dim)
    )
    if singular:
        w = _nodal_own(lev, bc).ravel() * alive
        w = w / jnp.linalg.norm(w)
        A = A + scale * jnp.outer(w, w)
    return jnp.linalg.inv(A), alive


def _bottom_solve_nodal(rhs, lev: NodalLevel, bc: NodalBC, binv):
    if binv is None:
        return _bottom_cg(rhs, lev, bc)
    inv, alive = binv
    dim = lev.sigma.ndim
    singular = all(
        bc.lo[d] != N_DIRICHLET and bc.hi[d] != N_DIRICHLET
        for d in range(dim)
    )
    r = -alive * rhs.ravel()  # CG solves -L x = -rhs (neg. semidefinite L)
    if singular:
        own = _nodal_own(lev, bc).ravel() * alive
        wsum = invariant_sum(own)
        r = r - invariant_sum(r * own) / wsum  # own-weighted mean out
        x = alive * invariant_matvec(inv, r)
        x = alive * (x - invariant_sum(x * own) / wsum)
    else:
        x = alive * invariant_matvec(inv, r)
    return x.reshape(lev.nshape)


def _nodal_vcycle(rhs, levels, bc, lev_idx, nu1, nu2, nu_bottom, binv=None):
    from iamr_tpu.parallel.context import constrain

    lev = levels[lev_idx]
    dim = lev.sigma.ndim
    phi = jnp.zeros_like(rhs)
    if lev_idx == len(levels) - 1:
        if binv is not None:
            return _bottom_solve_nodal(rhs, lev, bc, binv)
        phi, _ = _smooth2(phi, rhs, lev, bc, min(nu_bottom, 4), False)
        phi = phi + _bottom_cg(
            lev.mask * (rhs - apply_nodal(phi, lev.sigma, lev.dx, bc)),
            lev, bc,
        )
        return phi
    phi, r = _smooth2(phi, rhs, lev, bc, nu1, True)
    r_c = constrain(_restrict_node(r, bc))
    e_c = _nodal_vcycle(r_c, levels, bc, lev_idx + 1, nu1, nu2, nu_bottom,
                        binv)
    e_f = _prolong_node(e_c, dim)
    phi = constrain(phi + levels[lev_idx].mask * e_f)
    # post-smooth reuses the pre-smooth's fused kernel (see mg._vcycle)
    phi, _ = _smooth2(phi, rhs, lev, bc, nu2, nu2 == nu1)
    return phi


def _nodal_fmg(rhs, levels, bc, nu1, nu2, nu_bottom, binv=None):
    """Full-multigrid start: restrict the rhs to every level, bottom-solve,
    then prolong + one V-cycle per level on the way up. Costs ~1.5 finest
    V-cycles but contracts like 2-3 — used as the opening correction of a
    tolerance-driven solve (the reference MLMG's do_fmg option;
    SURVEY.md L2)."""
    from iamr_tpu.parallel.context import constrain

    rhss = [rhs]
    for k in range(len(levels) - 1):
        rhss.append(
            constrain(_restrict_node(levels[k].mask * rhss[-1], bc))
        )
    bot = len(levels) - 1
    if binv is not None:
        phi = _bottom_solve_nodal(levels[bot].mask * rhss[bot], levels[bot],
                                  bc, binv)
    else:
        phi = _nodal_vcycle(rhss[bot], levels, bc, bot, nu1, nu2, nu_bottom,
                            binv)
    for k in range(bot - 1, -1, -1):
        lev = levels[k]
        phi = constrain(lev.mask * _prolong_node(phi, lev.sigma.ndim))
        r = lev.mask * (rhss[k] - apply_nodal(phi, lev.sigma, lev.dx, bc))
        e = _nodal_vcycle(r, levels, bc, k, nu1, nu2, nu_bottom, binv)
        phi = constrain(phi + lev.mask * e)
    return phi


def nodal_solve(
    rhs,
    sigma,
    dx: Sequence[float],
    bc: NodalBC,
    phi0=None,
    rtol: float = 1e-11,
    atol: float = 1e-16,
    max_vcycles: int = 200,
    nu1: int = 2,
    nu2: int = 2,
    nu_bottom: int = 40,
    fixed_cycles: Optional[int] = None,
    phi_bc=None,
    mixed: Optional[bool] = None,
    interior_mask=None,
):
    """Solve L(phi) = rhs (FEM nodal Laplacian). Returns (phi, resnorm, iters).

    interior_mask: optional node mask for the level-wide multi-box solve
    (0 = node constrained to phi_bc's value; see build_nodal_hierarchy).
    Callers pass sigma already zeroed on hole cells and phi_bc holding the
    coarse-interpolated values on constrained nodes.

    mixed: for f64 inputs, run the V-cycle in f32 (fused Pallas smoothers)
    with f64 residual/correction outside — iterative refinement to f64
    tolerances (see mg.mg_solve). None = auto (TPU only).

    phi_bc: optional node array whose values on Dirichlet boundary nodes are
    imposed (inhomogeneous Dirichlet — the coarse-fine boundary condition of
    a fine-level projection; reference MLNodeLaplacian setCoarseFineBC).
    Solved by lifting: phi = phi_b + psi with psi = 0 on the boundary.

    Singular when no Dirichlet side exists: rhs and phi are mean-projected
    each cycle (the reference's nodal solve has the same nullspace).
    """
    from iamr_tpu.ops.mg import _use_dense_bottom

    dim = sigma.ndim
    dense = _use_dense_bottom()
    stop = NODAL_DENSE_BOTTOM_DOFS if dense else 0
    levels = build_nodal_hierarchy(sigma, dx, bc, stop_dofs=stop,
                                   mask0=interior_mask)
    lev0 = levels[0]
    phi = jnp.zeros(lev0.nshape, dtype=rhs.dtype) if phi0 is None else phi0

    phi_b = None
    if phi_bc is not None:
        phi_b = (1.0 - lev0.mask) * phi_bc
        rhs = rhs - apply_nodal(phi_b, sigma, dx, bc)
        phi = lev0.mask * phi

    # interior_mask pins nodes to Dirichlet data -> NOT singular: demeaning
    # a pinned system perturbs the rhs by a constant the pinned rows cannot
    # absorb, i.e. it silently solves a different problem (mg.mg_solve's
    # singular test already excludes interior_mask; this one must too)
    singular = interior_mask is None and all(
        bc.lo[d] != N_DIRICHLET and bc.hi[d] != N_DIRICHLET for d in range(dim)
    )
    # weight for mean-projection over duplicated periodic DOFs: use the mask
    # of "owned" nodes (drop the duplicated hi-side copy in periodic dims)
    own = jnp.ones(lev0.nshape, dtype=rhs.dtype)
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            idx = [slice(None)] * dim
            idx[d] = slice(-1, None)
            own = own.at[tuple(idx)].set(0.0)

    def demean(x):
        return x - invariant_sum(x * own) / invariant_sum(own)

    from iamr_tpu.parallel.context import constrain

    rhs = constrain(lev0.mask * rhs)
    phi = constrain(phi)
    if singular:
        rhs = demean(rhs)

    from iamr_tpu.ops.mg import _mixed_auto

    use_mixed = (
        jnp.dtype(rhs.dtype) == jnp.float64
        and (mixed if mixed is not None else _mixed_auto())
    )
    if use_mixed:
        levels32 = build_nodal_hierarchy(
            sigma.astype(jnp.float32), dx, bc, stop_dofs=stop,
            mask0=(None if interior_mask is None
                   else interior_mask.astype(jnp.float32)),
        )
        binv = _bottom_dense_inv_nodal(levels32[-1], bc) if dense else None
    else:
        binv = _bottom_dense_inv_nodal(levels[-1], bc) if dense else None

    bnorm = jnp.max(jnp.abs(rhs))
    tol = jnp.maximum(rtol * bnorm, atol)

    def residual_f64(phi):
        return _smooth2(phi, rhs, lev0, bc, 0, True)[1]

    def residual_df(phi):
        # fused compensated-f32 residual (~1e-14 relative at f32 speed,
        # ops/df32.py) — used for the EARLY mixed cycles only: compiled
        # into a large enough program, XLA's whole-module optimizations
        # can silently degrade the compensation to ~1e-8 relative (bare
        # contexts stay exact; see tests/test_df32.py and the df32 module
        # docstring), so the approach to tolerance below always runs on
        # the f64 residual.
        from iamr_tpu.ops.df32 import residual_nodal_df

        return residual_nodal_df(phi, rhs, lev0.sigma, lev0.mask,
                                 lev0.dx, bc)

    def do_cycle(phi, r, resid_fn):
        """One outer correction from residual r; returns (phi, next r)."""
        if use_mixed:
            e = _nodal_vcycle(
                r.astype(jnp.float32), levels32, bc, 0, nu1, nu2, nu_bottom,
                binv,
            ).astype(rhs.dtype)
        else:
            e = _nodal_vcycle(r, levels, bc, 0, nu1, nu2, nu_bottom, binv)
        phi = phi + lev0.mask * e
        if singular:
            phi = demean(phi)
        return phi, resid_fn(phi)

    def finalize(phi):
        return phi if phi_b is None else phi + phi_b

    if fixed_cycles is not None:
        r = residual_df(phi) if use_mixed else residual_f64(phi)
        for _ in range(fixed_cycles):
            phi, r = do_cycle(phi, r, residual_df if use_mixed
                              else residual_f64)
        if use_mixed:  # report the true residual, not the df32 one
            r = residual_f64(phi)
        res = jnp.max(jnp.abs(r))
        return finalize(phi), res, jnp.asarray(fixed_cycles)

    def cond_phase(tol_phase):
        def cond(state):
            _, _, res, it = state
            return jnp.logical_and(res > tol_phase, it < max_vcycles)
        return cond

    def body_with(resid_fn):
        def body(state):
            phi, r, _, it = state
            phi, r = do_cycle(phi, r, resid_fn)
            return phi, r, jnp.max(jnp.abs(r)), it + 1
        return body

    if use_mixed:
        # The whole contraction runs on INCREMENTAL residuals with plain
        # f32 operator applies: r <- r - L32(e). The f32 apply error is
        # relative to |L(e)| ~ |r| (NOT to bnorm) and |r| decays
        # geometrically, so the accumulated estimate drift is
        # ~2e-7 * |r_at_last_refresh|. Two refreshes bound it below tol:
        # one df32 residual at 1e-7*bnorm (drift then <= ~2e-14*bnorm)
        # and one true-f64 residual at the end to verify (plus a full-f64
        # cleanup loop if the margin was eaten). Per-cycle cost drops from
        # V-cycle + df32 residual (~43 + ~65 ms at 256^3 on one chip,
        # exp_mlmg_phases.py) to V-cycle + one f32 sweep (~50 ms); total
        # expensive evaluations per solve: 1 df32 + ~2 f64.
        f32 = jnp.float32

        def apply_f32(e32):
            # mask * L(e) on the f32 hierarchy (= -residual with rhs = 0)
            return -_smooth2(
                e32, jnp.zeros_like(e32), levels32[0], bc, 0, True
            )[1]

        # opening residual: EXACTLY rhs when starting from zero (phi_bc
        # lifting already folded into rhs in f64 above); df32 otherwise
        r0 = rhs if phi0 is None else residual_df(phi)

        # FMG opening: one F-cycle replaces the first 2-3 V-cycles at
        # ~1.35 V-cycles of cost (exp_mlmg_phases.py)
        e32 = _nodal_fmg(
            r0.astype(f32), levels32, bc, nu1, nu2, nu_bottom, binv
        )
        phi = phi + lev0.mask * e32.astype(rhs.dtype)
        r0 = lev0.mask * (r0 - apply_f32(e32).astype(rhs.dtype))

        def body_incr(state):
            phi, r, _, it = state
            e32 = _nodal_vcycle(
                r.astype(f32), levels32, bc, 0, nu1, nu2, nu_bottom, binv
            )
            # phi demean deferred to the refresh points: constants are in
            # L's nullspace, so they change neither r nor the corrections
            phi = phi + lev0.mask * e32.astype(rhs.dtype)
            r = lev0.mask * (r - apply_f32(e32).astype(rhs.dtype))
            return phi, r, jnp.max(jnp.abs(r)), it + 1

        # phase A: incremental-f32 cycles down to ~1e-7*bnorm (estimate)
        switch = jnp.maximum(tol, 1e-7 * bnorm)
        phi, _, _, itA = jax.lax.while_loop(
            cond_phase(switch), body_incr,
            (phi, r0, jnp.max(jnp.abs(r0)), jnp.asarray(0)),
        )

        # refresh: ONE df32 residual re-anchors the estimate
        if singular:
            phi = demean(phi)
        rB = residual_df(phi)
        phi, _, _, itB = jax.lax.while_loop(
            cond_phase(0.5 * tol), body_incr,
            (phi, rB, jnp.max(jnp.abs(rB)), jnp.asarray(0)),
        )
        # verify against the truth; clean up with full f64 residuals if
        # the incremental estimate drifted
        if singular:
            phi = demean(phi)
        rV = residual_f64(phi)
        phi, _, res, itC = jax.lax.while_loop(
            cond_phase(tol), body_with(residual_f64),
            (phi, rV, jnp.max(jnp.abs(rV)), jnp.asarray(0)),
        )
        return finalize(phi), res, itA + itB + itC

    r0 = residual_f64(phi)
    phi, _, res, it = jax.lax.while_loop(
        cond_phase(tol), body_with(residual_f64),
        (phi, r0, jnp.max(jnp.abs(r0)), jnp.asarray(0)),
    )
    return finalize(phi), res, it


def nodal_solve_df(rhs_h, rhs_l, sigma_h, sigma_l, dx, bc: NodalBC,
                   rtol: float = 1e-11, atol: float = 0.0, nu1: int = 2,
                   nu2: int = 2, nu_bottom: int = 8, max_vcycles: int = 60):
    """f64-grade nodal solve for a NON-x64 process: iterative refinement
    where the outer state (phi, rhs) lives as df32 (hi, lo) f32 pairs and
    every residual refresh runs the fused compensated-f32 FEM apply
    (ops/df32.residual_nodal_df_pair, ~1e-13 relative accuracy at f32
    speed). No f64 array ever exists, so this runs in the same process as
    the Mosaic kernels — the fused Pallas smoothers stay ENABLED, unlike
    the x64-process mixed path (pallas_ok gates Mosaic off under x64: the
    axon remote-compile helper crashes lowering any kernel there).

    Matches the reference MLMG driven to Projection.cpp:17-36 tolerances
    (proj_tol 1e-12-ish): returns (phi_h, phi_l, res, iters) with
    phi_h + phi_l the refined solution and res the df32-computed
    max-residual. Callers wanting independent ground truth verify host-side
    with ops/np_nodal.np_residual_nodal (numpy f64) — bench.py does.

    Caller contract: for the all-Neumann/periodic SINGULAR system the rhs
    pair must arrive demeaned (host-side f64 demean — an f32 17M-point sum
    cannot reach the 1e-12 relative accuracy the nullspace projection
    needs). sigma pair likewise split host-side from the true f64 sigma.

    Phase structure mirrors nodal_solve's mixed path (same contraction
    analysis, mg_nodal.py:880-905): FMG opening, incremental-f32 phase A to
    1e-6*bnorm (pure-f32 incremental r drifts ~1e-7*bnorm, one decade of
    margin), df32 refresh, incremental phase B to 0.5*tol (drift from the
    refreshed level is ~1e-7 * 1e-6*bnorm = 1e-13*bnorm, below tol), df32
    verify, then a df32-per-cycle cleanup loop if the margin was eaten.
    """
    from iamr_tpu.ops.df32 import df_add, residual_nodal_df_pair
    from iamr_tpu.ops.mg import _use_dense_bottom
    from iamr_tpu.parallel.context import constrain

    f32 = jnp.float32
    dim = sigma_h.ndim
    dense = _use_dense_bottom()
    stop = NODAL_DENSE_BOTTOM_DOFS if dense else 0
    levels32 = build_nodal_hierarchy(sigma_h, dx, bc, stop_dofs=stop)
    lev0 = levels32[0]
    binv = _bottom_dense_inv_nodal(levels32[-1], bc) if dense else None

    singular = all(
        bc.lo[d] != N_DIRICHLET and bc.hi[d] != N_DIRICHLET
        for d in range(dim)
    )
    own = jnp.ones(lev0.nshape, dtype=f32)
    for d in range(dim):
        if bc.lo[d] == N_PERIODIC:
            idx = [slice(None)] * dim
            idx[d] = slice(-1, None)
            own = own.at[tuple(idx)].set(0.0)

    def demean32(x):
        return x - invariant_sum(x * own) / invariant_sum(own)

    rhs_h = constrain(lev0.mask * rhs_h)
    rhs_l = constrain(lev0.mask * rhs_l)

    bnorm = jnp.max(jnp.abs(rhs_h))
    tol = jnp.maximum(f32(rtol) * bnorm, f32(atol))

    def apply_f32(e32):
        # mask * L(e) on the f32 hierarchy (= -residual with rhs = 0)
        return -_smooth2(e32, jnp.zeros_like(e32), lev0, bc, 0, True)[1]

    def refresh(yh, yl):
        return residual_nodal_df_pair(
            yh, yl, rhs_h, rhs_l, sigma_h, sigma_l, lev0.mask, dx, bc)[0]

    # FMG opening (exp_mlmg_phases.py: one F-cycle ~ 2-3 V-cycles of
    # contraction at ~1.35 V-cycles of cost)
    e = lev0.mask * _nodal_fmg(rhs_h, levels32, bc, nu1, nu2, nu_bottom,
                               binv)
    yh, yl = e, jnp.zeros_like(e)
    r = lev0.mask * (rhs_h - apply_f32(e))

    def body_incr(state):
        yh, yl, r, _, it = state
        e = lev0.mask * _nodal_vcycle(r, levels32, bc, 0, nu1, nu2,
                                      nu_bottom, binv)
        yh, yl = df_add(yh, yl, e, jnp.zeros_like(e))
        r = lev0.mask * (r - apply_f32(e))
        return yh, yl, r, jnp.max(jnp.abs(r)), it + 1

    def cond_phase(tol_phase):
        def cond(state):
            _, _, _, res, it = state
            return jnp.logical_and(res > tol_phase, it < max_vcycles)
        return cond

    switch = jnp.maximum(tol, f32(1e-6) * bnorm)
    yh, yl, _, _, itA = jax.lax.while_loop(
        cond_phase(switch), body_incr,
        (yh, yl, r, jnp.max(jnp.abs(r)), jnp.asarray(0)),
    )

    rB = refresh(yh, yl)
    yh, yl, _, _, itB = jax.lax.while_loop(
        cond_phase(0.5 * tol), body_incr,
        (yh, yl, rB, jnp.max(jnp.abs(rB)), jnp.asarray(0)),
    )

    # verify with a fresh df32 residual; clean up with df32-per-cycle
    # corrections if the incremental estimate drifted
    rV = refresh(yh, yl)

    def body_true(state):
        yh, yl, r, _, it = state
        e = lev0.mask * _nodal_vcycle(r, levels32, bc, 0, nu1, nu2,
                                      nu_bottom, binv)
        yh, yl = df_add(yh, yl, e, jnp.zeros_like(e))
        rN = refresh(yh, yl)
        return yh, yl, rN, jnp.max(jnp.abs(rN)), it + 1

    def cond_cleanup(state):
        # the cleanup loop pays one df32 refresh per cycle; if the df32
        # noise floor sits above tol the estimate stops contracting, so a
        # tight cap (not max_vcycles) bounds the thrash
        _, _, _, res, it = state
        return jnp.logical_and(res > tol, it < 12)

    yh, yl, _, res, itC = jax.lax.while_loop(
        cond_cleanup, body_true,
        (yh, yl, rV, jnp.max(jnp.abs(rV)), jnp.asarray(0)),
    )

    if singular:
        # pin the nullspace component near zero — as a COMPENSATED pair
        # update: plain `yh - m` re-rounds every element of yh at
        # eps*|phi| with the lo part no longer compensating, which
        # perturbs the returned solution NON-uniformly (L(const)=0 but
        # L(rounding noise)!=0) to ~4e-8*bnorm — measured: exactly the
        # floor the host-f64 verification caught while the in-solve
        # residual (refreshed before this line) read 4e-11
        m = invariant_sum(yh * own) / invariant_sum(own)
        yh, yl = df_add(yh, yl, -m + jnp.zeros_like(yh),
                        jnp.zeros_like(yh))
    return yh, yl, res, itA + itB + itC
