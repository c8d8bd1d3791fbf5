"""Pallas TPU kernels for the multigrid hot loops.

The XLA-composed smoothers materialize shifted-slice intermediates: cost
analysis shows one FEM nodal apply touching ~54 array-passes, with the MG
smoothers dominating step traffic. These kernels fuse each sweep into one
VMEM-resident pass (read phi/sigma/rhs/coef once, write phi once).

Blocking: slab decomposition over dim 0; halo rows come from overlapping
input blocks (pl.Element index maps); transverse dims stay whole so lanes
are contiguous. ~3-4 MB VMEM per slab at 128^3 f32.

The XLA path remains for f64/CPU and for coarse levels too small to tile.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Whole transverse dims get (8,128)-tile padded (e.g. 131 lanes -> 256), so
# big levels need more scoped VMEM than the 16M default; v5e+ has plenty.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

_TILE = 8  # Mosaic requires pl.Element offsets divisible by the sublane
# tiling (8 for f32), so the dim-0 slab tile is always 8; arrays whose
# leading dim is not a multiple of 8 are end-padded and the result sliced.


def _pad_rows(x, rows: int):
    if rows == 0:
        return x
    return jnp.pad(x, [(0, rows)] + [(0, 0)] * (x.ndim - 1))


def pallas_ok(shape, dtype, force: bool = False) -> bool:
    """Gate: TPU backend, f32, big enough for the kernel to pay off.

    Size-aware default, measured on the HIT bench: each kernel carries a
    ~0.4 ms fixed cost and Pallas calls cannot fuse with neighboring XLA
    ops, so below ~4M elements the fully-fused XLA smoothers win (41.9 vs
    38.8 Mcells/s at 128^3); at 256^3 the fused-sweep traffic win dominates
    (39.5 vs 32.0 Mcells/s). IAMR_ENABLE_PALLAS=1/0 overrides either way.
    Inside one MG hierarchy this naturally uses Pallas on the big fine
    levels and XLA on the coarse ones.
    """
    from iamr_tpu.parallel.context import active

    if active() is not None:
        # a spatial mesh is live: pallas_call is an opaque custom call the
        # SPMD partitioner cannot split, so multi-chip programs use the XLA
        # smoothers (shard_map-wrapped kernels are the planned upgrade)
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if jax.config.jax_enable_x64:
        # x64 enabled anywhere in the process breaks Mosaic lowering of even
        # pure-f32 kernels (convert_element_type recursion); f64 CLI runs
        # (python -m iamr_tpu) use the XLA smoothers on TPU
        return False
    if int(np.prod(shape)) < 16384 or shape[0] < 8:
        return False
    if len(shape) == 2 and int(np.prod(shape)) > (1 << 19):
        # 2D runs as a whole-array VMEM kernel; beyond ~512k elements the
        # ~5 resident arrays stop fitting in 16 MB VMEM
        return False
    if force:
        return True
    import os

    env = os.environ.get("IAMR_ENABLE_PALLAS", "")
    if env == "0":
        return False
    if env != "1" and int(np.prod(shape)) < (1 << 22):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _elem(size):
    return pl.Element(size, (0, 0))


# ---------------------------------------------------------------------------
# cell-centered ABecLaplacian one-color Gauss-Seidel sweep
#   phi_new = phi + mask * (rhs - (aalpha*phi - b*div(beta grad phi))) / diag


def _cell_kernel_3d(
    phip_ref, rhs_ref, aal_ref, diag_ref, bx_ref, by_ref, bz_ref, mask_ref,
    out_ref, *, b: float, inv_dx2, update: bool
):
    T = out_ref.shape[0]
    c = phip_ref[1 : T + 1, 1:-1, 1:-1]
    lap = (
        (
            bx_ref[1:, :, :] * (phip_ref[2:, 1:-1, 1:-1] - c)
            - bx_ref[:-1, :, :] * (c - phip_ref[:-2, 1:-1, 1:-1])
        )
        * inv_dx2[0]
        + (
            by_ref[:, 1:, :] * (phip_ref[1 : T + 1, 2:, 1:-1] - c)
            - by_ref[:, :-1, :] * (c - phip_ref[1 : T + 1, :-2, 1:-1])
        )
        * inv_dx2[1]
        + (
            bz_ref[:, :, 1:] * (phip_ref[1 : T + 1, 1:-1, 2:] - c)
            - bz_ref[:, :, :-1] * (c - phip_ref[1 : T + 1, 1:-1, :-2])
        )
        * inv_dx2[2]
    )
    r = rhs_ref[...] - (aal_ref[...] * c - b * lap)
    if update:
        out_ref[...] = c + mask_ref[...] * r / diag_ref[...]
    else:
        out_ref[...] = r


def _cell_kernel_2d(
    phip_ref, rhs_ref, aal_ref, diag_ref, bx_ref, by_ref, mask_ref, out_ref,
    *, b: float, inv_dx2, update: bool
):
    T = out_ref.shape[0]
    c = phip_ref[1 : T + 1, 1:-1]
    lap = (
        (
            bx_ref[1:, :] * (phip_ref[2:, 1:-1] - c)
            - bx_ref[:-1, :] * (c - phip_ref[:-2, 1:-1])
        )
        * inv_dx2[0]
        + (
            by_ref[:, 1:] * (phip_ref[1 : T + 1, 2:] - c)
            - by_ref[:, :-1] * (c - phip_ref[1 : T + 1, :-2])
        )
        * inv_dx2[1]
    )
    r = rhs_ref[...] - (aal_ref[...] * c - b * lap)
    if update:
        out_ref[...] = c + mask_ref[...] * r / diag_ref[...]
    else:
        out_ref[...] = r


def cell_sweep(
    phip, rhs, aalpha, diag, beta, mask, b, dx,
    update: bool = True, interpret: bool = False,
):
    """Fused one-color GS update (update=True) or residual (update=False).

    phip: phi with ONE filled ghost layer; aalpha = a*alpha (array).
    """
    dim = rhs.ndim
    n0 = rhs.shape[0]
    inv_dx2 = tuple(float(1.0 / (h * h)) for h in dx)
    if dim == 2:
        # whole-array kernel: Mosaic requires the last two block dims be
        # (8,128)-divisible or equal to the array dims; 2D overlapping
        # slabs can't satisfy that, and 2D planes fit VMEM whole.
        kern = partial(_cell_kernel_2d, b=float(b), inv_dx2=inv_dx2, update=update)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
            interpret=interpret,
        )(phip, rhs, aalpha, diag, beta[0], beta[1], mask)
    T = _TILE
    pad = (-n0) % T
    if pad:
        phip = _pad_rows(phip, pad)
        rhs_p = _pad_rows(rhs, pad)
        aalpha = _pad_rows(aalpha, pad)
        diag = jnp.pad(
            diag, [(0, pad)] + [(0, 0)] * (dim - 1), constant_values=1.0
        )
        beta = tuple(_pad_rows(bd, pad) for bd in beta)
        mask = _pad_rows(mask, pad)
    else:
        rhs_p = rhs
    grid = ((n0 + pad) // T,)
    n1, n2 = rhs.shape[1], rhs.shape[2]
    kern = partial(_cell_kernel_3d, b=float(b), inv_dx2=inv_dx2, update=update)
    in_specs = [
        pl.BlockSpec((_elem(T + 2), _elem(n1 + 2), _elem(n2 + 2)),
                     lambda i: (i * T, 0, 0)),
        pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((_elem(T + 1), _elem(n1), _elem(n2)),
                     lambda i: (i * T, 0, 0)),
        pl.BlockSpec((T, n1 + 1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((T, n1, n2 + 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0)),
    ]
    out_spec = pl.BlockSpec((T, n1, n2), lambda i: (i, 0, 0))
    args = (phip, rhs_p, aalpha, diag, beta[0], beta[1], beta[2], mask)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(rhs_p.shape, rhs.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return out[:n0] if pad else out


# ---------------------------------------------------------------------------
# FEM nodal Laplacian: fused weighted-Jacobi sweep / residual
#   L(phi)_n = -(1/V) sum_{t in {0,1}^d} sigma(n-1+t) sum_b K[1-t, b] phi(n-1+t+b)


def _nodal_kernel(
    phip_ref, sigp_ref, rhs_ref, upd_ref, out_ref,
    *, K, inv_vol: float, dim: int, update: bool
):
    T = out_ref.shape[0]
    corners = list(itertools.product((0, 1), repeat=dim))

    def sl_phip(off):
        # interior node r -> phip local index r + off, off in 0..2
        idx = [slice(off[0], off[0] + T)]
        for d in range(1, dim):
            stop = off[d] - 2 if off[d] - 2 < 0 else None
            idx.append(slice(off[d], stop))
        return phip_ref[tuple(idx)]

    def sl_sigp(t):
        # cells n-1+t for interior nodes n -> padded-cell rows r+t,
        # transverse [t, t+N) within extent N+2
        idx = [slice(t[0], t[0] + T)]
        for d in range(1, dim):
            idx.append(slice(t[d], t[d] - 2 if t[d] - 2 < 0 else None))
        return sigp_ref[tuple(idx)]

    L = None
    for t in corners:
        a = tuple(1 - td for td in t)
        acc = None
        for bb in corners:
            w = K[(a, bb)]
            off = tuple(t[d] + bb[d] for d in range(dim))
            term = w * sl_phip(off)
            acc = term if acc is None else acc + term
        contrib = sl_sigp(t) * acc
        L = contrib if L is None else L + contrib
    L = -inv_vol * L
    r = rhs_ref[...] - L
    if update:
        c = sl_phip((1,) * dim)
        out_ref[...] = c + upd_ref[...] * r
    else:
        out_ref[...] = upd_ref[...] * r


def nodal_sweep(
    phip, sigp, rhs, upd, K, vol, update: bool = True, interpret: bool = False
):
    """Fused nodal Jacobi sweep (update=True: out = phi + upd*(rhs - L);
    update=False: out = upd*(rhs - L), pass upd=mask for masked residuals).

    phip: padded nodes (+1/side); sigp: padded cells (+1/side); both sized
    n_nodes+2 in every dim (sigp's natural size — padded cells = nodes+1 —
    must be edge-padded by the caller to nodes+2 along each dim's end; the
    extra row is never read).
    """
    dim = rhs.ndim
    n0 = rhs.shape[0]
    kern = partial(
        _nodal_kernel, K=K, inv_vol=float(1.0 / vol), dim=dim, update=update
    )
    if dim == 2:
        # whole-array kernel (see cell_sweep for the Mosaic 2D constraint)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
            interpret=interpret,
        )(phip, sigp, rhs, upd)
    T = _TILE
    pad = (-n0) % T
    if pad:
        phip = _pad_rows(phip, pad)
        sigp = _pad_rows(sigp, pad)
        rhs_p = _pad_rows(rhs, pad)
        upd = _pad_rows(upd, pad)
    else:
        rhs_p = rhs
    grid = ((n0 + pad) // T,)
    nrest = rhs.shape[1:]
    halo_in = pl.BlockSpec(
        tuple([_elem(T + 2)] + [_elem(s + 2) for s in nrest]),
        lambda i: (i * T,) + (0,) * (dim - 1),
    )
    flat = pl.BlockSpec(
        (T,) + tuple(nrest), lambda i: (i,) + (0,) * (dim - 1)
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(rhs_p.shape, rhs.dtype),
        grid=grid,
        in_specs=[halo_in, halo_in, flat, flat],
        out_specs=flat,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(phip, sigp, rhs_p, upd)
    return out[:n0] if pad else out


def fem_K_table(dx) -> dict:
    """Static element-stiffness table keyed by (a, b) corner tuples."""
    from iamr_tpu.ops.mg_nodal import _fem_element_matrix

    return _fem_element_matrix(dx)
