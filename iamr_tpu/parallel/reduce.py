"""Layout-invariant reductions: sharded == unsharded BITWISE.

Floating-point sums are not associative, and the summation order of
jnp.sum is layout-dependent (per-shard partial sums + all-reduce under
GSPMD, one row-major sweep on a single device). Anywhere a reduction's
result feeds back into the field being computed — the singular-solve mean
projections, CG dot products, diagonal scalings — that last-bit difference
seeds layout-dependent branches at thresholded ops (slope-limiter /
upwind ties), which the advection scheme amplifies to O(slope) local
differences (see tests/test_parallel.py::test_sharded_two_level_matches).

`invariant_sum` removes the seed: a fixed index-pairing binary tree
(x[:n/2] + x[n/2:] until one element) whose rounding order is a property
of the ALGORITHM, not the device layout, so every layout produces the
identical bit pattern. Cost: log2(N) elementwise passes — fine for the
coarse-level solves and the per-solve mean projections where it is used
(the data is touched O(log N) more times, but these arrays are a small
fraction of step traffic).
"""

from __future__ import annotations

import jax.numpy as jnp


def _tree_reduce_axis(v, axis: int):
    """Fixed-pairing binary-tree sum along `axis` (pad to a power of two
    with exact zeros; x + 0 is exact). ONE implementation backs every
    invariant reduction so the pairing order can never diverge between
    call sites."""
    n = v.shape[axis]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * v.ndim
        pad[axis] = (0, p - n)
        v = jnp.pad(v, pad)
    while v.shape[axis] > 1:
        h = v.shape[axis] // 2
        lo = [slice(None)] * v.ndim
        hi = [slice(None)] * v.ndim
        lo[axis] = slice(None, h)
        hi[axis] = slice(h, None)
        v = v[tuple(lo)] + v[tuple(hi)]
    return jnp.squeeze(v, axis=axis)


def invariant_sum(x):
    """Bitwise layout-invariant sum via fixed-pairing binary-tree
    reduction. Returns a 0-d array of x.dtype."""
    return _tree_reduce_axis(x.reshape(-1), 0)


def invariant_mean(x):
    return invariant_sum(x) / x.size


def invariant_dot(a, b):
    """Layout-invariant <a, b> (the products are elementwise/exact-order;
    only the summation order needed pinning)."""
    return invariant_sum(a * b)


def invariant_matvec(A, v):
    """Layout-invariant A @ v: a matmul's per-row dot products reduce in a
    codegen-chosen order, which differs between compilations (sharded vs
    not); fixed-pairing tree-reduce the contraction axis instead. Meant
    for the SMALL dense bottom-solve matrices (N <= ~1000)."""
    return _tree_reduce_axis(A * v[None, :], 1)
