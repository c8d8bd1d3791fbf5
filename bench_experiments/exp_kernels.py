"""Microbenchmark: where does MG smoother time go at 256^3?

Times (a) the fused cell smoother pallas call alone, (b) a full 1-cycle CN
solve, (c) the nodal fused sweep path, (d) a full nodal 4-cycle solve, and
(e) calibration kernels: pure elementwise streaming vs roll-heavy bodies,
to separate VMEM/VPU roll cost from HBM traffic and XLA glue.
"""

import os
import sys
import time
from functools import partial

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, reps=10, name=""):
    out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    shape = (n, n, n)
    key = jax.random.PRNGKey(0)
    phi = jax.random.normal(key, shape, jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    dx = (1.0 / n,) * 3

    from iamr_tpu.ops import mg
    from iamr_tpu.ops.mg import PERIODIC, PoissonBC
    from iamr_tpu.ops.pallas_fused import cell_smooth_fused

    bc = PoissonBC((PERIODIC,) * 3, (PERIODIC,) * 3)
    alpha = jnp.ones(shape, jnp.float32) * 200.0
    beta = tuple(
        jnp.ones(tuple(n + (1 if d == e else 0) for e in range(3)), jnp.float32)
        for d in range(3)
    )

    # (a) fused cell smoother alone: 2 sweeps + residual
    @jax.jit
    def cell_fused(phi, rhs):
        return cell_smooth_fused(
            phi, rhs, alpha, beta, 1.0, 0.5, dx, bc.lo, bc.hi, 2, True
        )

    timeit(cell_fused, phi, rhs, name="cell fused 2sw+res (1 call)")

    # (b) full 1-V-cycle CN-style solve
    @jax.jit
    def cell_solve(phi0, rhs):
        out, res, it = mg.mg_solve(
            rhs, alpha, beta, 1.0, 0.5, dx, bc, fixed_cycles=1, phi0=phi0
        )
        return out

    timeit(cell_solve, phi, rhs, name="cell mg_solve 1 cycle")

    @jax.jit
    def cell_solve4(phi0, rhs):
        out, res, it = mg.mg_solve(
            rhs, alpha, beta, 1.0, 0.5, dx, bc, fixed_cycles=4, phi0=phi0
        )
        return out

    timeit(cell_solve4, phi, rhs, name="cell mg_solve 4 cycles")

    # (c) nodal fused sweep path: 2 sweeps + residual at (n+1)^3
    from iamr_tpu.ops import mg_nodal
    from iamr_tpu.ops.mg_nodal import NodalBC, N_PERIODIC

    nbc = NodalBC((N_PERIODIC,) * 3, (N_PERIODIC,) * 3)
    sigma = jnp.ones(shape, jnp.float32)
    levels = mg_nodal.build_nodal_hierarchy(sigma, dx, nbc)
    lev = levels[0]
    nphi = jax.random.normal(jax.random.PRNGKey(2), lev.mask.shape, jnp.float32)
    nrhs = jax.random.normal(jax.random.PRNGKey(3), lev.mask.shape, jnp.float32)

    @jax.jit
    def nodal_sm(nphi, nrhs):
        return mg_nodal._smooth2(nphi, nrhs, lev, nbc, 2, True)

    timeit(nodal_sm, nphi, nrhs, name="nodal smooth 2sw+res")

    @jax.jit
    def nodal_solve4(nphi, nrhs):
        out, res, it = mg_nodal.nodal_solve(
            nrhs, sigma, dx, nbc, fixed_cycles=4, phi0=nphi
        )
        return out

    timeit(nodal_solve4, nphi, nrhs, name="nodal solve 4 cycles")

    # (e) calibration: streaming copy kernel (HBM roofline probe)
    T = 16
    grid = (n // T,)

    def copy_kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...] * 2.0

    @jax.jit
    def stream(a):
        return pl.pallas_call(
            copy_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((T, n, n), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(a)

    t = timeit(stream, phi, name="pallas stream copy (read+write 1 array)")
    gb = 2 * n**3 * 4 / 1e9
    print(f"    -> {gb/t:.0f} GB/s effective", flush=True)

    # roll-cost probe: 27 rolls + adds on a resident block
    def roll_kernel(a_ref, o_ref):
        c = a_ref[...]
        acc = jnp.zeros_like(c)
        for o0 in (-1, 0, 1):
            for o1 in (-1, 0, 1):
                for o2 in (-1, 0, 1):
                    v = c
                    if o0:
                        v = pltpu.roll(v, o0, 0)
                    if o1:
                        v = pltpu.roll(v, o1, 1)
                    if o2:
                        v = pltpu.roll(v, o2, 2)
                    acc = acc + v * 0.125
        o_ref[...] = acc

    @jax.jit
    def roll27(a):
        return pl.pallas_call(
            roll_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((T, n, n), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(a)

    t = timeit(roll27, phi, name="pallas 27-roll stencil probe")
    print(f"    -> {27*n**3/t/1e9:.1f} Gpt-updates/s", flush=True)

    # slice-based 27-neighbor probe (the pallas_mg style: element windows)
    def slice_kernel(a_ref, o_ref):
        Tl = o_ref.shape[0]
        acc = None
        for o0 in (0, 1, 2):
            for o1 in (0, 1, 2):
                for o2 in (0, 1, 2):
                    v = a_ref[o0:Tl + o0, o1:n + o1, o2:n + o2]
                    acc = v * 0.125 if acc is None else acc + v * 0.125
        o_ref[...] = acc

    @jax.jit
    def slice27(a):
        ap = jnp.pad(a, 1, mode="wrap")
        return pl.pallas_call(
            slice_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(T + 2, (0, 0)), pl.Element(n + 2, (0, 0)),
                     pl.Element(n + 2, (0, 0))),
                    lambda i: (i * T, 0, 0),
                )
            ],
            out_specs=pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(ap)

    t = timeit(slice27, phi, name="pallas 27-slice stencil probe")
    print(f"    -> {27*n**3/t/1e9:.1f} Gpt-updates/s", flush=True)


if __name__ == "__main__":
    main()
