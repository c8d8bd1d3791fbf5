"""Probe: jnp.fft performance on the axon v5e at solver shapes.

A periodic constant-coefficient Poisson/Helmholtz solve is 1 rfftn +
scale + 1 irfftn. If that beats ~25ms at 256^3 it replaces 4 MG V-cycles
(exactly, not approximately) for the all-periodic uniform-rho problems.
"""

import os
import sys
import time

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


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
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    dx = 1.0 / n

    k = 2.0 * jnp.pi * jnp.fft.fftfreq(n).astype(jnp.float32)
    kr = 2.0 * jnp.pi * jnp.fft.rfftfreq(n).astype(jnp.float32)
    # 7-pt cell Laplacian symbol
    s = lambda kk: (2.0 - 2.0 * jnp.cos(kk)) / dx**2
    sym = (
        s(k)[:, None, None] + s(k)[None, :, None] + s(kr)[None, None, :]
    )
    sym = sym.at[0, 0, 0].set(1.0)

    @jax.jit
    def poisson(b):
        bh = jnp.fft.rfftn(b)
        ph = bh / sym
        ph = ph.at[0, 0, 0].set(0.0)
        return jnp.fft.irfftn(ph, s=shape)

    t = timeit(poisson, x, name=f"rfftn poisson solve {n}^3 f32")
    print(f"    (fwd+inv+scale; ~{2*5*n**3*np.log2(n**3)/t/1e12:.2f} TFLOP/s)",
          flush=True)

    @jax.jit
    def fwd(b):
        return jnp.fft.rfftn(b)

    timeit(fwd, x, name="rfftn alone")

    # complex c2c for comparison
    xc = x.astype(jnp.complex64)

    @jax.jit
    def c2c(b):
        return jnp.fft.fftn(b)

    timeit(c2c, xc, name="fftn c2c")

    # residual check: apply 7-pt stencil to solution, compare to rhs
    b = x - jnp.mean(x)
    p = poisson(b)

    def lap(p):
        out = -6.0 * p
        for d in range(3):
            out = out + jnp.roll(p, 1, d) + jnp.roll(p, -1, d)
        return out / dx**2

    r = lap(p) - b
    print(f"  rel resid of 7pt solve: "
          f"{float(jnp.max(jnp.abs(r)))/float(jnp.max(jnp.abs(b))):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
