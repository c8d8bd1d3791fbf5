"""Gather-strategy shootout for particle MAC interpolation on TPU.

Current advect_with_umac: 48 pointwise 3D gathers (3 comps x 2 RK stages x
8 corners) = 51.9 ms at 256^3 / 65536 particles. Candidates:
  A. baseline: a[tuple(idx)] per corner (3 index arrays)
  B. flat linear-index gather per corner (1D take)
  C. one flat gather of all 8 corners per (comp,stage): indices (N,8)
  D. C + particles pre-sorted by linear cell index (locality)
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
    return out


def main():
    n = 256
    N = 65536
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(n, n, n), jnp.float32)
    pos = jnp.asarray(rng.rand(N, 3) * n, jnp.float32)  # fractional idx

    def corners_setup(pos):
        base = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        return base, frac

    # A: 8 pointwise 3D gathers
    @jax.jit
    def A(a, pos):
        base, frac = corners_setup(pos)
        val = 0.0
        for c in range(8):
            w = 1.0
            idx = []
            for e in range(3):
                bit = (c >> e) & 1
                ie = jnp.mod(base[:, e] + bit, n)
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
                idx.append(ie)
            val = val + w * a[tuple(idx)]
        return val

    # B: flat linear index per corner
    @jax.jit
    def B(a, pos):
        af = a.reshape(-1)
        base, frac = corners_setup(pos)
        val = 0.0
        for c in range(8):
            w = 1.0
            lin = 0
            for e in range(3):
                bit = (c >> e) & 1
                ie = jnp.mod(base[:, e] + bit, n)
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
                lin = lin * n + ie
            val = val + w * jnp.take(af, lin)
        return val

    # C: one flat gather, indices (N*8,)
    @jax.jit
    def C(a, pos):
        af = a.reshape(-1)
        base, frac = corners_setup(pos)
        lins = []
        ws = []
        for c in range(8):
            w = 1.0
            lin = 0
            for e in range(3):
                bit = (c >> e) & 1
                ie = jnp.mod(base[:, e] + bit, n)
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
                lin = lin * n + ie
            lins.append(lin)
            ws.append(w)
        lin8 = jnp.stack(lins, -1).reshape(-1)
        vals = jnp.take(af, lin8).reshape(-1, 8)
        return jnp.sum(vals * jnp.stack(ws, -1), -1)

    # D: C with pre-sorted particles
    @jax.jit
    def D(a, pos):
        base = jnp.floor(pos).astype(jnp.int32)
        key = (base[:, 0] * n + base[:, 1]) * n + base[:, 2]
        order = jnp.argsort(key)
        return C(a, pos[order])

    # E: 2-slice gather — one gather of contiguous PAIRS along the last
    # (lane) axis: 4 corners in xy, each fetching (z, z+1) contiguously
    @jax.jit
    def E(a, pos):
        ap = jnp.concatenate([a, a[:, :, :1]], axis=2).reshape(-1)
        base, frac = corners_setup(pos)
        val = 0.0
        wz1 = frac[:, 2]
        wz0 = 1.0 - wz1
        for c in range(4):
            w = 1.0
            lin = 0
            for e in range(2):
                bit = (c >> e) & 1
                ie = jnp.mod(base[:, e] + bit, n)
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
                lin = lin * n + ie
            lin = lin * (n + 1) + base[:, 2]  # z in [0, n-1]
            v0 = jnp.take(ap, lin)
            v1 = jnp.take(ap, lin + 1)
            val = val + w * (wz0 * v0 + wz1 * v1)
        return val

    ra = timeit(A, a, pos, name="A 8x 3D point gathers")
    rb = timeit(B, a, pos, name="B 8x flat 1D take")
    rc = timeit(C, a, pos, name="C 1x flat take (N*8)")
    rd = timeit(D, a, pos, name="D C+sorted")
    re = timeit(E, a, pos, name="E 8x flat take z-pairs")
    for nm, r in (("B", rb), ("C", rc), ("E", re)):
        print(f"    max|{nm}-A| = {float(jnp.max(jnp.abs(r - ra))):.2e}")


if __name__ == "__main__":
    main()


def main2():
    n = 256
    N = 65536
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(n, n, n), jnp.float32)
    pos = jnp.asarray(rng.rand(N, 3) * n, jnp.float32)

    # F: packed corner rows — P[lin, c] = a at corner c of cell lin;
    # one contiguous 32B row-gather per particle
    @jax.jit
    def build(a):
        rolls = []
        for c in range(8):
            sh = [-( (c >> e) & 1) for e in range(3)]
            rolls.append(jnp.roll(a, sh, (0, 1, 2)))
        return jnp.stack(rolls, -1).reshape(-1, 8)

    @jax.jit
    def F(P, pos):
        base = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        idx = [jnp.mod(base[:, e], n) for e in range(3)]
        lin = (idx[0] * n + idx[1]) * n + idx[2]
        rows = jnp.take(P, lin, axis=0)  # (N, 8)
        ws = []
        for c in range(8):
            w = 1.0
            for e in range(3):
                bit = (c >> e) & 1
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
            ws.append(w)
        return jnp.sum(rows * jnp.stack(ws, -1), -1)

    P = timeit(build, a, name="F build packed (n^3,8)")
    rf = timeit(F, P, pos, name="F row-gather interp")

    # reference A for correctness
    @jax.jit
    def A(a, pos):
        base = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        val = 0.0
        for c in range(8):
            w = 1.0
            idx = []
            for e in range(3):
                bit = (c >> e) & 1
                ie = jnp.mod(base[:, e] + bit, n)
                w = w * (frac[:, e] if bit else 1.0 - frac[:, e])
                idx.append(ie)
            val = val + w * a[tuple(idx)]
        return val

    ra = A(a, pos)
    print(f"    max|F-A| = {float(jnp.max(jnp.abs(rf - ra))):.2e}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "packed":
    main2()
