"""Sweep the fused multi-field Godunov kernel's slab/tile sizes
(IAMR_GOD_T x IAMR_GOD_T1) on the production HIT shape: nc=5 fields
(vel x3 + rho + tracer), nf=3 forces, 256^3 f32. The in-step cost of this
one kernel is ~53% of the whole spectral step (exp_step_ablation.py), so
its tile geometry is the #1 throughput lever.

Usage: python exp_god_tt1.py [n] [T,T1 T,T1 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    pairs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]] or [
        (8, 64), (16, 32), (16, 64), (24, 64), (32, 32), (32, 64), (8, 128),
    ]

    from iamr_tpu.ops import pallas_godunov as pg

    rng = np.random.RandomState(3)
    dt, dx = 0.005, (1.0 / n,) * 3
    nc, nf = 5, 3
    s_gs = [jnp.asarray(rng.rand(n + 6, n + 6, n + 6), jnp.float32)
            for _ in range(nc)]
    umac = tuple(
        jnp.asarray(
            rng.rand(*[n + (1 if e == d else 0) for e in range(3)]) - 0.5,
            jnp.float32)
        for d in range(3))
    umac_g = tuple(
        jnp.asarray(
            rng.rand(*[n + 1 if e == d else n + 2 for e in range(3)]) - 0.5,
            jnp.float32)
        for d in range(3))
    force_gs = [jnp.asarray(rng.rand(n + 2, n + 2, n + 2), jnp.float32)
                for _ in range(nf)]
    rows = [0, 1, 2, -1, -1]
    iconservs = [False, False, False, True, True]
    convs = [True, True, True, False, False]

    def run():
        out = pg.godunov_plm_fused_multi(
            s_gs, umac, umac_g, dt, dx, (n, n, n), iconservs, force_gs,
            rows, convs, periodic=(True, True, True))
        return out[0][1]  # aofs field 0

    ref = None
    for (t, t1) in pairs:
        os.environ["IAMR_GOD_T"] = str(t)
        os.environ["IAMR_GOD_T1"] = str(t1)
        try:
            f = jax.jit(run)
            a = f()
            a.block_until_ready()
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                a = f()
            a.block_until_ready()
            el = (time.perf_counter() - t0) / reps
            err = (float(jnp.max(jnp.abs(a - ref))) if ref is not None
                   else 0.0)
            if ref is None:
                ref = a
            print(f"T={t:3d} T1={t1:4d}: {el*1e3:8.2f} ms   "
                  f"({nc*n**3/el/1e6:7.1f} Mcell-fields/s)  max|d|={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"T={t:3d} T1={t1:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        finally:
            os.environ.pop("IAMR_GOD_T", None)
            os.environ.pop("IAMR_GOD_T1", None)


if __name__ == "__main__":
    main()
