"""A/B the fused Pallas ExtrapVelToFaces vs the XLA path on TPU at 256^3.

Usage: python exp_extrap_fused.py [n]
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
    from iamr_tpu.core.bc import BCRec, MathBC
    from iamr_tpu.ops.godunov import extrap_vel_to_faces
    from iamr_tpu.ops.pallas_godunov import extrap_plm_fused

    rng = np.random.RandomState(0)
    dt, dx = 0.005, (1.0 / n,) * 3
    vel = 0.4 * rng.randn(3, n, n, n).astype(np.float32)
    vel_g = jnp.asarray(
        np.stack([np.pad(vel[c], 3, mode="wrap") for c in range(3)])
    )
    force_g = jnp.asarray(
        rng.randn(3, n + 2, n + 2, n + 2).astype(np.float32)
    )
    recs = [BCRec((MathBC.int_dir,) * 3, (MathBC.int_dir,) * 3)
            for _ in range(3)]
    zero3 = ((0.0,) * 3,) * 3

    def timeit(f, name, reps=10):
        out = f(vel_g, force_g)
        _ = float(jnp.max(jnp.abs(out[0])))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(vel_g, force_g)
        _ = float(jnp.max(jnp.abs(out[0])))
        print(f"  {name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms",
              flush=True)
        return out

    os.environ["IAMR_FUSED"] = "0"
    xla = jax.jit(lambda v, f: extrap_vel_to_faces(
        v, f, dt, dx, (n, n, n), recs, zero3, zero3))
    ref = timeit(xla, "XLA extrap")

    fused = jax.jit(lambda v, f: extrap_plm_fused(
        v, f, dt, dx, (n, n, n)))
    got = timeit(fused, "fused extrap")

    for d in range(3):
        err = float(jnp.max(jnp.abs(got[d] - ref[d])))
        print(f"  d={d} max|diff| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
