"""Sweep the fused Godunov kernel's transverse tile size (IAMR_GOD_T1).

The kernel is VMEM-load bound (pallas_godunov.py); T1 trades block count
against per-block halo overlap. Times one advect_field at 256^3 per T1.
Usage: python exp_god_t1.py [n] [T1 ...]
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
    t1s = [int(a) for a in sys.argv[2:]] or [16, 32, 64, 128, 256]

    from iamr_tpu.ops.pallas_godunov import godunov_plm_fused

    rng = np.random.RandomState(3)
    dt, dx = 0.005, (1.0 / n,) * 3
    s_g = jnp.asarray(rng.rand(n + 6, n + 6, n + 6), jnp.float32)
    umac = tuple(
        jnp.asarray(
            rng.rand(*[n + (1 if e == d else 0) for e in range(3)]) - 0.5,
            jnp.float32,
        )
        for d in range(3)
    )
    umac_g = tuple(
        jnp.asarray(
            rng.rand(*[n + 1 if e == d else n + 2 for e in range(3)]) - 0.5,
            jnp.float32,
        )
        for d in range(3)
    )

    for t1 in t1s:
        os.environ["IAMR_GOD_T1"] = str(t1)
        f = jax.jit(
            lambda s, u, ug: godunov_plm_fused(
                s, u, ug, dt, dx, (n, n, n), True
            )[1]
        )
        try:
            out = f(s_g, umac, umac_g)
            _ = float(jnp.max(jnp.abs(out)))
        except Exception as e:
            print(f"T1={t1}: FAILED {type(e).__name__}", flush=True)
            f.clear_cache()
            continue
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(s_g, umac, umac_g)
        _ = float(jnp.max(jnp.abs(out)))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"T1={t1}: {ms:.2f} ms/field", flush=True)
        f.clear_cache()


if __name__ == "__main__":
    main()
