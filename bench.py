"""Headline benchmark: cell-updates/sec/chip on the 3D decaying-vortex config
(stand-in for HIT 256^3 until the spectral forcing lands; same kernel mix:
Godunov advection + MAC projection + CN diffusion + nodal projection per
step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against an assumed A100 reference throughput of 5e7
cell-updates/s for the full IAMR step (the reference publishes no numbers —
BASELINE.md; this anchor is an order-of-magnitude estimate for a full
projection-method step with MLMG solves on one A100, to be replaced by a
measured number when available).
"""

import json
import sys
import time

import numpy as np

A100_BASELINE_CELLS_PER_S = 5.0e7


def main():
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from __graft_entry__ import _make
    from iamr_tpu.ns.advance import advance

    cfg, state = _make(n, dim=3, dtype="float32", nu=1e-3)
    step = jax.jit(lambda s: advance(s, cfg, fixed_mg_cycles=4))

    import jax.numpy as jnp

    # warmup/compile; the scalar fetch forces full execution (the tunneled
    # TPU backend's block_until_ready can return before remote work lands)
    state = step(state)
    _ = float(jnp.max(jnp.abs(state.vel)))

    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    checksum = float(jnp.max(jnp.abs(state.vel)))
    dt_wall = time.perf_counter() - t0
    assert np.isfinite(checksum), "non-finite state after bench steps"

    cells = n**3
    cups = cells * steps / dt_wall
    print(
        json.dumps(
            {
                "metric": f"cell-updates/sec/chip (3D {n}^3 projection step)",
                "value": cups,
                "unit": "cells/s",
                "vs_baseline": cups / A100_BASELINE_CELLS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
