"""Checkpoint / restart.

Functional replacement for the reference's checkpoint machinery
(NavierStokesBase::checkPoint/restart, cpp:856-897, 2684-2727): the entire
NSState pytree plus time metadata round-trips through a single npz file per
level (orbax-style single-writer; the state is gathered to host). Restart
determinism is a regression requirement (reference Test/IAMR-tests.ini
Euler_restart, restartTest=1).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from iamr_tpu.ns.state import NSConfig, NSState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: NSState, step: int = 0):
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, "state.npz"),
        vel=np.asarray(state.vel),
        rho=np.asarray(state.rho),
        trac=np.asarray(state.trac),
        temp=np.asarray(state.temp),
        p=np.asarray(state.p),
        gradp=np.asarray(state.gradp),
    )
    meta = {
        "version": FORMAT_VERSION,
        "time": float(state.time),
        "dt": float(state.dt),
        "step": step,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, cfg: NSConfig) -> Tuple[NSState, int]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != {FORMAT_VERSION}")
    z = np.load(os.path.join(path, "state.npz"))
    dtype = cfg.jdtype
    state = NSState(
        vel=jnp.asarray(z["vel"], dtype=dtype),
        rho=jnp.asarray(z["rho"], dtype=dtype),
        trac=jnp.asarray(z["trac"], dtype=dtype),
        temp=jnp.asarray(z["temp"], dtype=dtype),
        p=jnp.asarray(z["p"], dtype=dtype),
        gradp=jnp.asarray(z["gradp"], dtype=dtype),
        time=jnp.asarray(meta["time"], dtype=dtype),
        dt=jnp.asarray(meta["dt"], dtype=dtype),
    )
    return state, int(meta["step"])
