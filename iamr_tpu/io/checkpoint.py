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
        **(
            {"dsdt": np.asarray(state.dsdt)}
            if state.dsdt is not None
            else {}
        ),
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
    """Load a checkpoint; tolerates older files missing gradp/temp (the
    reference's ns.gradp_in_checkpoint=0 backward-compat path recomputes
    Gp from the nodal pressure on load, NavierStokesBase.cpp:2684-2724)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != {FORMAT_VERSION}")
    z = np.load(os.path.join(path, "state.npz"))
    dtype = cfg.jdtype
    p = jnp.asarray(z["p"], dtype=dtype)
    if "gradp" in z.files:
        gradp = jnp.asarray(z["gradp"], dtype=dtype)
    else:
        from iamr_tpu.ops.mg_nodal import grad_node_to_cell

        gradp = jnp.stack(list(grad_node_to_cell(p, cfg.geom.dx)))
    if "temp" in z.files:
        temp = jnp.asarray(z["temp"], dtype=dtype)
    else:
        temp = jnp.ones_like(jnp.asarray(z["rho"], dtype=dtype))
    state = NSState(
        vel=jnp.asarray(z["vel"], dtype=dtype),
        rho=jnp.asarray(z["rho"], dtype=dtype),
        trac=jnp.asarray(z["trac"], dtype=dtype),
        temp=temp,
        p=p,
        gradp=gradp,
        time=jnp.asarray(meta["time"], dtype=dtype),
        dt=jnp.asarray(meta["dt"], dtype=dtype),
        dsdt=(
            jnp.asarray(z["dsdt"], dtype=dtype) if "dsdt" in z.files else None
        ),
    )
    return state, int(meta["step"])


def refine_checkpoint(in_path: str, out_path: str, ratio: int = 2):
    """Refine a checkpoint onto a ratio-times-finer grid (the
    Util/ConvertCheckpoint/ConvertCheckpointGrids.cpp offline tool):
    piecewise-constant prolongation of cell data, node-bilinear for p."""
    with open(os.path.join(in_path, "meta.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(in_path, "state.npz"))

    def pc(a, ncomp_axes=0):
        out = a
        for d in range(ncomp_axes, a.ndim):
            out = np.repeat(out, ratio, axis=d)
        return out

    def node_refine(p):
        # bilinear refinement of node data
        out = p
        for d in range(p.ndim):
            n = out.shape[d]
            fine_n = (n - 1) * ratio + 1
            xi = np.arange(fine_n) / ratio
            i0 = np.minimum(xi.astype(int), n - 2)
            w = xi - i0
            a0 = np.take(out, i0, axis=d)
            a1 = np.take(out, i0 + 1, axis=d)
            shape = [1] * out.ndim
            shape[d] = fine_n
            w = w.reshape(shape)
            out = a0 * (1 - w) + a1 * w
        return out

    os.makedirs(out_path, exist_ok=True)
    fields = {
        "vel": pc(z["vel"], 1),
        "rho": pc(z["rho"]),
        "trac": pc(z["trac"], 1),
        "p": node_refine(z["p"]),
    }
    if "temp" in z.files:
        fields["temp"] = pc(z["temp"])
    if "gradp" in z.files:
        fields["gradp"] = pc(z["gradp"], 1)
    np.savez(os.path.join(out_path, "state.npz"), **fields)
    with open(os.path.join(out_path, "meta.json"), "w") as f:
        json.dump(meta, f)
