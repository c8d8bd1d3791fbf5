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


def _atomic_savez(path: str, **arrays):
    """Write-then-rename so a crash mid-save never leaves a truncated
    state file behind (restart determinism is a regression requirement)."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _atomic_write_text(path: str, text: str):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def save_checkpoint(path: str, state: NSState, step: int = 0):
    os.makedirs(path, exist_ok=True)
    _atomic_savez(
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
    _atomic_write_text(os.path.join(path, "meta.json"), json.dumps(meta))


def load_checkpoint(path: str, cfg: NSConfig) -> Tuple[NSState, int]:
    """Load a checkpoint; tolerates older files missing gradp/temp (the
    reference's ns.gradp_in_checkpoint=0 backward-compat path recomputes
    Gp from the nodal pressure on load, NavierStokesBase.cpp:2684-2724).
    AMReX-format chk directories (the reference's own checkpoints) are
    detected and read via io/amrex_chk.py."""
    from iamr_tpu.io.amrex_chk import is_amrex_checkpoint, read_checkpoint_amrex

    if is_amrex_checkpoint(path):
        states, _specs, step = read_checkpoint_amrex(path, cfg)
        return states[0], step
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


def save_particles(path: str, parts):
    """Particles sidecar inside a checkpoint dir (the reference stores the
    particle container under chk*/Particles; NavierStokesBase checkPoint
    particle branch)."""
    _atomic_savez(
        os.path.join(path, "particles.npz"),
        pos=np.asarray(parts.pos),
        alive=np.asarray(parts.alive),
    )


def load_particles(path: str, dtype="float64"):
    """Load the particles sidecar; None when the checkpoint has none
    (restart_from_nonparticle_chkfile semantics)."""
    from iamr_tpu.ns.particles import Particles

    f = os.path.join(path, "particles.npz")
    if not os.path.exists(f):
        return None
    z = np.load(f)
    return Particles(
        pos=jnp.asarray(z["pos"], dtype=dtype),
        alive=jnp.asarray(z["alive"], dtype=bool),
    )


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
    if "dsdt" in z.files:
        fields["dsdt"] = pc(z["dsdt"])
    _atomic_savez(os.path.join(out_path, "state.npz"), **fields)
    _atomic_write_text(os.path.join(out_path, "meta.json"), json.dumps(meta))
    # particles refine trivially (positions are grid-independent)
    psrc = os.path.join(in_path, "particles.npz")
    if os.path.exists(psrc):
        import shutil

        shutil.copy(psrc, os.path.join(out_path, "particles.npz"))


def _state_arrays(state: NSState):
    out = {
        "vel": np.asarray(state.vel),
        "rho": np.asarray(state.rho),
        "trac": np.asarray(state.trac),
        "temp": np.asarray(state.temp),
        "p": np.asarray(state.p),
        "gradp": np.asarray(state.gradp),
    }
    if state.dsdt is not None:
        out["dsdt"] = np.asarray(state.dsdt)
    return out


def save_checkpoint_ml(path: str, states, specs, step: int = 0,
                       boxlists=None):
    """Multilevel checkpoint: every level's NSState plus the LevelSpec
    nesting metadata in one npz (the reference writes one Level_N dir per
    level + the grids in the Header, Amr::checkPoint; same content,
    single-writer form). states: [lev0..levN]; specs[k] nests level k+1
    inside level k. boxlists[k]: optional TRUE box list of level k+1
    (multi-box union levels) so a restart reconstructs the BoxArray, not
    just its bounding box."""
    os.makedirs(path, exist_ok=True)
    arrays = {}
    for lev, s in enumerate(states):
        for k, v in _state_arrays(s).items():
            arrays[f"lev{lev}_{k}"] = v
    _atomic_savez(os.path.join(path, "state.npz"), **arrays)
    meta = {
        "version": FORMAT_VERSION,
        "nlevels": len(states),
        "time": float(states[0].time),
        "dt": float(states[0].dt),
        "dts": [float(s.dt) for s in states],
        "step": step,
        "specs": [
            {"lo": list(sp.lo), "ncell": list(sp.ncell), "ratio": sp.ratio}
            for sp in specs
        ],
    }
    if boxlists is not None:
        meta["boxlists"] = [
            None if bl is None else [
                {"lo": list(b.lo), "ncell": list(b.ncell), "ratio": b.ratio}
                for b in bl
            ]
            for bl in boxlists
        ]
    _atomic_write_text(os.path.join(path, "meta.json"), json.dumps(meta))


def load_checkpoint_ml(path: str, cfg: NSConfig):
    """Load a multilevel checkpoint -> (states list, specs list, step).
    AMReX-format chk directories (written by the reference C++ or by
    write_checkpoint_amrex) are detected and read via io/amrex_chk.py."""
    from iamr_tpu.amr.hierarchy import LevelSpec
    from iamr_tpu.io.amrex_chk import is_amrex_checkpoint, read_checkpoint_amrex

    if is_amrex_checkpoint(path):
        return read_checkpoint_amrex(path, cfg)

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint version {meta['version']} != {FORMAT_VERSION}"
        )
    if "nlevels" not in meta:
        # single-level checkpoint: loadable as a 1-level hierarchy
        state, step = load_checkpoint(path, cfg)
        return [state], [], step
    z = np.load(os.path.join(path, "state.npz"))
    dtype = cfg.jdtype
    states = []
    for lev in range(int(meta["nlevels"])):
        g = lambda k: jnp.asarray(z[f"lev{lev}_{k}"], dtype=dtype)
        states.append(NSState(
            vel=g("vel"), rho=g("rho"), trac=g("trac"), temp=g("temp"),
            p=g("p"), gradp=g("gradp"),
            time=jnp.asarray(meta["time"], dtype=dtype),
            dt=jnp.asarray(meta["dts"][lev], dtype=dtype),
            dsdt=(
                g("dsdt") if f"lev{lev}_dsdt" in z.files else None
            ),
        ))
    specs = [
        LevelSpec(lo=tuple(s["lo"]), ncell=tuple(s["ncell"]),
                  ratio=int(s["ratio"]))
        for s in meta["specs"]
    ]
    return states, specs, int(meta["step"])


def load_boxlists(path: str):
    """Per-level true box lists saved by save_checkpoint_ml(boxlists=...),
    or None for older / AMReX-format checkpoints."""
    from iamr_tpu.amr.hierarchy import LevelSpec

    mp = os.path.join(path, "meta.json")
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        meta = json.load(f)
    raw = meta.get("boxlists")
    if raw is None:
        return None
    return [
        None if bl is None else tuple(
            LevelSpec(lo=tuple(b["lo"]), ncell=tuple(b["ncell"]),
                      ratio=int(b["ratio"]))
            for b in bl
        )
        for bl in raw
    ]
