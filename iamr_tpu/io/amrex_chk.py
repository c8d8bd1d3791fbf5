"""AMReX-format checkpoint directories (chkNNNNN/) — write AND restart.

Interop layer matching the reference's checkpoint machinery
(NavierStokesBase::checkPoint -> AmrLevel::checkPoint -> StateData::
checkPoint -> VisMF, NavierStokesBase.cpp:856-897; restart path
cpp:2684-2727): a chk directory holds one text `Header` (Amr::checkPoint
layout) plus per-level `Level_k/SD_i_New_MF` VisMF MultiFabs, one per
registered state type (NS_setup.cpp:228-405):

    SD_0  State_Type  cell  [xvel..(zvel), density, tracer.., (temp)]
    SD_1  Press_Type  node  [pressure]
    SD_2  Gradp_Type  cell  [gpx..(gpz)]
    SD_3  Dsdt/Divu   cell  (only when present)

The reader is deliberately tolerant (token/regex parsing, structural
fallbacks) so that checkpoints written by the reference C++ — whose exact
stream formatting of Geometry/RealBox varies across AMReX versions — still
restart here: it keys on the fixed numeric header lines (cumtime,
finest_level, dt_level, level_steps) and on the self-describing VisMF _H
files, accepts `2\\n new\\n old\\n` dump_old entries (uses the new data),
recomputes Gradp from the nodal pressure when SD_2 is absent
(ns.gradp_in_checkpoint=0 semantics, cpp:2714-2724), and defaults temp
when State_Type carries none (ns.avg/temp back-compat)."""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

import numpy as np

from iamr_tpu.io.vismf import assemble_level, box_str, read_vismf

CHK_VERSION = "CheckPointVersion_1.0"


def _state_comps(cfg) -> List[str]:
    names = ["xvel", "yvel", "zvel"][: cfg.dim] + ["density"]
    names += [f"tracer{i if i else ''}" for i in range(cfg.ntrac)]
    if cfg.do_temp:
        names.append("temp")
    return names


def _geom_str(cfg, lev: int, spec=None) -> str:
    """Geometry in the reference's stream form:
    (coord (offset)(cellsize))(RealBox lo hi ...)((domain box))P(periodic)."""
    dim = cfg.dim
    ratio = 1
    for s in ([] if spec is None else spec):
        ratio *= s.ratio
    dx = tuple(d / ratio for d in cfg.geom.dx)
    n = tuple(c * ratio for c in cfg.geom.ncell)
    cs = (
        f"({cfg.geom.coord_sys} "
        + "(" + ",".join(str(float(v)) for v in cfg.geom.prob_lo) + ")"
        + "(" + ",".join(repr(float(v)) for v in dx) + "))"
    )
    rb = "(RealBox " + " ".join(
        f"{float(lo)} {float(hi)}"
        for lo, hi in zip(cfg.geom.prob_lo, cfg.geom.prob_hi)
    ) + " )"
    dom = box_str((0,) * dim, tuple(x - 1 for x in n))
    per = "(" + ",".join(str(int(p)) for p in cfg.geom.periodic) + ")"
    return cs + rb + dom + "P" + per


def write_checkpoint_amrex(path: str, states, specs, cfg, step: int = 0):
    """Write a chkNNNNN directory in the AMReX layout. states:
    [lev0..levN] NSStates; specs[k] nests level k+1 in level k."""
    from iamr_tpu.io.vismf import write_vismf

    dim = cfg.dim
    nlev = len(states)
    os.makedirs(path, exist_ok=True)
    cumtime = float(states[0].time)

    lines = [
        CHK_VERSION,
        str(dim),
        repr(cumtime),
        str(nlev - 1),          # max_level as-written (restart cap)
        str(nlev - 1),          # finest_level
        " ".join(_geom_str(cfg, k, specs[:k]) for k in range(nlev)),
        " ".join(
            "(" + ",".join([str(specs[k].ratio)] * dim) + ")"
            for k in range(nlev - 1)
        ),
        " ".join(repr(float(s.dt)) for s in states),        # dt_level
        " ".join(repr(float(s.dt)) for s in states),        # dt_min
        " ".join(
            ["1"] + [str(specs[k].ratio) for k in range(nlev - 1)]
        ),                                                   # n_cycle
        " ".join(str(step) for _ in states),                 # level_steps
        " ".join("0" for _ in states),                       # level_count
    ]

    comp_names = _state_comps(cfg)
    for lev, s in enumerate(states):
        lev_dir = f"Level_{lev}"
        os.makedirs(os.path.join(path, lev_dir), exist_ok=True)
        rho = np.asarray(s.rho)
        shape = rho.shape
        lo = (0,) * dim if lev == 0 else tuple(specs[lev - 1].lo)
        hi = tuple(lo[d] + shape[d] - 1 for d in range(dim))
        t = float(s.time)

        # State_Type
        state_data = np.concatenate(
            [np.asarray(s.vel), rho[None], np.asarray(s.trac)]
            + ([np.asarray(s.temp)[None]] if cfg.do_temp else []),
            axis=0,
        )
        # Press_Type (nodal)
        p = np.asarray(s.p)[None]
        # Gradp_Type
        gp = np.asarray(s.gradp)

        lines += [str(lev), _geom_str(cfg, lev, specs[:lev]),
                  f"(1 0", box_str(lo, hi), ")"]
        sds = [("SD_0", state_data, (0,) * dim, hi),
               ("SD_1", p, (1,) * dim, tuple(h + 1 for h in hi)),
               ("SD_2", gp, (0,) * dim, hi)]
        if s.dsdt is not None:
            sds.append(("SD_3", np.asarray(s.dsdt)[None], (0,) * dim, hi))
        for name, data, typ, hi_t in sds:
            mf_rel = f"{lev_dir}/{name}_New_MF"
            lines += [
                box_str(lo, hi_t, typ), f"(1 0", box_str(lo, hi_t, typ),
                ")", repr(t), repr(t), repr(t), repr(t), "1", mf_rel,
            ]
            write_vismf(
                os.path.join(path, mf_rel), [(data, lo, hi_t)],
                data.shape[0], typ=typ,
            )
        assert state_data.shape[0] == len(comp_names)

    with open(os.path.join(path, "Header"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _floats(s: str) -> List[float]:
    return [
        float(x)
        for x in re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", s)
    ]


def _read_sd(path: str, lev: int, i: int):
    prefix = os.path.join(path, f"Level_{lev}", f"SD_{i}_New_MF")
    if not os.path.exists(prefix + "_H"):
        return None
    boxes, ncomp = read_vismf(prefix)
    return boxes, ncomp


def read_checkpoint_amrex(path: str, cfg):
    """Restart from an AMReX chk directory -> (states, specs, step).

    Works for directories written by write_checkpoint_amrex AND (tolerant
    parsing) by the reference C++ Amr::checkPoint."""
    import jax.numpy as jnp

    from iamr_tpu.amr.hierarchy import LevelSpec
    from iamr_tpu.ns.state import NSState

    with open(os.path.join(path, "Header")) as f:
        header = [ln.rstrip("\n") for ln in f]
    if not header[0].startswith("CheckPointVersion"):
        raise ValueError(f"{path}: not an AMReX checkpoint (v: {header[0]})")
    spacedim = int(header[1])
    if spacedim != cfg.dim:
        raise ValueError(f"checkpoint is {spacedim}D, config is {cfg.dim}D")
    cumtime = float(header[2])
    finest = int(header[4])
    ratio_ints = [int(x) for x in re.findall(r"-?\d+", header[6])]
    # IntVect form repeats the ratio per dim; scalar form is one per level
    ratios = (
        ratio_ints[::spacedim]
        if len(ratio_ints) == finest * spacedim
        else (ratio_ints or [2] * finest)
    )
    dt_level = _floats(header[7]) or [0.0] * (finest + 1)
    steps = [int(float(x)) for x in _floats(header[10])] or [0]
    # Validate the positional parse (Amr::checkPoint writes ref_ratio,
    # dt_level, dt_min, n_cycle, level_steps on fixed lines after the
    # one-line-per-hierarchy geometry dump) — an AMReX version that
    # inserts/reorders Header lines must fail loudly, not mis-parse.
    if len(dt_level) < finest + 1 or any(
        not (d >= 0.0) for d in dt_level[: finest + 1]
    ):
        raise ValueError(
            f"{path}: Header line 8 does not parse as dt_level for "
            f"finest_level={finest} (got {dt_level!r}); unsupported "
            f"checkpoint Header layout"
        )
    if len(steps) < finest + 1 or any(s < 0 for s in steps[: finest + 1]):
        raise ValueError(
            f"{path}: Header line 11 does not parse as level_steps "
            f"(got {steps!r}); unsupported checkpoint Header layout"
        )

    dtype = cfg.jdtype
    states, specs = [], []
    for lev in range(finest + 1):
        sd0 = _read_sd(path, lev, 0)
        if sd0 is None:
            raise IOError(f"{path}/Level_{lev}/SD_0_New_MF missing")
        boxes0, nc0 = sd0
        lo0 = tuple(
            min(b[0][d] for b in boxes0) for d in range(spacedim)
        )
        state_arr = assemble_level(boxes0, nc0, lo0=lo0)
        shape = state_arr.shape[1:]

        vel = state_arr[:spacedim]
        rho = state_arr[spacedim]
        n_extra = nc0 - spacedim - 1
        ntr_file = n_extra - (1 if cfg.do_temp and n_extra > cfg.ntrac else 0)
        ntr_file = max(0, min(ntr_file, n_extra))
        trac = state_arr[spacedim + 1: spacedim + 1 + ntr_file]
        if trac.shape[0] < cfg.ntrac:
            pad = np.zeros((cfg.ntrac - trac.shape[0],) + shape)
            trac = np.concatenate([trac, pad], 0) if trac.size else pad
        else:
            trac = trac[: cfg.ntrac]
        temp = (
            state_arr[spacedim + 1 + ntr_file]
            if nc0 > spacedim + 1 + ntr_file
            else np.ones(shape)
        )

        sd1 = _read_sd(path, lev, 1)
        if sd1 is None:
            raise IOError(f"{path}/Level_{lev}/SD_1_New_MF missing")
        boxes1, _ = sd1
        p = assemble_level(boxes1, 1, lo0=lo0)[0]

        p_j = jnp.asarray(p, dtype=dtype)
        sd2 = _read_sd(path, lev, 2)
        if sd2 is not None:
            gradp = jnp.asarray(
                assemble_level(sd2[0], sd2[1], lo0=lo0), dtype=dtype
            )
        else:
            # ns.gradp_in_checkpoint=0: recompute Gp from the pressure
            from iamr_tpu.ops.mg_nodal import grad_node_to_cell

            ratio = 1
            for r in ratios[:lev]:
                ratio *= r
            dx = tuple(d / ratio for d in cfg.geom.dx)
            gradp = jnp.stack(list(grad_node_to_cell(p_j, dx)))

        sd3 = _read_sd(path, lev, 3)
        dsdt = (
            jnp.asarray(assemble_level(sd3[0], sd3[1], lo0=lo0)[0],
                        dtype=dtype)
            if sd3 is not None
            else None
        )

        states.append(NSState(
            vel=jnp.asarray(vel, dtype=dtype),
            rho=jnp.asarray(rho, dtype=dtype),
            trac=jnp.asarray(trac, dtype=dtype),
            temp=jnp.asarray(temp, dtype=dtype),
            p=p_j,
            gradp=gradp,
            time=jnp.asarray(cumtime, dtype=dtype),
            dt=jnp.asarray(
                dt_level[lev] if lev < len(dt_level) else dt_level[-1],
                dtype=dtype,
            ),
            dsdt=dsdt,
        ))
        if lev > 0:
            specs.append(LevelSpec(
                lo=lo0, ncell=shape, ratio=int(ratios[lev - 1])
            ))
    return states, specs, int(steps[0])


def is_amrex_checkpoint(path: str) -> bool:
    hdr = os.path.join(path, "Header")
    if not os.path.exists(hdr):
        return False
    with open(hdr) as f:
        return f.readline().startswith("CheckPointVersion")
