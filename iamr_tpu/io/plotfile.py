"""AMReX-format plotfile writer.

Produces plotfiles readable by the AMReX toolchain (amrvis, fcompare, yt) so
results can be compared against reference outputs directly (reference writes
these via amrex VisMF; see NavierStokes.cpp:1087-1223 writePlotFile).

Layout:
    pltNNNNN/Header              text header (HyperCLaw-V1.1)
    pltNNNNN/Level_k/Cell_H      MultiFab header
    pltNNNNN/Level_k/Cell_D_0000i  FAB data (native-endian float64)

Single grid per level for now (the dense-level data model); the format
supports many grids per level and this writer takes a box list.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iamr_tpu.core.geometry import Geometry

_FAB_HEADER = (
    "FAB ((8, (64 11 52 0 1 12 0 1023)),(8, (8 7 6 5 4 3 2 1)))"
)


def _box_str(lo, hi, typ=None):
    dim = len(lo)
    t = typ if typ is not None else (0,) * dim
    return (
        "("
        + ",".join(str(x) for x in lo).join(["(", ")"])
        + " "
        + ",".join(str(x) for x in hi).join(["(", ")"])
        + " "
        + ",".join(str(x) for x in t).join(["(", ")"])
        + ")"
    )


def write_plotfile(
    path: str,
    geom: Geometry,
    fields: Dict[str, np.ndarray],
    time: float = 0.0,
    level_steps: int = 0,
):
    """Write a single-level plotfile. fields: name -> cell array (*ncell)."""
    dim = geom.dim
    names = list(fields.keys())
    ncomp = len(names)
    n = geom.ncell
    lo = (0,) * dim
    hi = tuple(x - 1 for x in n)

    os.makedirs(os.path.join(path, "Level_0"), exist_ok=True)

    # ---- FAB data file (native C++ writer when built; Python fallback)
    data = np.stack(
        [np.asarray(fields[k], dtype=np.float64) for k in names], axis=0
    )  # (ncomp, *n) -> fortran order per comp
    fab_path = os.path.join(path, "Level_0", "Cell_D_00000")
    from iamr_tpu import native

    if native.available():
        offset = native.write_fab(fab_path, data, lo, hi)
    else:
        with open(fab_path, "wb") as f:
            hdr = f"{_FAB_HEADER}{_box_str(lo, hi)} {ncomp}\n"
            f.write(hdr.encode())
            offset = f.tell()
            # AMReX fab layout: component-major, fortran (x fastest)
            for c in range(ncomp):
                f.write(np.asfortranarray(data[c]).tobytes(order="F"))

    # ---- MultiFab header
    mins = [float(data[c].min()) for c in range(ncomp)]
    maxs = [float(data[c].max()) for c in range(ncomp)]
    with open(os.path.join(path, "Level_0", "Cell_H"), "w") as f:
        f.write("1\n")  # version
        f.write("1\n")  # how (one file per fab)
        f.write(f"{ncomp}\n")
        f.write("0\n")  # ngrow
        f.write(f"(1 0\n{_box_str(lo, hi)}\n)\n")
        f.write("1\n")
        f.write(f"FabOnDisk: Cell_D_00000 {offset}\n")
        f.write("\n")
        f.write(f"1,{ncomp}\n")
        f.write(",".join(f"{v:.16e}" for v in mins) + ",\n")
        f.write("\n")
        f.write(f"1,{ncomp}\n")
        f.write(",".join(f"{v:.16e}" for v in maxs) + ",\n")

    # ---- plotfile Header
    dx = geom.dx
    with open(os.path.join(path, "Header"), "w") as f:
        f.write("HyperCLaw-V1.1\n")
        f.write(f"{ncomp}\n")
        for k in names:
            f.write(k + "\n")
        f.write(f"{dim}\n")
        f.write(f"{time:.16e}\n")
        f.write("0\n")  # finest_level
        f.write(" ".join(f"{v:.16e}" for v in geom.prob_lo) + "\n")
        f.write(" ".join(f"{v:.16e}" for v in geom.prob_hi) + "\n")
        f.write("\n")  # ref_ratio (none for single level)
        f.write(_box_str(lo, hi) + "\n")
        f.write(f"{level_steps}\n")
        f.write(" ".join(f"{v:.16e}" for v in dx) + "\n")
        f.write(f"{geom.coord_sys}\n")
        f.write("0\n")  # bndry width
        f.write(f"0 1 {time:.16e}\n")
        f.write(f"{level_steps}\n")
        for d in range(dim):
            f.write(f"{geom.prob_lo[d]:.16e} {geom.prob_hi[d]:.16e}\n")
        f.write("Level_0/Cell\n")


def read_plotfile(path: str):
    """Read back a plotfile written by write_plotfile (round-trip checks and
    comparison against reference plotfiles with identical grids)."""
    with open(os.path.join(path, "Header")) as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0].startswith("HyperCLaw")
    ncomp = int(lines[1])
    names = lines[2 : 2 + ncomp]
    i = 2 + ncomp
    dim = int(lines[i]); i += 1
    time = float(lines[i]); i += 1

    with open(os.path.join(path, "Level_0", "Cell_H")) as f:
        txt = f.read().splitlines()
    # parse the box from the BoxArray section
    box_line = next(l for l in txt if l.startswith("(("))
    nums = [int(x) for x in _parse_ints(box_line)]
    lo = nums[0:dim]
    hi = nums[dim : 2 * dim]
    shape = tuple(h - l + 1 for l, h in zip(lo, hi))
    fab_line = next(l for l in txt if l.startswith("FabOnDisk:"))
    fname, offset = fab_line.split()[1], int(fab_line.split()[2])

    with open(os.path.join(path, "Level_0", fname), "rb") as f:
        f.seek(offset)
        raw = np.frombuffer(
            f.read(8 * ncomp * int(np.prod(shape))), dtype=np.float64
        )
    data = raw.reshape((ncomp,) + shape[::-1]).transpose(
        (0,) + tuple(range(dim, 0, -1))
    )
    return {k: data[c] for c, k in enumerate(names)}, time


def _parse_ints(s):
    import re

    return re.findall(r"-?\d+", s)
