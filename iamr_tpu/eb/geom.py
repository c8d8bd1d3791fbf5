"""Embedded-boundary (cut-cell) geometry.

TPU-native equivalent of the AMReX EB2 geometry engine as used by IAMR
(reference Source/NS_init_eb2.cpp:70-400; EB2::Build with implicit functions
sphere/cylinder/box/plane + union/intersection/difference). Geometry is
evaluated ONCE on the host at init into dense fraction arrays (the TPU
analogue of EBFArrayBoxFactory's volfrac/areafrac/flags); everything inside
the jitted step consumes those static arrays.

Conventions:
  * implicit functions are FLUID-POSITIVE: psi(x) > 0 in fluid, < 0 in the
    body (AMReX EB2 IFs are body-positive; we flip at construction).
  * fractions are computed by supersampling psi (ss points per cell per
    dim). Exact-geometry moments are a planned refinement; supersampling
    converges the fractions to O(1/ss) which is below the cut-cell scheme's
    own first-order wall error.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from iamr_tpu.core.geometry import Geometry


class EBData(NamedTuple):
    """Static cut-cell geometry arrays for one level (a jax pytree).

    vfrac:   (*n) volume fraction in [0,1]
    afrac:   tuple of face-centered area fractions (shape +1 in dim d)
    fluid:   (*n) 1.0 where vfrac > 0 (uncovered), else 0.0
    covered: (*n) 1.0 where vfrac == 0
    regular: (*n) 1.0 where the cell and all its faces are full
    aeb_vol: (*n) EB boundary area per cell volume, |A_eb|/V  [1/length]
    d_eb:    (*n) first-order wall distance estimate  [length]
    """

    vfrac: jnp.ndarray
    afrac: Tuple[jnp.ndarray, ...]
    fluid: jnp.ndarray
    covered: jnp.ndarray
    regular: jnp.ndarray
    aeb_vol: jnp.ndarray
    d_eb: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.vfrac.ndim


# ---------------------------------------------------------------------------
# implicit functions (host-side numpy; x is a tuple of coordinate arrays)


def sphere_if(center, radius, fluid_inside: bool) -> Callable:
    c = np.asarray(center, dtype=np.float64)

    def psi(*x):
        r2 = sum((xi - c[d]) ** 2 for d, xi in enumerate(x[: len(c)]))
        s = radius * radius - r2  # > 0 inside the sphere
        return s if fluid_inside else -s

    return psi


def cylinder_if(center, radius, height, direction: int, fluid_inside: bool):
    """Axis-aligned cylinder (EB2::CylinderIF); height<0 = infinite."""
    c = np.asarray(center, dtype=np.float64)

    def psi(*x):
        r2 = sum(
            (xi - c[d]) ** 2 for d, xi in enumerate(x) if d != direction
        )
        s = radius * radius - r2
        if height > 0 and direction < len(x):
            ax = np.abs(x[direction] - c[direction]) - 0.5 * height
            s = np.minimum(s, -ax * np.maximum(np.abs(s), 1.0))  # crude cap
        return s if fluid_inside else -s

    return psi


def box_if(lo, hi, fluid_inside: bool):
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)

    def psi(*x):
        s = None
        for d, xi in enumerate(x):
            sd = np.minimum(xi - lo[d], hi[d] - xi)  # > 0 inside the box
            s = sd if s is None else np.minimum(s, sd)
        return s if fluid_inside else -s

    return psi


def plane_if(point, normal):
    """Half-space: fluid where (x-p)·n < 0 (EB2::PlaneIF body-normal)."""
    p = np.asarray(point, dtype=np.float64)
    n = np.asarray(normal, dtype=np.float64)

    def psi(*x):
        return -sum((xi - p[d]) * n[d] for d, xi in enumerate(x))

    return psi


def union_bodies(*psis):
    """Union of BODIES = intersection of fluids = min of fluid-positive IFs."""

    def psi(*x):
        out = psis[0](*x)
        for p in psis[1:]:
            out = np.minimum(out, p(*x))
        return out

    return psi


def intersect_bodies(*psis):
    """Intersection of BODIES = max of fluid-positive IFs."""

    def psi(*x):
        out = psis[0](*x)
        for p in psis[1:]:
            out = np.maximum(out, p(*x))
        return out

    return psi


# ---------------------------------------------------------------------------
# fraction evaluation


def _sample_fraction(psi, lo, hi, shape, ss: int) -> np.ndarray:
    """Fraction of each box of the grid with psi > 0, by ss^d supersampling."""
    dim = len(shape)
    axes = []
    for d in range(dim):
        n = shape[d]
        h = (hi[d] - lo[d]) / n if n > 0 else 0.0
        # ss midpoints per cell
        offs = (np.arange(ss) + 0.5) / ss
        pts = lo[d] + (np.arange(n)[:, None] + offs[None, :]) * h
        axes.append(pts.reshape(-1))
    grids = np.meshgrid(*axes, indexing="ij")
    vals = psi(*grids) > 0.0
    # average over the ss sub-samples of each cell
    newshape = []
    for d in range(dim):
        newshape.extend([shape[d], ss])
    v = vals.reshape(newshape)
    for d in reversed(range(dim)):
        v = v.mean(axis=2 * d + 1)
    return v.astype(np.float64)


def _face_fraction(psi, geom: Geometry, d: int, ss: int) -> np.ndarray:
    """Area fraction on the faces of dim d (sampled in the face plane)."""
    dim = geom.dim
    n = list(geom.ncell)
    nfaces = n[d] + 1
    # face-normal coordinates (exact plane positions)
    xd = geom.prob_lo[d] + np.arange(nfaces) * geom.dx[d]
    # transverse sampling
    axes = []
    for t in range(dim):
        if t == d:
            axes.append(xd)
            continue
        offs = (np.arange(ss) + 0.5) / ss
        pts = geom.prob_lo[t] + (np.arange(n[t])[:, None] + offs[None, :]) * geom.dx[t]
        axes.append(pts.reshape(-1))
    grids = np.meshgrid(*axes, indexing="ij")
    vals = psi(*grids) > 0.0
    newshape = []
    for t in range(dim):
        if t == d:
            newshape.append(nfaces)
        else:
            newshape.extend([n[t], ss])
    v = vals.reshape(newshape)
    # average transverse sub-samples (walk from the back so axis indices hold)
    ax = len(newshape) - 1
    for t in reversed(range(dim)):
        if t == d:
            ax -= 1
            continue
        v = v.mean(axis=ax)
        ax -= 2
    return v.astype(np.float64)


def build_eb_geometry(psi, geom: Geometry, ss: int = 8, dtype="float64") -> EBData:
    """Evaluate a fluid-positive implicit function into EBData arrays."""
    dim = geom.dim
    vfrac = _sample_fraction(psi, geom.prob_lo, geom.prob_hi, geom.ncell, ss)
    # snap nearly-full/empty cells (supersampling noise)
    vfrac[vfrac > 1.0 - 0.5 / ss**dim] = 1.0
    vfrac[vfrac < 0.5 / ss**dim] = 0.0
    afrac = []
    for d in range(dim):
        a = _face_fraction(psi, geom, d, ss)
        a[a > 1.0 - 0.5 / ss ** (dim - 1)] = 1.0
        a[a < 0.5 / ss ** (dim - 1)] = 0.0
        afrac.append(a)

    # faces of covered cells must be fully covered (consistency snap)
    cov = vfrac == 0.0
    for d in range(dim):
        lo_sl = tuple(slice(None) if t != d else slice(0, -1) for t in range(dim))
        hi_sl = tuple(slice(None) if t != d else slice(1, None) for t in range(dim))
        a = afrac[d]
        a[lo_sl] = np.where(cov, 0.0, a[lo_sl])
        a[hi_sl] = np.where(cov, 0.0, a[hi_sl])

    fluid = (vfrac > 0.0).astype(np.float64)
    covered = 1.0 - fluid
    regular = (vfrac == 1.0).astype(np.float64)
    for d in range(dim):
        lo_sl = tuple(slice(None) if t != d else slice(0, -1) for t in range(dim))
        hi_sl = tuple(slice(None) if t != d else slice(1, None) for t in range(dim))
        regular *= (afrac[d][lo_sl] == 1.0) * (afrac[d][hi_sl] == 1.0)

    # EB area from the divergence theorem over the cut cell:
    # A_eb n_d = (afrac_hi - afrac_lo) * (V/dx_d); aeb_vol = |A_eb|/V
    s2 = np.zeros_like(vfrac)
    for d in range(dim):
        lo_sl = tuple(slice(None) if t != d else slice(0, -1) for t in range(dim))
        hi_sl = tuple(slice(None) if t != d else slice(1, None) for t in range(dim))
        s2 += ((afrac[d][hi_sl] - afrac[d][lo_sl]) / geom.dx[d]) ** 2
    aeb_vol = np.sqrt(s2) * (vfrac > 0.0) * (vfrac < 1.0)

    # first-order wall distance: half a cell, shrunk in small cells
    hmin = min(geom.dx)
    d_eb = 0.5 * hmin * np.clip(vfrac, 0.25, 1.0)

    jd = jnp.dtype(dtype)
    return EBData(
        vfrac=jnp.asarray(vfrac, jd),
        afrac=tuple(jnp.asarray(a, jd) for a in afrac),
        fluid=jnp.asarray(fluid, jd),
        covered=jnp.asarray(covered, jd),
        regular=jnp.asarray(regular, jd),
        aeb_vol=jnp.asarray(aeb_vol, jd),
        d_eb=jnp.asarray(d_eb, jd),
    )


def eb_from_inputs(pp, geom: Geometry, dtype="float64", ss: int = 8):
    """Build EBData from the eb2.* inputs namespace (NS_init_eb2.cpp:75-381).

    Supported geom_types: all_regular (returns None), sphere, cylinder, box,
    plane. Returns None when no EB is configured.
    """
    psi = psi_from_inputs(pp, geom.dim)
    if psi is None:
        return None
    return build_eb_geometry(psi, geom, ss=ss, dtype=dtype)


def psi_from_inputs(pp, dim: int):
    """The fluid-positive implicit function of the eb2.* namespace (shared
    across AMR levels: each level evaluates the SAME psi on its own grid,
    the TPU analogue of EB2::Build per level)."""
    eb2 = pp.scoped("eb2")
    gt = eb2.query("geom_type")
    if gt is None or str(gt) == "all_regular":
        return None
    gt = str(gt)
    if gt == "sphere":
        center = [float(x) for x in eb2.queryarr("sphere_center", [0.0] * dim)]
        radius = float(eb2.query("sphere_radius", 0.1))
        inside = bool(int(eb2.query("sphere_has_fluid_inside", 1)))
        psi = sphere_if(center[:dim], radius, inside)
    elif gt == "cylinder":
        center = [float(x) for x in eb2.queryarr("cylinder_center", [0.0] * dim)]
        radius = float(eb2.query("cylinder_radius", 0.1))
        height = float(eb2.query("cylinder_height", -1.0))
        direction = int(eb2.query("cylinder_direction", dim - 1))
        inside = bool(int(eb2.query("cylinder_has_fluid_inside", 1)))
        psi = cylinder_if(center[:dim], radius, height, direction, inside)
    elif gt == "box":
        lo = [float(x) for x in eb2.queryarr("box_lo", [0.0] * dim)]
        hi = [float(x) for x in eb2.queryarr("box_hi", [1.0] * dim)]
        inside = bool(int(eb2.query("box_has_fluid_inside", 1)))
        psi = box_if(lo[:dim], hi[:dim], inside)
    elif gt == "plane":
        point = [float(x) for x in eb2.queryarr("plane_point", [0.0] * dim)]
        normal = [float(x) for x in eb2.queryarr("plane_normal", [1.0] + [0.0] * (dim - 1))]
        psi = plane_if(point[:dim], normal[:dim])
    else:
        raise NotImplementedError(
            f"eb2.geom_type = {gt} not implemented (supported: all_regular, "
            "sphere, cylinder, box, plane)"
        )
    return psi
