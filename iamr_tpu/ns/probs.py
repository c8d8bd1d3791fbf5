"""Problem initial conditions, dispatched on prob.probtype.

Reproduces the reference's IC catalog (Source/prob/prob_init.cpp:102-160):
  1  constant rho=1, U=0 (LidDrivenCavity via BCs)
  2  bubble (heavy/light blob in ambient)
  4  constant velocity + rho
  5  DoubleShearLayer
  7  Euler vortex tube
  10 RayleighTaylor
  11 TaylorGreen (prob_init.cpp:509-560)
All ICs evaluate analytic fields at cell centers on the dense level arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from iamr_tpu.ns.state import NSConfig, NSState


def init_state(cfg: NSConfig) -> NSState:
    geom = cfg.geom
    dim = geom.dim
    dtype = cfg.jdtype
    X = geom.cell_centers()  # list of dim arrays
    n = geom.ncell
    vel = np.zeros((dim,) + n)
    rho = np.ones(n)
    trac = np.zeros((cfg.ntrac,) + n)
    temp = np.ones(n)

    pt = cfg.probtype
    P = cfg.prob_param
    two_pi = 2.0 * np.pi

    if pt == 1:
        pass  # rest, rho = 1
    elif pt == 4:
        for d, nm in enumerate(["velocity_x", "velocity_y", "velocity_z"][:dim]):
            vel[d] = P(nm, 0.0)
        rho[...] = P("density_ic", 1.0)
        # tracer blob
        r2 = sum((X[d] - P(f"blob_{'xyz'[d]}", 0.0)) ** 2 for d in range(dim))
        trac[0] = np.where(np.sqrt(r2) < P("blob_radius", 0.1), 1.0, 0.0)
    elif pt == 3:
        # density-jump blob in a background flow (init_jump,
        # prob_init.cpp:283-340): sharp blob of density_ic at blob_center
        for d in range(dim):
            vel[d] = P(f"velocity_{'xyz'[d]}", 0.0)
        r2 = sum((X[d] - P(f"blob_{'xyz'[d]}", 0.0)) ** 2 for d in range(dim))
        inside = np.sqrt(r2) < P("blob_radius", 0.1)
        rho[...] = np.where(inside, P("density_ic", 2.0), 1.0)
        trac[0] = np.where(inside, 1.0, 0.0)
    elif pt in (2, 6):
        # falling/rising blob (reference init_bubble, prob_init.cpp:165-231);
        # velocity_ic background flow, density_ic the density factor
        for d in range(dim):
            vel[d] = P(f"velocity_{'xyz'[d]}", 0.0)
        r2 = sum((X[d] - P(f"blob_{'xyz'[d]}", 0.0)) ** 2 for d in range(dim))
        r = np.sqrt(r2)
        radius = P("blob_radius", 0.1)
        denfact = P("density_ic", 2.0)
        if pt == 6:
            # hot (less dense) rising bubble: reference prob_init.cpp:216-222
            w = P("interface_width", 1.0)
            rho[...] = 1.0 / denfact + 0.5 * (1.0 - 1.0 / denfact) * (
                1.0 + np.tanh(40.0 * (r - radius) / w)
            )
            temp[...] = 1.0 / rho
            trac[0] = np.where(r < radius, 1.0, 0.0)
        else:
            inside = 0.5 * (
                1.0 - np.tanh(30.0 * (r - radius) / P("interface_width", 1.0))
            )
            rho[...] = 1.0 + (denfact - 1.0) * inside
            trac[0] = np.where(r < radius, 1.0, 0.0)
    elif pt == 5:
        # double shear layer (periodic): probtype 5, direction from prob
        rho[...] = P("density_ic", 1.0)
        direction = int(P("direction", 0))
        delta = P("interface_width", 0.05)
        pert = P("pertamp", 0.05)
        if direction == 0:
            y = X[1]
            vel[0] = np.tanh(30.0 * (0.25 - np.abs(y - 0.5)))
            vel[1] = pert * np.sin(two_pi * X[0])
        else:
            x = X[0]
            vel[1] = np.tanh(30.0 * (0.25 - np.abs(x - 0.5)))
            vel[0] = pert * np.sin(two_pi * X[1])
        trac[0] = 0.5 * (1.0 + np.tanh(30.0 * (0.25 - np.abs(X[1] - 0.5))))
    elif pt == 7:
        # Euler vortex tube: triply periodic swirl (velocity_factor a,b,c)
        vf = P("velocity_factor", 1.0)
        a, b = P("a", 1.0), P("b", 1.0)
        x, y = X[0], X[1]
        z = X[2] if dim == 3 else 0.0
        vel[0] = vf * np.sin(two_pi * a * x) * np.cos(two_pi * b * y)
        vel[1] = -vf * np.cos(two_pi * a * x) * np.sin(two_pi * b * y)
        trac[0] = 0.5 * (1.0 + np.cos(two_pi * x))
    elif pt == 8:
        # convected isentropic vortex (init_ConvectedVortex): Gaussian
        # vortex at (xvort, yvort), radius rvort, strength forcevort,
        # superposed on a mean flow along meanFlowDir (+-1 x, +-2 y, +-3 both)
        a = P("xvort", 0.5)
        b = P("yvort", 0.5)
        c = P("rvort", 0.07)
        fv = P("forcevort", 6.0)
        mdir = int(P("meanFlowDir", 1))
        mmag = P("meanFlowMag", 0.0)
        dxv = X[0] - a
        dyv = X[1] - b
        d2 = dxv * dxv + dyv * dyv
        r2 = c * c
        u_v = -fv * dyv / r2 * np.exp(-d2 / r2 / 2.0)
        v_v = fv * dxv / r2 * np.exp(-d2 / r2 / 2.0)
        sgn = -1.0 if mdir < 0 else 1.0
        vel[0] = u_v + (sgn * mmag if abs(mdir) in (1, 3) else 0.0)
        vel[1] = v_v + (sgn * mmag if abs(mdir) in (2, 3) else 0.0)
        rho[...] = P("density_ic", 1.0)
        trac[0] = np.exp(-d2 / r2 / 2.0)
    elif pt == 10:
        # Rayleigh-Taylor: heavy over light with perturbed interface
        rho_1 = P("rho_1", 1.0)
        rho_2 = P("rho_2", 2.0)
        tra_1 = P("tra_1", 0.0)
        tra_2 = P("tra_2", 1.0)
        pertamp = P("perturbation_amplitude", 1.0)
        ymid = 0.5 * (geom.prob_hi[dim - 1] + geom.prob_lo[dim - 1])
        Lx = geom.prob_hi[0] - geom.prob_lo[0]
        if dim == 2:
            # pertheight = ymid + pertamp cos(2 pi x / Lx); absolute
            # interface_width (reference init_RayleighTaylor)
            pert = pertamp * np.cos(two_pi * X[0] / Lx)
        else:
            Lz = geom.prob_hi[1] - geom.prob_lo[1]
            pert = (
                pertamp * np.cos(two_pi * X[0] / Lx) * np.cos(two_pi * X[1] / Lz)
            )
        yy = X[dim - 1]
        width = P("interface_width", 0.01)
        frac = 0.5 * (1.0 + np.tanh((yy - (ymid + pert)) / width))
        rho[...] = rho_1 + (rho_2 - rho_1) * frac
        trac[0] = tra_1 + (tra_2 - tra_1) * frac
    elif pt == 11:
        # Taylor-Green vortex (reference prob_init.cpp:509-560)
        vf = P("velocity_factor", 1.0)
        a, b, c = P("a", 1.0), P("b", 1.0), P("c", 1.0)
        x, y = X[0], X[1]
        z = X[2] if dim == 3 else 0.0
        cz = np.cos(c * two_pi * z) if dim == 3 else 1.0
        vel[0] = vf * np.sin(a * two_pi * x) * np.cos(b * two_pi * y) * cz
        vel[1] = -vf * np.cos(a * two_pi * x) * np.sin(b * two_pi * y) * cz
        rho[...] = P("density", 1.0)
        # tracer carries the analytic pressure perturbation (reference does)
        if dim == 2:
            trac[0] = (rho * vf * vf / 4.0) * (
                np.cos(2 * a * two_pi * x) + np.cos(2 * b * two_pi * y)
            )
        else:
            trac[0] = (rho * vf * vf / 16.0) * (2.0 + np.cos(2 * c * two_pi * z)) * (
                np.cos(2 * a * two_pi * x) + np.cos(2 * b * two_pi * y)
            )
    elif pt == 100:
        # HIT (Tutorials/HIT/prob_init.cpp:43-86): prob.ic_file loads a
        # gen_hit_ic.py spectral IC via the Utilities read_csv loader;
        # otherwise a solenoidal random field with a k^4 exp spectrum
        ic_file = dict(cfg.prob).get("ic_file")
        if ic_file and isinstance(ic_file, str):
            from iamr_tpu.utils.fileio import hit_velocity_from_file

            vel[...] = hit_velocity_from_file(
                ic_file, int(P("ic_n", geom.ncell[0])), geom,
                urms_target=P("urms", 0.0) or None,
            )
        else:
            from iamr_tpu.ns.forcing_hit import init_hit_velocity

            vel[...] = init_hit_velocity(
                geom,
                urms=P("urms", 1.0),
                kpeak=P("kpeak", 4.0),
                seed=int(P("seed", 0)),
            )
        rho[...] = P("density", 1.0)
    else:
        from iamr_tpu.plugins import PROBLEM_ICS

        if pt not in PROBLEM_ICS:
            raise ValueError(f"unknown probtype {pt}")
        # user-problem seam (the prob_init.cpp override pattern,
        # SURVEY.md 2.2b; register via iamr_tpu.plugins.problem_ic)
        fields = {"vel": vel, "rho": rho, "trac": trac, "temp": temp}
        out = PROBLEM_ICS[pt](cfg, X, fields)
        if out:
            fields.update(out)
        vel, rho, trac, temp = (
            fields["vel"], fields["rho"], fields["trac"], fields["temp"]
        )

    if cfg.velocity_plotfile:
        # BL_USE_VELOCITY: ADD scale * plotfile velocity to the IC
        # (Saxpy onto S_new, NavierStokes.cpp:356-422); assumes the
        # plotfile's level-0 grid matches this problem's, like the
        # reference does
        from iamr_tpu.io.plotfile import read_plotfile

        fields_pf, _t = read_plotfile(cfg.velocity_plotfile)
        names = list(fields_pf.keys())
        xname = cfg.velocity_plotfile_xvel_name
        if xname not in names:
            raise ValueError(
                f"Could not find velocity fields in supplied "
                f"velocity_plotfile (looked for {xname!r})"
            )
        # look each component up BY NAME (x_velocity/y_velocity/z_velocity,
        # or whatever prefix scheme the configured xvel name uses) rather
        # than assuming they are stored contiguously after x_velocity
        # x-prefixed names substitute y/z; u-prefixed names follow the
        # u/v/w convention (u_vel -> v_vel, w_vel), matching case
        comp_names = [xname]
        sibling = {"x": "yz", "X": "YZ", "u": "vw", "U": "VW"}
        for i in range(dim - 1):
            if xname[:1] in sibling:
                comp_names.append(sibling[xname[:1]][i] + xname[1:])
            else:
                comp_names.append(xname + "yz"[i])
        missing = [nm for nm in comp_names if nm not in names]
        if missing:
            raise ValueError(
                f"velocity_plotfile is missing components {missing} "
                f"(has {names})"
            )
        for d in range(dim):
            v = np.asarray(fields_pf[comp_names[d]])
            if v.shape != vel[d].shape:
                raise ValueError(
                    f"velocity_plotfile grid {v.shape} != problem grid "
                    f"{vel[d].shape}"
                )
            vel[d] = vel[d] + cfg.velocity_plotfile_scale * v

    zero = jnp.zeros((), dtype=dtype)
    return NSState(
        vel=jnp.asarray(vel, dtype=dtype),
        rho=jnp.asarray(rho, dtype=dtype),
        trac=jnp.asarray(trac, dtype=dtype),
        temp=jnp.asarray(temp, dtype=dtype),
        p=jnp.zeros(tuple(x + 1 for x in n), dtype=dtype),
        gradp=jnp.zeros((dim,) + n, dtype=dtype),
        time=zero,
        dt=zero,
    )
