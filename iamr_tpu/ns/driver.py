"""Simulation driver: init -> initial projection -> pressure iterations ->
step loop (the Amr::coarseTimeStep + NavierStokes post_init equivalents,
single level).

Reference call stack being reproduced (SURVEY.md section 3.1):
  main (main.cpp:26) -> Amr::init -> initData (prob ICs) -> post_init:
    initialVelocityProject (Projection.cpp:615, init_vel_iter times)
    post_init_press: init_iter x { advance; take p, Gp; reset state }
      (NavierStokes.cpp:1305-1432)
  then coarseTimeStep loop with computeNewDt, optional steady-state stop
  (NavierStokesBase::steadyState, cpp:2212-2300).
"""

from __future__ import annotations

import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.advance import advance, est_time_step, make_hit_forcing, make_step
from iamr_tpu.ns.probs import init_state
from iamr_tpu.ns.state import NSConfig, NSState, config_from_inputs
from iamr_tpu.solvers.nodal_proj import initial_velocity_project


def initialize(
    cfg: NSConfig, fixed_mg_cycles=None, eb=None, init_iters=None
) -> NSState:
    """Build the initial state: ICs, initial projection, dt estimate,
    and the initial pressure iterations — one jitted program.

    init_iters overrides cfg.init_iter (multilevel runs pass 0 here and do
    the COMPOSITE initial iterations instead, post_init_press_two_level)."""
    n_init_iter = cfg.init_iter if init_iters is None else init_iters
    state = init_state(cfg)
    rz = None
    if cfg.geom.coord_sys == 1:
        import jax.numpy as _jnp

        rc, rf = cfg.geom.rz_radii()
        rz = (_jnp.asarray(rc, cfg.jdtype), _jnp.asarray(rf, cfg.jdtype))
    if eb is not None:
        # covered cells carry the body state from step 0 (set_body_state
        # semantics, NSB_K.H; InitialRedistribution is subsumed by the
        # first step's flux redistribution)
        state = state._replace(vel=state.vel * eb.fluid)
    hit = make_hit_forcing(cfg)

    @jax.jit
    def _init(state):
        # dsdt starts at zero for temperature runs (Dsdt_Type initialized
        # zero); a stable pytree schema avoids a second jit trace when the
        # first step starts producing it
        if cfg.do_temp and cfg.temp_cond_coef > 0.0 and state.dsdt is None:
            state = state._replace(dsdt=jnp.zeros_like(state.rho))
        if cfg.do_init_proj and cfg.init_vel_iter > 0:
            # reference default: UNITY sigma unless proj.rho_wgt_vel_proj
            # (Projection.cpp:24,639); iterated init_vel_iter times — each
            # pass of the approximate projection shrinks the residual
            # divergence (Projection.cpp:639-700)
            sig = state.rho if cfg.rho_wgt_vel_proj else jnp.ones_like(
                state.rho
            )
            vel_proj = state.vel
            for _ in range(cfg.init_vel_iter):
                vel_proj, _ = initial_velocity_project(
                    vel_proj, sig, cfg.dom, cfg.geom.dx,
                    rtol=cfg.proj_tol, atol=cfg.proj_abs_tol,
                    fixed_cycles=fixed_mg_cycles, eb=eb, rz=rz,
                )
            state = state._replace(vel=vel_proj)

        # hydrostatic initial pressure for gravity runs
        # (initialPressureProject; post_init_state NavierStokesBase.cpp:2418)
        if abs(cfg.gravity) > 1e-4 and rz is None:
            from iamr_tpu.solvers.nodal_proj import initial_pressure_project

            p0, gp0 = initial_pressure_project(
                state.rho, cfg.gravity, cfg.dom, cfg.geom.dx, geom=cfg.geom,
                rtol=cfg.proj_tol, atol=cfg.proj_abs_tol,
                fixed_cycles=fixed_mg_cycles, eb=eb,
            )
            state = state._replace(p=p0, gradp=gp0)

        # first dt (init_shrink * cfl estimate, or init_dt override)
        if cfg.init_dt > 0.0:
            dt0 = jnp.asarray(cfg.init_dt, dtype=cfg.jdtype)
        else:
            dt0 = cfg.init_shrink * est_time_step(cfg, state)
        state = state._replace(dt=dt0)

        # initial pressure iterations: advance from the same IC, keep p/Gp
        # (post_init_press, NavierStokes.cpp:1305-1432)
        for _ in range(max(0, n_init_iter)):
            trial = advance(state, cfg, fixed_mg_cycles, hit=hit, eb=eb)
            state = state._replace(p=trial.p, gradp=trial.gradp)
        return state

    return _init(state)


def steady_norm(prev: NSState, new: NSState):
    """max over CELLS of | ||U^{n+1}||_2 - ||U^n||_2 | — the pointwise
    velocity-magnitude change (NavierStokesBase::steadyState,
    NavierStokesBase.cpp:2230-2283). The per-cell form matters: comparing
    only the global max|u_d| can report "steady" while the rest of the
    field is still converging (e.g. parabolic-profile tails)."""
    mag_new = jnp.sqrt(jnp.sum(new.vel * new.vel, axis=0))
    mag_old = jnp.sqrt(jnp.sum(prev.vel * prev.vel, axis=0))
    return jnp.max(jnp.abs(mag_new - mag_old))


def _plot_fields(cfg: NSConfig, state: NSState, extra=None, derives=None):
    import numpy as np

    from iamr_tpu.ns.derive import avg_pressure, kinetic_energy, mag_vort

    fields = {}
    if extra:
        fields.update({k: np.asarray(v) for k, v in extra.items()})
    for d in range(cfg.dim):
        fields[f"{'xyz'[d]}_velocity"] = np.asarray(state.vel[d])
    fields["density"] = np.asarray(state.rho)
    for t in range(state.trac.shape[0]):
        fields["tracer" if t == 0 else f"tracer{t+1}"] = np.asarray(state.trac[t])
    if cfg.do_temp:
        fields["temp"] = np.asarray(state.temp)
    fields["avg_pressure"] = np.asarray(avg_pressure(state))
    fields["mag_vort"] = np.asarray(mag_vort(cfg, state))
    fields["energy"] = np.asarray(kinetic_energy(state))
    # amr.derive_plot_vars: extra derives by name, incl. plugin-registered
    # ones (RunningProblems.rst:114; derive_lst in NS_setup.cpp)
    if derives:
        from iamr_tpu.ns.derive import derive as _derive

        for name in derives:
            if name not in fields:
                fields[name] = np.asarray(_derive(cfg, state, name))
    return fields


def write_plotfile_for_state(
    cfg: NSConfig, state: NSState, path: str, step: int, extra=None,
    derives=None,
):
    """State + derived fields in AMReX plotfile format (writePlotFile
    equivalent; amr.derive_plot_vars). extra: additional name->array fields
    (e.g. the velocity time-average/RMS of NS_average)."""
    from iamr_tpu.io.plotfile import write_plotfile

    write_plotfile(
        path, cfg.geom, _plot_fields(cfg, state, extra, derives=derives),
        time=float(state.time), level_steps=step,
    )


def write_plotfile_for_hierarchy(cfg: NSConfig, spec, ml, path: str, step: int):
    """Two-level AMR plotfile (Level_0 + Level_1)."""
    from iamr_tpu.amr.multilevel import make_fine_config
    from iamr_tpu.io.plotfile import write_plotfile

    cfg_f = make_fine_config(cfg, spec)
    f0 = _plot_fields(cfg, ml.crse)
    f1 = _plot_fields(cfg_f, ml.fine)
    write_plotfile(
        path, cfg.geom, f0, time=float(ml.crse.time), level_steps=step,
        fine_levels=[(f1, spec.lo, spec.ratio)],
    )


def write_job_info(cfg: NSConfig, path: str, pp=None):
    """job_info provenance file (NavierStokes.cpp:1107-1194)."""
    import os
    import subprocess

    os.makedirs(path, exist_ok=True)
    lines = ["==== iamr_tpu job_info ====", ""]
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ).stdout.strip()
    except Exception:
        rev = "unknown"
    lines.append(f"iamr_tpu git hash: {rev}")
    import jax

    lines.append(f"jax version: {jax.__version__}")
    lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    lines.append("")
    lines.append("==== inputs ====")
    if pp is not None:
        lines.append(pp.dump())
    with open(os.path.join(path, "job_info"), "w") as f:
        f.write("\n".join(lines) + "\n")


class IOHooks:
    """Plot/checkpoint/diagnostics cadence (amr.plot_int / amr.check_int /
    ns.sum_interval) driven from the inputs table."""

    def __init__(self, cfg: NSConfig, pp=None):
        self.cfg = cfg
        self.pp = pp
        amr = pp.scoped("amr") if pp is not None else None
        ns = pp.scoped("ns") if pp is not None else None
        self.plot_int = int(amr.query("plot_int", -1)) if amr else -1
        self.plot_file = str(amr.query("plot_file", "plt")) if amr else "plt"
        self.derive_plot_vars = tuple(
            str(v) for v in (amr.queryarr("derive_plot_vars", []) if amr
                             else [])
            if str(v).upper() != "NONE"
        )
        self.check_int = int(amr.query("check_int", -1)) if amr else -1
        self.check_file = str(amr.query("check_file", "chk")) if amr else "chk"
        # amr.checkpoint_format = npz (compact, default) | amrex (the
        # reference's chk directory layout, restartable by either code;
        # io/amrex_chk.py). Restart AUTO-DETECTS the format either way.
        self.checkpoint_format = (
            str(amr.query("checkpoint_format", "npz")) if amr else "npz"
        )
        self.sum_interval = int(ns.query("sum_interval", -1)) if ns else -1
        # run log: one "STEP= n TIME= t DT= dt" line per step
        # (amr.run_log / amr.run_log_terse, Docs RunningProblems.rst:300-330)
        self.run_log = str(amr.query("run_log", "")) if amr else ""
        self.run_log_terse = str(amr.query("run_log_terse", "")) if amr else ""
        # on-the-fly velocity time average + RMS every ns.avg_interval steps
        # (NS_average.cpp:20-70; Average_Type state)
        self.avg_interval = int(ns.query("avg_interval", 0)) if ns else 0
        self._avg = None  # (sum of 0.5(u^n+u^{n+1})dt, sum of u^2 dt, total t)
        self._prev_vel = None
        # plane slice dumper (NavierStokesBase.cpp:2596-2628): cell index of
        # the x-y plane to dump each step
        self.dump_plane = int(ns.query("dump_plane", -1)) if ns else -1
        self.dump_plane_name = (
            str(ns.query("dump_plane_name", "SLABS/vel-")) if ns else "SLABS/vel-"
        )
        # set by the run loop each step when tracer particles are active;
        # plotfiles then carry the particle_count derive
        # (particles_in_plotfile analogue, NavierStokesBase.cpp:3956-4055)
        self.particles = None

    def time_average(self):
        """(velocity_average, velocity_RMS, averaging time) or None."""
        if self._avg is None or self._avg[2] <= 0.0:
            return None
        import numpy as np

        s1, s2, t = self._avg
        avg = s1 / t
        rms = np.sqrt(np.maximum(s2 / t - avg * avg, 0.0))
        return avg, rms, t

    def __call__(self, step: int, state: NSState):
        from iamr_tpu.io.checkpoint import save_checkpoint
        from iamr_tpu.ns.derive import sum_integrated_quantities

        import numpy as np

        if self.avg_interval > 0:
            v = np.asarray(state.vel)
            dt = float(state.dt)
            if self._avg is None:
                self._avg = (np.zeros_like(v), np.zeros_like(v), 0.0)
                self._prev_vel = v
            if step % self.avg_interval == 0:
                s1, s2, t = self._avg
                vm = 0.5 * (self._prev_vel + v)
                self._avg = (s1 + vm * dt, s2 + vm * vm * dt, t + dt)
            self._prev_vel = v
        if self.plot_int > 0 and step % self.plot_int == 0:
            path = f"{self.plot_file}{step:05d}"
            extra = {}
            if self.particles is not None:
                from iamr_tpu.ns.particles import particle_count

                extra["particle_count"] = np.asarray(
                    particle_count(self.particles, self.cfg.geom)
                )
            avg = self.time_average()
            if avg is not None:
                for d in range(self.cfg.dim):
                    extra[f"{'xyz'[d]}_vel_average"] = avg[0][d]
                    extra[f"{'xyz'[d]}_vel_rms"] = avg[1][d]
            write_plotfile_for_state(
                self.cfg, state, path, step, extra=extra,
                derives=self.derive_plot_vars,
            )
            write_job_info(self.cfg, path, self.pp)
        if self.check_int > 0 and step % self.check_int == 0:
            if self.checkpoint_format == "amrex":
                from iamr_tpu.io.amrex_chk import write_checkpoint_amrex

                write_checkpoint_amrex(
                    f"{self.check_file}{step:05d}", [state], [], self.cfg,
                    step,
                )
            else:
                save_checkpoint(f"{self.check_file}{step:05d}", state, step)
            if self.particles is not None:
                from iamr_tpu.io.checkpoint import save_particles

                save_particles(f"{self.check_file}{step:05d}", self.particles)
            if self._avg is not None:
                np.savez(
                    f"{self.check_file}{step:05d}/TimeAverage.npz",
                    sum1=self._avg[0], sum2=self._avg[1], time=self._avg[2],
                )
        if self.sum_interval > 0 and step % self.sum_interval == 0:
            q = sum_integrated_quantities(self.cfg, state)
            print(
                f"TIME= {float(state.time):.8g} MASS= {q['mass']:.12g} "
                f"TRAC= {q.get('tracer0', 0.0):.12g} "
                f"KENG= {q['kinetic_energy']:.12g}"
            )
        if self.run_log:
            with open(self.run_log, "a") as f:
                f.write(
                    f"STEP = {step} TIME = {float(state.time):.10g} "
                    f"DT = {float(state.dt):.10g}\n"
                )
        if self.run_log_terse:
            with open(self.run_log_terse, "a") as f:
                f.write(f"{step} {float(state.time):.10g} {float(state.dt):.10g}\n")
        if self.dump_plane >= 0:
            import os

            os.makedirs(
                os.path.dirname(self.dump_plane_name) or ".", exist_ok=True
            )
            k = min(self.dump_plane, state.vel.shape[-1] - 1)
            sl = np.asarray(state.vel[..., k], dtype=np.float64)
            sl.tofile(f"{self.dump_plane_name}{step:05d}.bin")


def run(
    cfg: NSConfig,
    state: Optional[NSState] = None,
    max_steps: Optional[int] = None,
    callback: Optional[Callable[[int, NSState], None]] = None,
    verbose: bool = False,
    fixed_mg_cycles=None,
    eb=None,
    particles=None,
    particle_hooks=None,
    particle_out=None,
    step0: int = 0,
) -> NSState:
    """Advance until max_step / stop_time / steady state.

    particles: optional Particles pytree — advected with each step's MAC
    velocities (AdvectWithUmac in advance, NavierStokes.cpp:672-677) and
    passed to particle_hooks(step, state, parts) after each step."""
    if state is None:
        state = initialize(cfg, fixed_mg_cycles, eb=eb)
    # exact spectral solvers for all-periodic uniform-rho runs (ns.fft_solve)
    from iamr_tpu.solvers.spectral import spectral_eligible

    sp = eb is None and spectral_eligible(cfg, state.rho)
    if particles is not None:
        from iamr_tpu.ns.advance import make_step_with_particles

        pstep_fn = make_step_with_particles(cfg, fixed_mg_cycles, spectral=sp)
    if cfg.debug and particles is None:
        # ns.debug: per-step self-checks need the step's MAC velocities
        # (ns/checks.py — check_div_cond / test_umac_periodic / NaN+Bogus
        # scans, reference MacProj.cpp:792-846,977-1080)
        _hit = make_hit_forcing(cfg)
        step_fn = jax.jit(
            lambda s: advance(
                s, cfg, fixed_mg_cycles, hit=_hit, eb=eb, spectral=sp,
                return_umac=True,
            )
        )
    else:
        step_fn = make_step(cfg, fixed_mg_cycles, eb=eb, spectral=sp)

    nmax = max_steps if max_steps is not None else (
        cfg.max_step if cfg.max_step >= 0 else 10**9
    )
    step = step0  # restarts resume the checkpoint's step count
    while step < nmax:
        if cfg.stop_time >= 0.0 and float(state.time) >= cfg.stop_time:
            break
        # clip dt to hit stop_time exactly
        if cfg.stop_time >= 0.0:
            dt = jnp.minimum(state.dt, cfg.stop_time - state.time)
            state = state._replace(dt=dt)
        prev = state
        if particles is not None:
            state, particles = pstep_fn(state, particles)
        elif cfg.debug:
            state, umac_dbg = step_fn(state)
            from iamr_tpu.ns.checks import run_debug_checks

            run_debug_checks(cfg, state, umac_dbg, eb=eb, step=step + 1)
        else:
            state = step_fn(state)
        step += 1
        if particles is not None and particle_hooks is not None:
            particle_hooks(step, state, particles)
        if particles is not None and callback is not None and hasattr(
            callback, "particles"
        ):
            callback.particles = particles
        if verbose:
            print(
                f"STEP {step} time {float(state.time):.6g} dt {float(state.dt):.6g} "
                f"max|u| {float(jnp.max(jnp.abs(state.vel))):.6g}"
            )
        if callback is not None:
            callback(step, state)
        if cfg.stop_when_steady:
            if float(steady_norm(prev, state)) < cfg.steady_tol:
                if verbose:
                    print(f"steady state reached at step {step}")
                break
        # okToContinue: stop when dt collapses below ns.dt_cutoff
        # (NavierStokesBase.cpp:2217)
        if cfg.dt_cutoff > 0.0 and float(state.dt) <= cfg.dt_cutoff:
            raise RuntimeError(
                f"dt {float(state.dt):.3e} fell below ns.dt_cutoff "
                f"{cfg.dt_cutoff:.3e} at step {step}"
            )
    if particles is not None and particle_out:
        from iamr_tpu.ns.particles import write_ascii_particles

        write_ascii_particles(str(particle_out), particles)
    return state


def default_fine_spec(cfg: NSConfig):
    """LevelSpec from amr.fixed_fine_patch (lo..., size...), or the centered
    half-domain patch when max_level>=1 without an explicit patch."""
    from iamr_tpu.amr.hierarchy import LevelSpec

    dim = cfg.dim
    r = cfg.ref_ratio
    if cfg.fine_patch and len(cfg.fine_patch) == 2 * dim:
        lo = cfg.fine_patch[:dim]
        size = cfg.fine_patch[dim:]
        return LevelSpec(lo=tuple(lo), ncell=tuple(size), ratio=r)
    # default: refine the central half of the domain
    n = cfg.geom.ncell
    return LevelSpec(
        lo=tuple(r * (x // 4) for x in n),
        ncell=tuple(r * (x // 2) for x in n),
        ratio=r,
    )


def run_multipatch(
    cfg: NSConfig,
    max_steps: Optional[int] = None,
    verbose: bool = False,
    fixed_mg_cycles=None,
    error_tags=None,
    regrid_int: int = 0,
    plot_int: int = -1,
    plot_file: str = "plt",
    fixed_specs=None,
):
    """Two-level run with a MULTI-BOX fine level: Berger-Rigoutsos
    clustering of error tags -> several fine patches, re-clustered every
    regrid_int steps (regrid-as-recompile over the box-set signature).
    fixed_specs pins the box set (multi-box amr.regrid_file level)."""
    import numpy as np

    from iamr_tpu.amr.multilevel import init_fine_from_coarse, make_hit_forcing
    from iamr_tpu.amr.multipatch import (
        advance_two_level_multipatch,
        regrid_multipatch,
    )
    from iamr_tpu.amr.tagging import cluster_to_patches, tag_cells

    crse = initialize(cfg, fixed_mg_cycles)

    def specs_from_tags(crse_state):
        if fixed_specs is not None:
            return tuple(fixed_specs)
        tags = np.asarray(tag_cells(cfg, crse_state, error_tags))
        specs = cluster_to_patches(tags, cfg.ref_ratio)
        return tuple(specs) if specs else (default_fine_spec(cfg),)

    specs = specs_from_tags(crse)
    fines = tuple(init_fine_from_coarse(cfg, sp, crse) for sp in specs)
    hit = make_hit_forcing(cfg)
    step_cache = {}

    def get_step(ss):
        if ss not in step_cache:
            step_cache[ss] = jax.jit(
                lambda c, f: advance_two_level_multipatch(
                    c, f, cfg, ss, fixed_mg_cycles, hit=hit
                )
            )
        return step_cache[ss]

    nmax = max_steps if max_steps is not None else (
        cfg.max_step if cfg.max_step >= 0 else 10**9
    )
    step = 0
    while step < nmax:
        if cfg.stop_time >= 0.0 and float(crse.time) >= cfg.stop_time:
            break
        if regrid_int > 0 and step > 0 and step % regrid_int == 0:
            new_specs = specs_from_tags(crse)
            if new_specs != specs:
                fines = regrid_multipatch(cfg, specs, fines, new_specs, crse)
                specs = new_specs
                if verbose:
                    print(
                        f"REGRID at step {step}: "
                        f"{[(s.lo, s.ncell) for s in specs]}"
                    )
        crse, fines = get_step(specs)(crse, fines)
        step += 1
        if plot_int > 0 and step % plot_int == 0:
            from iamr_tpu.io.plotfile import write_plotfile

            f0 = _plot_fields(cfg, crse)
            from iamr_tpu.amr.multilevel import make_fine_config

            grids = [
                (_plot_fields(make_fine_config(cfg, sp), f), sp.lo)
                for sp, f in zip(specs, fines)
            ]
            write_plotfile(
                f"{plot_file}{step:05d}", cfg.geom, f0,
                time=float(crse.time), level_steps=step,
                fine_levels=[(grids, cfg.ref_ratio)],
            )
        if verbose:
            print(
                f"STEP {step} time {float(crse.time):.6g} "
                f"dt {float(crse.dt):.6g} boxes {len(specs)}"
            )
    return crse, fines, specs


def run_multilevel(
    cfg: NSConfig,
    max_steps: Optional[int] = None,
    verbose: bool = False,
    fixed_mg_cycles=None,
    subcycle: bool = False,
    error_tags=None,
    regrid_int: int = 0,
    plot_int: int = -1,
    plot_file: str = "plt",
    fixed_spec=None,
    particles=None,
    particle_hooks=None,
    check_int: int = -1,
    check_file: str = "chk",
    restart=None,
    eb_psi=None,
    particle_out=None,
):
    """Two-level run (max_level = 1), optionally subcycled + dynamically
    regridded. Regrids happen out-of-band between jitted step segments:
    tag -> cluster to a patch -> transfer state -> recompile for the new
    shapes (SURVEY.md regrid-as-recompile). fixed_spec pins the fine patch
    (amr.regrid_file); tracer particles advect with the composite
    finest-containing-level MAC velocities. eb_psi: fluid-positive
    implicit function — each level builds its own cut-cell geometry from
    it (per-level EB2 build, NS_init_eb2), rebuilt on regrid."""
    import numpy as np

    from iamr_tpu.amr.multilevel import (
        MLState,
        init_fine_from_coarse,
        make_two_level_step,
        make_two_level_step_with_particles,
        post_init_press_two_level,
    )
    from iamr_tpu.amr.tagging import cluster_to_patch, regrid_fine_state, tag_cells

    eb0 = None
    if eb_psi is not None:
        from iamr_tpu.eb.geom import build_eb_geometry

        eb0 = build_eb_geometry(eb_psi, cfg.geom, dtype=cfg.dtype)

    def fine_eb(s):
        if eb_psi is None:
            return None
        from iamr_tpu.amr.multilevel import make_fine_config
        from iamr_tpu.eb.geom import build_eb_geometry

        return build_eb_geometry(
            eb_psi, make_fine_config(cfg, s).geom, dtype=cfg.dtype
        )

    step0 = 0
    if restart is not None:
        # restart from a multilevel checkpoint (Amr::restart)
        from iamr_tpu.io.checkpoint import load_checkpoint_ml

        states_r, specs_r, step0 = load_checkpoint_ml(str(restart), cfg)
        crse = states_r[0]
        if specs_r and (fixed_spec is not None or not error_tags):
            # pin the restored patch only for fixed-grid runs; dynamic
            # (error_tags) runs re-tag at their regrid cadence like the
            # reference's restart (amr.regrid_on_restart semantics)
            fixed_spec = specs_r[0]
        restart_spec = specs_r[0] if specs_r else None
        from iamr_tpu.io.checkpoint import load_boxlists

        bl_r = load_boxlists(str(restart))
        restart_boxlist = (
            tuple(bl_r[0]) if bl_r is not None and bl_r[0] else None
        )
        if particles is not None:
            from iamr_tpu.io.checkpoint import load_particles

            p_r = load_particles(str(restart), dtype=cfg.dtype)
            if p_r is not None:
                particles = p_r
    else:
        # composite initial pressure iterations happen below across BOTH
        # levels (post_init_press + initialSyncProject), not here (EB runs
        # keep single-level initial iterations: the composite trial step
        # has no EB coupling in its non-subcycled form)
        crse = initialize(
            cfg, fixed_mg_cycles,
            init_iters=(None if eb0 is not None else 0), eb=eb0,
        )

    def spec_from_tags(crse_state, default_ok=True):
        """(bbox spec, true box list | None) from the coarse tags. Dynamic
        regrid clusters with native Berger-Rigoutsos into possibly-many
        boxes (the reference's BoxArray regrid, Docs/Software.rst:356-401);
        a multi-box result advances as a UNION level. EB and non-subcycled
        runs keep the single bbox patch (union advance is wired for the
        subcycled non-EB path)."""
        if fixed_spec is not None:
            return fixed_spec, None
        tags = None
        if error_tags:
            tags = np.asarray(tag_cells(cfg, crse_state, error_tags))
        if eb0 is not None and cfg.refine_cutcells:
            # tag every cut cell (reference default refine_cutcells=true,
            # NavierStokesBase::errorEst EB branch)
            vf = np.asarray(eb0.vfrac)
            cut = (vf > 0.0) & (vf < 1.0)
            tags = cut if tags is None else (tags | cut)
        if tags is not None:
            from iamr_tpu.amr.hierarchy import LevelSpec
            from iamr_tpu.amr.tagging import (
                apply_outflow_tag_policy,
                cluster_to_patches,
            )

            tags = apply_outflow_tag_policy(
                cfg, tags, do_refine=cfg.do_refine_outflow,
                do_derefine=cfg.do_derefine_outflow, nbuf=cfg.nbuf_outflow,
            )
            boxes = cluster_to_patches(tags, cfg.ref_ratio)
            if len(boxes) > 1 and eb0 is None and subcycle:
                r = cfg.ref_ratio
                lo = tuple(
                    min(b.lo[d] for b in boxes) for d in range(cfg.dim)
                )
                hi = tuple(
                    max(b.lo[d] + b.ncell[d] for b in boxes)
                    for d in range(cfg.dim)
                )
                bbox = LevelSpec(
                    lo=lo, ncell=tuple(h - l for l, h in zip(lo, hi)),
                    ratio=r,
                )
                return bbox, tuple(boxes)
            s = (boxes[0] if len(boxes) == 1
                 else cluster_to_patch(tags, cfg.ref_ratio))
            if s is not None:
                return s, None
        return (default_fine_spec(cfg) if default_ok else None), None

    spec, boxlist = spec_from_tags(crse)
    if restart is not None and len(states_r) > 1:
        # resume on the checkpointed grids (spec_from_tags would re-derive
        # them from the restored state; the checkpoint is authoritative)
        if restart_spec is not None:
            spec = restart_spec
        boxlist = restart_boxlist
        fine = states_r[1]
    else:
        fine = init_fine_from_coarse(cfg, spec, crse)
        if eb0 is not None:
            fine = fine._replace(vel=fine.vel * fine_eb(spec).fluid)
        else:
            crse, fine = post_init_press_two_level(
                cfg, spec, crse, fine, fixed_mg_cycles
            )
    ml = MLState(crse=crse, fine=fine)
    step_cache = {}

    def get_step(s, bl=None):
        key = (s, bl)
        if key in step_cache:
            return step_cache[key]
        if bl is not None:
            # multi-box fine level: subcycled UNION advance over the true
            # BoxArray (advance_subtree boxlists semantics)
            from iamr_tpu.amr.multilevel import (
                advance_hierarchy_subcycled,
                make_fine_config,
            )

            assert eb0 is None, "EB + multi-box union level not wired"
            if particles is not None:
                from iamr_tpu.ns.particles import advect_with_umac_levels

                cfg_f = make_fine_config(cfg, s)

                @jax.jit
                def step_fn(m, parts):
                    dt = m.crse.dt
                    out, umacs = advance_hierarchy_subcycled(
                        [m.crse, m.fine], cfg, [s], fixed_mg_cycles,
                        return_umacs=True, boxlists=[bl],
                    )
                    levels = [(umacs[0], cfg.geom), (umacs[1], cfg_f.geom)]
                    parts = advect_with_umac_levels(parts, levels, dt)
                    return MLState(crse=out[0], fine=out[1]), parts
            else:
                @jax.jit
                def step_fn(m):
                    out = advance_hierarchy_subcycled(
                        [m.crse, m.fine], cfg, [s], fixed_mg_cycles,
                        boxlists=[bl],
                    )
                    return MLState(crse=out[0], fine=out[1])
            step_cache[key] = step_fn
        elif particles is not None:
            assert eb0 is None, "EB + particles multilevel not wired"
            step_cache[key] = make_two_level_step_with_particles(
                cfg, s, fixed_mg_cycles, subcycle=subcycle
            )
        else:
            ebs = [eb0, fine_eb(s)] if eb0 is not None else None
            step_cache[key] = make_two_level_step(
                cfg, s, fixed_mg_cycles, subcycle=subcycle, ebs=ebs
            )
        return step_cache[key]

    nmax = max_steps if max_steps is not None else (
        cfg.max_step if cfg.max_step >= 0 else 10**9
    )
    step = step0
    while step < nmax:
        if cfg.stop_time >= 0.0 and float(ml.crse.time) >= cfg.stop_time:
            break
        if error_tags and regrid_int > 0 and step > 0 and step % regrid_int == 0:
            new_spec, new_bl = spec_from_tags(ml.crse)
            if new_spec != spec or new_bl != boxlist:
                # state transfer on the bounding-box arrays; union hole
                # cells refresh from coarse data inside the next advance
                # (UnionBCProvider), so a box-count change is safe
                fine = regrid_fine_state(cfg, spec, new_spec, ml.crse, ml.fine)
                spec = new_spec
                boxlist = new_bl
                ml = MLState(crse=ml.crse, fine=fine)
                if verbose:
                    print(
                        f"REGRID at step {step}: patch lo={spec.lo} "
                        f"n={spec.ncell} boxes="
                        f"{len(boxlist) if boxlist else 1}"
                    )
        if particles is not None:
            ml, particles = get_step(spec, boxlist)(ml, particles)
            if particle_hooks is not None:
                particle_hooks(step + 1, ml.crse, particles)
        else:
            ml = get_step(spec, boxlist)(ml)
        step += 1
        if plot_int > 0 and step % plot_int == 0:
            write_plotfile_for_hierarchy(
                cfg, spec, ml, f"{plot_file}{step:05d}", step
            )
        if check_int > 0 and step % check_int == 0:
            from iamr_tpu.io.checkpoint import save_checkpoint_ml, save_particles

            save_checkpoint_ml(
                f"{check_file}{step:05d}", [ml.crse, ml.fine], [spec], step,
                boxlists=[boxlist],
            )
            if particles is not None:
                save_particles(f"{check_file}{step:05d}", particles)
        if verbose:
            print(
                f"STEP {step} time {float(ml.crse.time):.6g} "
                f"dt {float(ml.crse.dt):.6g} "
                f"max|u| L0 {float(jnp.max(jnp.abs(ml.crse.vel))):.6g} "
                f"L1 {float(jnp.max(jnp.abs(ml.fine.vel))):.6g}"
            )
    if particles is not None and particle_out:
        from iamr_tpu.ns.particles import write_ascii_particles

        write_ascii_particles(str(particle_out), particles)
    return ml


def run_hierarchy(
    cfg: NSConfig,
    max_steps: Optional[int] = None,
    verbose: bool = False,
    fixed_mg_cycles=None,
    specs=None,
    particles=None,
    particle_hooks=None,
    check_int: int = -1,
    check_file: str = "chk",
    restart=None,
    error_tags=None,
    regrid_int: int = 0,
    particle_out=None,
    boxlists=None,
):
    """Arbitrary-depth subcycled hierarchy run (amr.max_level >= 2) with
    nested patches — from amr.regrid_file (`specs`), dynamic regridding
    (error_tags + regrid_int: every level re-tagged and re-nested out of
    band, Amr::regrid for lbase=0), or default centered ones.
    Tracer particles advect with the composite finest-containing-level MAC
    velocities (subcycle time-averaged).
    boxlists[k]: optional TRUE box list of level k+1 (a multi-box level is
    carried as its bounding-box array but advanced as a UNION level — hole
    cells hold coarse-interpolated data, elliptic solves run union-masked
    across the BoxArray, congruent boxes batch the hyperbolic phases;
    amr/multilevel.advance_subtree)."""
    from iamr_tpu.amr.hierarchy import LevelSpec
    from iamr_tpu.amr.multilevel import (
        advance_hierarchy_subcycled,
        hierarchy_configs,
        init_fine_from_coarse,
        make_hit_forcing,
    )

    r = cfg.ref_ratio
    step0 = 0
    if restart is not None:
        from iamr_tpu.io.checkpoint import load_checkpoint_ml

        states_r, specs_r, step0 = load_checkpoint_ml(str(restart), cfg)
        specs = specs_r
        from iamr_tpu.io.checkpoint import load_boxlists

        bl_r = load_boxlists(str(restart))
        if bl_r is not None:
            boxlists = bl_r
        cfgs = hierarchy_configs(cfg, specs)
        states = tuple(states_r)
        if particles is not None:
            from iamr_tpu.io.checkpoint import load_particles

            p_r = load_particles(str(restart), dtype=cfg.dtype)
            if p_r is not None:
                particles = p_r
    else:
        if specs is None:
            specs = []
            base = cfg.geom.ncell
            for lev in range(cfg.max_level):
                n = base if lev == 0 else specs[-1].ncell
                specs.append(
                    LevelSpec(
                        lo=tuple(r * (x // 4) for x in n),
                        ncell=tuple(r * (x // 2) for x in n),
                        ratio=r,
                    )
                )
        cfgs = hierarchy_configs(cfg, specs)
        states = [initialize(cfg, fixed_mg_cycles)]
        for lev, spec in enumerate(specs):
            states.append(init_fine_from_coarse(cfgs[lev], spec, states[-1]))
        states = tuple(states)
    hit = make_hit_forcing(cfg)
    step_cache = {}

    def get_step(ss, cc):
        key = (tuple(ss), None if boxlists is None else tuple(
            None if b is None else tuple(b) for b in boxlists
        ))
        if key in step_cache:
            return step_cache[key]
        if particles is not None:
            from iamr_tpu.ns.particles import advect_with_umac_levels

            @jax.jit
            def step_fn(sts, parts):
                dt = sts[0].dt
                out, umacs = advance_hierarchy_subcycled(
                    sts, cfg, list(ss), fixed_mg_cycles, hit=hit,
                    return_umacs=True, boxlists=boxlists,
                )
                levels = [(um, c.geom) for um, c in zip(umacs, cc)]
                parts = advect_with_umac_levels(parts, levels, dt)
                return out, parts
        else:
            step_fn = jax.jit(
                lambda sts: advance_hierarchy_subcycled(
                    sts, cfg, list(ss), fixed_mg_cycles, hit=hit,
                    boxlists=boxlists,
                )
            )
        step_cache[key] = step_fn
        return step_fn

    nmax = max_steps if max_steps is not None else (
        cfg.max_step if cfg.max_step >= 0 else 10**9
    )
    step = step0
    while step < nmax:
        if cfg.stop_time >= 0.0 and float(states[0].time) >= cfg.stop_time:
            break
        if (error_tags and regrid_int > 0 and step > 0
                and step % regrid_int == 0):
            from iamr_tpu.amr.tagging import regrid_hierarchy

            new_specs, new_states, new_boxlists = regrid_hierarchy(
                cfg, cfgs, specs, states, error_tags, boxlists=boxlists
            )
            if new_specs != specs or new_boxlists != (
                list(boxlists) if boxlists is not None
                else [None] * len(new_specs)
            ):
                specs = new_specs
                states = new_states
                cfgs = hierarchy_configs(cfg, specs)
                # dynamic regrid carries multi-box levels as union levels
                # (true BR box lists; reference BoxArray regrid semantics)
                boxlists = (
                    new_boxlists if any(b is not None for b in new_boxlists)
                    else None
                )
                if verbose:
                    print(
                        f"REGRID at step {step}: "
                        f"{[(s.lo, s.ncell) for s in specs]} "
                        f"boxes/level {[len(b) if b else 1 for b in new_boxlists]}"
                    )
        step_fn = get_step(specs, cfgs)
        if particles is not None:
            states, particles = step_fn(states, particles)
            if particle_hooks is not None:
                particle_hooks(step + 1, states[0], particles)
        else:
            states = step_fn(states)
        step += 1
        if check_int > 0 and step % check_int == 0:
            from iamr_tpu.io.checkpoint import save_checkpoint_ml, save_particles

            save_checkpoint_ml(
                f"{check_file}{step:05d}", list(states), list(specs), step,
                boxlists=boxlists,
            )
            if particles is not None:
                save_particles(f"{check_file}{step:05d}", particles)
        if verbose:
            print(
                f"STEP {step} time {float(states[0].time):.6g} "
                f"dt {float(states[0].dt):.6g} levels {len(states)}"
            )
    if particles is not None and particle_out:
        from iamr_tpu.ns.particles import write_ascii_particles

        write_ascii_particles(str(particle_out), particles)
    return states


def run_from_inputs(path: str, overrides=(), **kw):
    from iamr_tpu.ns.state import dim_hint_from_path

    pp = ParmParse.from_file(path, overrides)
    cfg = config_from_inputs(pp, dim_hint=dim_hint_from_path(path))
    # exit-on-NaN debugging (the reference's NaN scans after every update,
    # NavierStokes.cpp:847-854; here jax traps at the producing op)
    if int(pp.scoped("ns").query("debug_nans", 0)):
        from iamr_tpu.utils.profiling import enable_debug_nans

        enable_debug_nans()
    # restart (amr.restart = chkNNNNN; section 3.5 restart path)
    restart = pp.scoped("amr").query("restart")
    state0 = None
    restart_particles = None
    if restart and cfg.max_level == 0:
        from iamr_tpu.io.checkpoint import load_checkpoint, load_particles

        state0, rstep = load_checkpoint(str(restart), cfg)
        restart_particles = load_particles(str(restart), dtype=cfg.dtype)
        kw["step0"] = rstep
    # multilevel restarts load inside the runners (load_checkpoint_ml)
    hooks = IOHooks(cfg, pp)
    if kw.get("callback") is None and (
        hooks.plot_int > 0 or hooks.check_int > 0 or hooks.sum_interval > 0
    ):
        kw["callback"] = hooks
    if state0 is not None:
        kw["state"] = state0
    from iamr_tpu.eb.geom import eb_from_inputs, psi_from_inputs

    eb = eb_from_inputs(pp, cfg.geom, dtype=cfg.dtype)
    if eb is not None:
        kw["eb"] = eb
    # tracer particles (particles.* namespace, NavierStokesBase.cpp:3754-3954)
    ppart = pp.scoped("particles")
    init_file = ppart.query("particle_init_file")
    if init_file and ppart.query_bool("do_nspc", True):
        import os

        from iamr_tpu.ns.particles import (
            from_positions,
            read_ascii_init_file,
            timestamp,
        )

        base = os.path.dirname(os.path.abspath(path))
        fpath = init_file if os.path.isabs(str(init_file)) else os.path.join(
            base, str(init_file)
        )
        pos = read_ascii_init_file(fpath, cfg.dim)
        kw["particles"] = (
            restart_particles
            if restart_particles is not None
            else from_positions(jnp.asarray(pos, cfg.jdtype))
        )
        ts = ppart.query("timestamp_dir")
        if ts:
            os.makedirs(str(ts), exist_ok=True)

            def _phooks(step, state, parts):
                timestamp(
                    parts, os.path.join(str(ts), "Timestamp"), float(state.time)
                )

            kw["particle_hooks"] = _phooks
        pout = ppart.query("particle_output_file")
        if pout:
            kw["particle_out"] = str(pout)
    # amr.regrid_file: fixed grids per level (boxes in the COARSER level's
    # index space, Box::refine semantics). Multi-box levels at ANY depth
    # advance as UNION levels over their true BoxArray (boxlists threading
    # below; amr/multilevel.advance_subtree).
    fixed_grids = None
    rgf = pp.scoped("amr").query("regrid_file")
    if rgf:
        import os as _os

        from iamr_tpu.amr.hierarchy import read_fixed_grids

        base = _os.path.dirname(_os.path.abspath(path))
        fpath = str(rgf) if _os.path.isabs(str(rgf)) else _os.path.join(
            base, str(rgf)
        )
        fixed_grids = read_fixed_grids(fpath, cfg.dim)

    def _specs_from_grids(grids):
        """(LevelSpecs, boxlists) from the raw per-level box lists: specs[k]
        is level k+1's union BOUNDING BOX (lo relative to the parent patch,
        fine index units) — the carried array shape — and boxlists[k] the
        TRUE box list in the same units (None for single-box levels), which
        advance_subtree uses to run multi-box levels as union levels (the
        reference's BoxArray-of-grids data model, Docs/Software.rst:356-401)
        instead of silently widening them to the bbox."""
        from iamr_tpu.amr.hierarchy import LevelSpec

        r = cfg.ref_ratio
        out = []
        blists = []
        parent_lo = (0,) * cfg.dim  # parent-patch origin in its level's space
        for lev_boxes in grids:
            lo = tuple(min(b[0][d] for b in lev_boxes) for d in range(cfg.dim))
            hi = tuple(max(b[1][d] for b in lev_boxes) for d in range(cfg.dim))
            rel_lo = tuple(lo[d] - parent_lo[d] for d in range(cfg.dim))
            out.append(LevelSpec(
                lo=tuple(r * x for x in rel_lo),
                ncell=tuple(r * (hi[d] - lo[d]) for d in range(cfg.dim)),
                ratio=r,
            ))
            if len(lev_boxes) > 1:
                blists.append(tuple(
                    LevelSpec(
                        lo=tuple(
                            r * (b[0][d] - parent_lo[d])
                            for d in range(cfg.dim)
                        ),
                        ncell=tuple(
                            r * (b[1][d] - b[0][d]) for d in range(cfg.dim)
                        ),
                        ratio=r,
                    )
                    for b in lev_boxes
                ))
            else:
                blists.append(None)
            parent_lo = tuple(r * x for x in lo)
        return out, blists

    from iamr_tpu.amr.tagging import parse_refinement_indicators

    if cfg.max_level >= 2:
        specs_h, blists_h = (
            _specs_from_grids(fixed_grids) if fixed_grids else (None, None)
        )
        return run_hierarchy(
            cfg,
            verbose=kw.get("verbose", False),
            specs=specs_h,
            boxlists=blists_h if blists_h and any(blists_h) else None,
            particles=kw.get("particles"),
            particle_hooks=kw.get("particle_hooks"),
            particle_out=kw.get("particle_out"),
            check_int=hooks.check_int,
            check_file=hooks.check_file,
            restart=restart or None,
            error_tags=(
                None if fixed_grids else
                (parse_refinement_indicators(pp) or None)
            ),
            regrid_int=int(
                pp.scoped("amr").queryarr("regrid_int", [0])[0]
            ),
        )
    if cfg.max_level == 1 and fixed_grids and len(fixed_grids[0]) > 1:
        # a multi-box fixed-grids level runs the union multipatch path
        # (disjoint refined regions; the bbox would waste area) — no
        # particles/checkpoint wiring there yet
        from iamr_tpu.amr.hierarchy import LevelSpec

        r = cfg.ref_ratio
        mspecs = [
            LevelSpec(
                lo=tuple(r * x for x in lo),
                ncell=tuple(r * (h - l) for l, h in zip(lo, hi)),
                ratio=r,
            )
            for lo, hi in fixed_grids[0]
        ]
        return run_multipatch(
            cfg,
            verbose=kw.get("verbose", False),
            fixed_specs=mspecs,
            plot_int=hooks.plot_int,
            plot_file=hooks.plot_file,
        )
    if cfg.max_level >= 1:
        tags = parse_refinement_indicators(pp)
        regrid_int = int(pp.scoped("amr").queryarr("regrid_int", [0])[0])
        subcycling = str(pp.scoped("amr").query("subcycling_mode", "Auto"))
        return run_multilevel(
            cfg,
            verbose=kw.get("verbose", False),
            subcycle=subcycling.lower() != "none",
            error_tags=tags or None,
            regrid_int=regrid_int,
            plot_int=hooks.plot_int,
            plot_file=hooks.plot_file,
            fixed_spec=(
                _specs_from_grids(fixed_grids)[0][0] if fixed_grids else None
            ),
            particles=kw.get("particles"),
            particle_hooks=kw.get("particle_hooks"),
            particle_out=kw.get("particle_out"),
            check_int=hooks.check_int,
            check_file=hooks.check_file,
            restart=restart or None,
            eb_psi=(
                psi_from_inputs(pp, cfg.dim) if eb is not None else None
            ),
        )
    return run(cfg, **kw)
