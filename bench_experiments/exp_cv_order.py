"""Diagnose the ConvectedVortex pre-asymptotic order (round-3 VERDICT weak
item 1): run the 64->128(->256) ladder under controlled variations to
attribute the error — temporal (halve dt), pressure lag (init_iter),
vortex resolution (rvort), limiter clipping (IAMR_UNLIMITED env hook not
wired; resolution probes stand in). Prints per-variant fitted orders.

Usage: python bench_experiments/exp_cv_order.py [--full]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.driver import initialize, make_step
from iamr_tpu.ns.state import config_from_inputs


def run_cv(n, dt_num=0.125, t_final=0.25, init_iter=1, rvort=0.07,
           forcevort=0.05, meanmag=1.0):
    dt = dt_num / n
    nsteps = int(round(t_final / dt))
    cfg = config_from_inputs(ParmParse.from_string(f"""
        amr.n_cell = {n} {n}
        ns.cfl = 0.5
        ns.init_iter = {init_iter}
        ns.fixed_dt = {dt}
        ns.vel_visc_coef = 0.0
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        prob.probtype = 8
        prob.density_ic = 1.0
        prob.rvort = {rvort}
        prob.forcevort = {forcevort}
        prob.meanFlowDir = 1
        prob.meanFlowMag = {meanmag}
    """))
    state0 = initialize(cfg)
    state = state0
    step = make_step(cfg)
    for _ in range(nsteps):
        state = step(state)
    shift = int(round(meanmag * t_final * n))
    assert abs(meanmag * t_final * n - shift) < 1e-9
    u0 = np.asarray(state0.vel[0])
    u_ex = np.roll(u0, shift, axis=0)
    diff = np.asarray(state.vel[0]) - u_ex
    return float(np.sqrt(np.mean(diff ** 2))), np.abs(diff)


def order(e1, e2):
    return float(np.log(e1 / e2) / np.log(2.0))


def main():
    ns = (64, 128, 256) if "--full" in sys.argv else (64, 128)
    variants = [
        ("baseline", {}),
        ("dt/2 (temporal?)", {"dt_num": 0.0625}),
        ("init_iter=2 (pressure lag?)", {"init_iter": 2}),
        ("rvort=0.14 (resolution?)", {"rvort": 0.14}),
        ("forcevort/5 (nonlinearity?)", {"forcevort": 0.01}),
    ]
    for name, kw in variants:
        errs = []
        for n in ns:
            e, d = run_cv(n, **kw)
            errs.append(e)
        os_ = [order(errs[i - 1], errs[i]) for i in range(1, len(ns))]
        print(f"{name}: errs={['%.3e' % e for e in errs]} "
              f"orders={['%.2f' % o for o in os_]}", flush=True)


if __name__ == "__main__":
    main()
