"""Hard convergence-order gate (slow tier): the fitted orders of the
smooth exact-solution ladders must reach the scheme's 2nd-order design
accuracy (>= 1.9, the round-2/3 VERDICT bar), so REPORT.md cannot
silently rot. Reuses the exact case definitions of
regression/convergence_report.py (the reference's own accuracy
methodology, Util/Convergence_scripts/pprocConvOrder.py)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_taylor_green_2d_orders():
    from regression.convergence_report import taylor_green_2d

    r = taylor_green_2d()
    assert min(r["orders"]) >= 1.9, r


@pytest.mark.slow
def test_convected_vortex_orders():
    # the (64, 128) pair of the REPORT ladder (the 256 point is minutes of
    # CPU; the coarsest pair is the one that regressed historically)
    from regression.convergence_report import convected_vortex

    r = convected_vortex(ns=(64, 128))
    assert min(r["orders"]) >= 1.9, r


@pytest.mark.slow
def test_poiseuille_exactness():
    # steady discrete solution matches the exact parabola at EVERY
    # resolution (the 7-point stencil is exact on quadratics); also guards
    # the steadyState() semantics (pointwise |U| change, cpp:2230-2283).
    # Root-caused round 5: the historical n=64 6.8e-5 was a fixed-800-step
    # truncation artifact (the run reaches the 8e-10 f64 floor with the
    # scaled budget); with steady_tol=1e-8 the stop error is bounded by
    # ~tol/(nu*pi^2*dt) ~ 90*tol ~ 1e-6, so gate at 1e-5 (10x margin),
    # 1000x tighter than the old 1e-2 (round-4 VERDICT item 8)
    from regression.convergence_report import poiseuille

    r = poiseuille()
    assert max(r["errors"]) < 1e-5, r
