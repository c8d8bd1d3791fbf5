"""Tagging + clustering + regrid-state-transfer unit tests."""

import numpy as np
import jax.numpy as jnp

from iamr_tpu.amr.hierarchy import LevelSpec
from iamr_tpu.amr.tagging import (
    ErrorTag,
    cluster_to_patch,
    parse_refinement_indicators,
    regrid_fine_state,
    tag_cells,
)
from iamr_tpu.config.parmparse import ParmParse
from iamr_tpu.ns.probs import init_state
from iamr_tpu.ns.state import config_from_inputs

BASE = """
max_step = 1
amr.n_cell = 32 32
ns.cfl = 0.5
geometry.is_periodic = 1 1
ns.lo_bc = 0 0
ns.hi_bc = 0 0
prob.probtype = 11
prob.velocity_factor = 1.0
amr.refinement_indicators = vorticity hi_rho
amr.vorticity.vorticity_greater = 0.1
amr.hi_rho.field_name = density
amr.hi_rho.value_greater = 1.5
amr.hi_rho.start_time = 0.0
"""


def test_parse_indicators():
    tags = parse_refinement_indicators(ParmParse.from_string(BASE))
    assert len(tags) == 2
    assert tags[0].test == "vorticity_greater" and tags[0].field == "mag_vort"
    assert tags[1].field == "density" and tags[1].value == 1.5


def test_tag_and_cluster():
    cfg = config_from_inputs(ParmParse.from_string(BASE))
    state = init_state(cfg)
    tags = [ErrorTag(field="mag_vort", test="vorticity_greater", values=(0.1,))]
    m = np.asarray(tag_cells(cfg, state, tags))
    assert m.any()  # TG has |vort| up to ~4pi
    spec = cluster_to_patch(m, ratio=2, blocking_factor=4)
    assert spec is not None
    assert all(l % 2 == 0 for l in spec.lo)
    assert all(n % 2 == 0 for n in spec.ncell)


def test_cluster_empty_returns_none():
    assert cluster_to_patch(np.zeros((8, 8), dtype=bool), 2) is None


def test_cluster_localized_blob():
    m = np.zeros((32, 32), dtype=bool)
    m[10:14, 20:22] = True
    spec = cluster_to_patch(m, ratio=2, n_error_buf=1, blocking_factor=4, min_size=4)
    # patch covers the tagged region + buffer
    assert spec.lo[0] <= 2 * 9 and spec.lo[0] + spec.ncell[0] >= 2 * 15
    assert spec.lo[1] <= 2 * 19 and spec.lo[1] + spec.ncell[1] >= 2 * 23


def test_regrid_preserves_fine_overlap():
    cfg = config_from_inputs(ParmParse.from_string(BASE))
    crse = init_state(cfg)
    old_spec = LevelSpec(lo=(16, 16), ncell=(16, 16), ratio=2)
    new_spec = LevelSpec(lo=(20, 20), ncell=(16, 16), ratio=2)
    from iamr_tpu.amr.multilevel import init_fine_from_coarse

    fine_old = init_fine_from_coarse(cfg, old_spec, crse)
    # stamp a marker in the overlap region (fine idx 20..31 in old coords 4..15)
    fine_old = fine_old._replace(
        rho=fine_old.rho.at[6, 6].set(42.0)  # global fine (22,22), in overlap
    )
    fine_new = regrid_fine_state(cfg, old_spec, new_spec, crse, fine_old)
    # global fine (22,22) -> new coords (2,2)
    assert float(fine_new.rho[2, 2]) == 42.0
    assert fine_new.rho.shape == (16, 16)


def test_in_box_indicator_and_realbox_gate():
    """in_box tags exactly the cells inside the RealBox; in_box_lo/hi also
    gates other tests' regions (NS_error.cpp:26-37, 79-82)."""
    import numpy as np
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.probs import init_state
    from iamr_tpu.ns.state import config_from_inputs
    from iamr_tpu.amr.tagging import parse_refinement_indicators, tag_cells

    pp = ParmParse.from_string(
        """
        max_step = 1
        amr.n_cell = 16 16
        ns.cfl = 0.5
        geometry.prob_lo = 0. 0.
        geometry.prob_hi = 1. 1.
        geometry.is_periodic = 1 1
        ns.lo_bc = 0 0
        ns.hi_bc = 0 0
        prob.probtype = 11
        amr.refinement_indicators = zone hot
        amr.zone.in_box_lo = 0.25 0.25
        amr.zone.in_box_hi = 0.5 0.5
        amr.hot.field_name = density
        amr.hot.value_greater = 0.5 0.9
        amr.hot.in_box_lo = 0.0 0.0
        amr.hot.in_box_hi = 0.5 1.0
        amr.hot.max_level = 1
        """
    )
    cfg = config_from_inputs(pp)
    state = init_state(cfg)
    tags = parse_refinement_indicators(pp)
    assert tags[0].test == "in_box"
    assert tags[1].values == (0.5, 0.9)

    m = np.asarray(tag_cells(cfg, state, [tags[0]]))
    # cells with centers in [0.25,0.5]^2: indices 4..7 (x=(i+0.5)/16)
    expect = np.zeros((16, 16), bool)
    expect[4:8, 4:8] = True
    assert (m == expect).all()

    # density=1 everywhere for TG: value_greater 0.5 fires but only inside
    # its in_box gate (x < 0.5), and not at level >= max_level
    m1 = np.asarray(tag_cells(cfg, state, [tags[1]], level=0))
    assert m1[:8].all() and not m1[8:].any()
    assert not np.asarray(tag_cells(cfg, state, [tags[1]], level=1)).any()


def test_outflow_tag_policy():
    """manual_tags_placement (NavierStokesBase.cpp:2112-2211): derefine
    clears tags at the outflow strip; refine tags the whole strip when
    tags sit near it."""
    from iamr_tpu.amr.tagging import apply_outflow_tag_policy
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.state import config_from_inputs

    pp = ParmParse.from_string(
        """
        amr.n_cell = 16 16
        geometry.is_periodic = 0 0
        ns.lo_bc = 5 5
        ns.hi_bc = 5 2
        prob.probtype = 1
        max_step = 1
        """
    )
    cfg = config_from_inputs(pp)  # outflow at hi-y only
    tags = np.zeros((16, 16), dtype=bool)
    tags[8, 15] = True   # tag ON the outflow strip
    tags[8, 8] = True
    out = apply_outflow_tag_policy(cfg, tags, do_refine=False,
                                   do_derefine=True, nbuf=1)
    assert not out[8, 15] and out[8, 8]      # strip cleared, interior kept
    out2 = apply_outflow_tag_policy(cfg, tags, do_refine=True,
                                    do_derefine=False, nbuf=1)
    assert out2[:, 15].all()                 # whole strip tagged
    # no tags near the outflow -> refine leaves it alone
    tags2 = np.zeros((16, 16), dtype=bool)
    tags2[8, 3] = True
    out3 = apply_outflow_tag_policy(cfg, tags2, do_refine=True,
                                    do_derefine=False, nbuf=1)
    assert not out3[:, 15].any()


def test_tag_buffer_does_not_wrap():
    """Berger-Rigoutsos tag buffering must not wrap across the domain: a
    tag at index 0 must not seed a patch at the opposite face."""
    from iamr_tpu.amr.tagging import cluster_to_patches
    from iamr_tpu.native import available

    if not available():
        import pytest as _pytest

        _pytest.skip("native clustering lib unavailable")
    tags = np.zeros((32, 32), dtype=bool)
    tags[0, 5] = True
    specs = cluster_to_patches(tags, 2)
    for sp in specs:
        # no box may touch the hi-x face (the wrap artifact landed there)
        assert sp.lo[0] + sp.ncell[0] <= 2 * 24, (sp.lo, sp.ncell)


def test_cluster_min_size_keeps_blocking_alignment():
    """min-size expansion grows by whole blocking units (the alignment
    must survive; a misaligned patch breaks MG coarsening downstream)."""
    from iamr_tpu.amr.tagging import cluster_to_patch

    tags = np.zeros((32,), dtype=bool).reshape(32, 1)
    tags2 = np.zeros((32, 32), dtype=bool)
    tags2[15, 15] = True
    s = cluster_to_patch(tags2, 2, blocking_factor=8, min_size=22)
    bf = 4  # blocking_factor // ratio
    for d in range(2):
        assert (s.lo[d] // 2) % bf == 0 or s.lo[d] == 0, s.lo
        assert s.ncell[d] >= 22
