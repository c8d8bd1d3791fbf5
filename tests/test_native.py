"""Native C++ runtime library: Berger-Rigoutsos clustering + FAB I/O.

The BR algorithm replaces the reference's AMReX clustering (Amr::regrid
path); FAB I/O replaces the VisMF binary inner loop."""

import os
import tempfile

import numpy as np
import pytest

from iamr_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="C++ toolchain unavailable"
)


def _check_cover(tags, boxes, min_eff):
    covered = np.zeros_like(tags, dtype=bool)
    for lo, hi in boxes:
        sl = tuple(slice(l, h + 1) for l, h in zip(lo, hi))
        covered[sl] = True
        sub = tags[sl]
        assert sub.any(), "box with no tags"
    assert covered[tags].all(), "some tags not covered"


def test_br_single_blob_2d():
    tags = np.zeros((64, 64), dtype=bool)
    tags[10:20, 30:40] = True
    boxes = native.berger_rigoutsos(tags, min_width=4, min_eff=0.7)
    _check_cover(tags, boxes, 0.7)
    # a perfect square blob should come back as ~1 tight box
    assert len(boxes) <= 2
    lo, hi = boxes[0]
    assert lo[0] >= 10 and hi[0] <= 19


def test_br_two_blobs_split():
    tags = np.zeros((64, 64), dtype=bool)
    tags[4:12, 4:12] = True
    tags[40:52, 44:56] = True
    boxes = native.berger_rigoutsos(tags, min_width=4, min_eff=0.7)
    _check_cover(tags, boxes, 0.7)
    # the zero gap must split them: one box would be ~6% efficient
    assert len(boxes) >= 2
    for lo, hi in boxes:
        sl = tuple(slice(l, h + 1) for l, h in zip(lo, hi))
        eff = tags[sl].mean()
        assert eff > 0.6, (lo, hi, eff)


def test_br_l_shape_efficiency():
    tags = np.zeros((64, 64), dtype=bool)
    tags[8:40, 8:16] = True
    tags[8:16, 8:40] = True  # L shape
    boxes = native.berger_rigoutsos(tags, min_width=4, min_eff=0.72)
    _check_cover(tags, boxes, 0.72)
    # bounding box of the L is ~44% efficient; BR must do better
    total_tagged = tags.sum()
    total_box = sum(
        np.prod([h - l + 1 for l, h in zip(lo, hi)]) for lo, hi in boxes
    )
    assert total_tagged / total_box > 0.6


def test_br_3d():
    tags = np.zeros((32, 32, 32), dtype=bool)
    tags[4:12, 6:14, 8:16] = True
    tags[20:28, 20:28, 20:28] = True
    boxes = native.berger_rigoutsos(tags, min_width=4, min_eff=0.7)
    _check_cover(tags, boxes, 0.7)
    assert len(boxes) >= 2


def test_fab_roundtrip():
    rng = np.random.RandomState(0)
    for shape in [(16, 24), (8, 12, 10)]:
        data = rng.randn(3, *shape)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "Cell_D_00000")
            off = native.write_fab(p, data, (0,) * len(shape),
                                   tuple(s - 1 for s in shape))
            back = native.read_fab(p, off, shape, 3)
            np.testing.assert_array_equal(back, data)
            # the header must parse as an AMReX FAB line
            with open(p, "rb") as f:
                hdr = f.readline().decode()
            assert hdr.startswith("FAB ((8, (64 11 52")
            assert hdr.rstrip().endswith(" 3")


def test_fab_fortran_order_on_disk():
    # byte-level check: payload is Fortran-order per component (AMReX
    # native), and the returned offset locates the FAB HEADER (VisMF
    # FabOnDisk semantics — AMReX/yt seek there and skip the header line)
    data = np.arange(24, dtype=np.float64).reshape(1, 4, 6)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "fab")
        off = native.write_fab(p, data, (0, 0), (3, 5))
        with open(p, "rb") as f:
            f.seek(off)
            assert f.read(4) == b"FAB "
            f.seek(off)
            f.readline()  # what yt does: skip the header line
            raw = np.frombuffer(f.read(), dtype=np.float64)
        np.testing.assert_array_equal(
            raw.reshape(6, 4).T, data[0]
        )


def test_plotfile_uses_native_and_roundtrips():
    from iamr_tpu.core.geometry import Geometry
    from iamr_tpu.io.plotfile import read_plotfile, write_plotfile

    geom = Geometry((12, 8), (0.0, 0.0), (1.0, 1.0), (True, True), 0)
    rng = np.random.RandomState(1)
    fields = {"density": rng.randn(12, 8), "tracer": rng.randn(12, 8)}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "plt00000")
        write_plotfile(p, geom, fields, time=0.5)
        back, t = read_plotfile(p)
        assert t == 0.5
        for k in fields:
            np.testing.assert_allclose(back[k], fields[k])
