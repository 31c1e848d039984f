"""Hntr conservative lat-lon regridding (reference hntr.cpp parity oracles:
analytic area sums, exact conservation, constant preservation, masked
weights)."""
import numpy as np
import pytest

from icebin_tpu.grid.spec import GridSpecLonLat, modele_lonlat_grid
from icebin_tpu.regrid.hntr import Hntr, hntr_matrix, hntr_spec, overlap_1d


def test_overlap_1d_basic():
    r, c, v = overlap_1d([0.0, 1.0, 2.0], [0.0, 0.5, 2.0])
    got = {(int(a), int(b)): x for a, b, x in zip(r, c, v)}
    assert got == {(0, 0): 0.5, (0, 1): 0.5, (1, 1): 1.0}


def test_overlap_1d_periodic_wrap():
    # grid 2 shifted by 90 deg: every cell splits across the wrap correctly
    b1 = np.linspace(-180, 180, 5)
    b2 = np.linspace(-90, 270, 5)
    r, c, v = overlap_1d(b1, b2, period=360.0)
    M = np.zeros((4, 4))
    M[r, c] = v
    np.testing.assert_allclose(M.sum(axis=0), 90.0)
    np.testing.assert_allclose(M.sum(axis=1), 90.0)
    # cell 0 of grid1 [-180,-90] overlaps cell 3 of grid2 [180,270]-360
    assert M[0, 3] == 90.0


def test_overlap_1d_matches_dense_oracle():
    """Sorted-merge window construction == dense broadcast oracle, on
    irregular non-nesting borders and on a wrapped periodic axis."""
    rng = np.random.default_rng(7)

    def dense(b1, b2, period=None):
        b1 = np.asarray(b1, float)
        b2 = np.asarray(b2, float)
        shifts = [-period, 0.0, period] if period else [0.0]
        rows, cols, vals = [], [], []
        for sh in shifts:
            lo = np.maximum(b1[:-1, None], b2[None, :-1] + sh)
            hi = np.minimum(b1[1:, None], b2[None, 1:] + sh)
            ov = hi - lo
            r, c = np.nonzero(ov > 1e-14 * max(abs(b1[-1] - b1[0]), 1.0))
            rows.append(r)
            cols.append(c)
            vals.append(ov[r, c])
        return (np.concatenate(rows), np.concatenate(cols),
                np.concatenate(vals))

    b1 = np.concatenate(([0.0], np.cumsum(rng.uniform(0.1, 2.0, 37))))
    b2 = np.concatenate(([-0.7], np.cumsum(rng.uniform(0.05, 3.0, 23)) - 0.7))
    for args in [(b1, b2), (b2, b1)]:
        r0, c0, v0 = dense(*args)
        r1, c1, v1 = overlap_1d(*args)
        np.testing.assert_array_equal(r1, r0)
        np.testing.assert_array_equal(c1, c0)
        np.testing.assert_allclose(v1, v0, rtol=1e-15)
    # periodic: two unequal global lon gratings with an offset
    p1 = np.linspace(-180.0, 180.0, 29)
    p2 = np.linspace(-170.0, 190.0, 18)
    r0, c0, v0 = dense(p1, p2, period=360.0)
    r1, c1, v1 = overlap_1d(p1, p2, period=360.0)
    np.testing.assert_array_equal(r1, r0)
    np.testing.assert_array_equal(c1, c0)
    np.testing.assert_allclose(v1, v0, rtol=1e-15)


def test_overlap_1d_minute_scale():
    """1-minute global axis (21600 intervals) -> coarse: must run in O(nnz),
    not a dense 21600 x N broadcast (the z1qx1n TOPO input scale)."""
    fine = hntr_spec(21600, 10800)       # 1-minute global grid spec
    r, c, v = overlap_1d(fine.lonb, np.linspace(-180, 180, 145),
                         period=360.0)
    assert len(v) >= 21600               # every fine cell covered
    np.testing.assert_allclose(np.bincount(c, v, minlength=144), 2.5,
                               rtol=1e-12)
    # latitude axis in sin-lat (the hntr_matrix path)
    sr, sc, sv = overlap_1d(np.sin(np.radians(fine.latb)),
                            np.sin(np.radians(np.linspace(-90, 90, 91))))
    np.testing.assert_allclose(sv.sum(), 2.0, rtol=1e-12)


def test_hntr_matrix_conservation_fine_to_coarse():
    fine = hntr_spec(72, 46)
    coarse = hntr_spec(24, 16)
    M = hntr_matrix(coarse, fine)
    # total sphere area both ways
    sphere = 4 * np.pi * fine.eq_rad ** 2
    np.testing.assert_allclose(M.vals.sum(), sphere, rtol=1e-12)
    np.testing.assert_allclose(M.wM.sum(), sphere, rtol=1e-12)
    # row sums == coarse cell areas; col sums == fine cell areas
    np.testing.assert_allclose(M.wM, coarse.cell_areas(), rtol=1e-12)
    np.testing.assert_allclose(M.Mw, fine.cell_areas(), rtol=1e-12)


def test_hntr_constant_and_mass():
    fine = hntr_spec(144, 90)
    coarse = hntr_spec(36, 24)
    h = Hntr(coarse, fine)
    f = np.full(fine.ncells, 3.5)
    out = h.regrid(f)
    np.testing.assert_allclose(out, 3.5, rtol=1e-13)
    rng = np.random.default_rng(0)
    f = rng.uniform(0, 10, fine.ncells)
    out = h.regrid(f)
    np.testing.assert_allclose(np.sum(out * coarse.cell_areas()),
                               np.sum(f * fine.cell_areas()), rtol=1e-12)


def test_hntr_weighted_mask():
    """HNTR WTA semantics: weighted mean ignores zero-weight (e.g. ocean)."""
    fine = hntr_spec(8, 4)
    coarse = hntr_spec(4, 2)
    h = Hntr(coarse, fine)
    f = np.arange(fine.ncells, dtype=float)
    w = np.zeros(fine.ncells)
    w[::2] = 1.0
    out = h.regrid(f, WTA=w)
    # manual check for one coarse cell: weighted mean over its fine cells
    M = h.M.to_scipy().tocsr()
    row = M.getrow(0).toarray().ravel()
    expect = np.sum(row * w * f) / np.sum(row * w)
    np.testing.assert_allclose(out[0], expect, rtol=1e-13)
    # all-zero-weight destination -> fill
    out2 = h.regrid(f, WTA=np.zeros(fine.ncells))
    assert np.isnan(out2).all()


def test_hntr_round_trip_coarse_fields():
    """coarse->fine->coarse reproduces the coarse field exactly (fine nests
    in coarse): the classic HNTR sanity identity."""
    coarse = hntr_spec(18, 12)
    fine = hntr_spec(72, 48)
    up = Hntr(fine, coarse)
    down = Hntr(coarse, fine)
    rng = np.random.default_rng(1)
    f = rng.uniform(0, 5, coarse.ncells)
    back = down.regrid(up.regrid(f))
    np.testing.assert_allclose(back, f, rtol=1e-12)


def test_hntr_spec_modele_half_boxes():
    """jm*dlat > 180 clips outer borders at the poles (half-height rows)."""
    g = hntr_spec(144, 91, dlat_min=120.0)  # 91 x 2deg = 182 -> clipped
    assert len(g.latb) == 92
    np.testing.assert_allclose(g.latb[0], -90.0)
    np.testing.assert_allclose(g.latb[1], -89.0)
    np.testing.assert_allclose(g.latb[2], -87.0)
    np.testing.assert_allclose(g.cell_areas().sum(),
                               4 * np.pi * g.eq_rad ** 2, rtol=1e-12)
    with pytest.raises(ValueError):
        hntr_spec(10, 20, dlat_min=20 * 60.0)  # clips > 1 row


def test_hntr_matches_exchange_grid_path():
    """Same physics two ways: hntr_matrix(B<-A) column/row sums must agree
    with cell areas from the grid specs used by the polygon pipeline."""
    A = modele_lonlat_grid(36, 24)
    B = hntr_spec(18, 12, eq_rad=A.eq_rad)
    M = hntr_matrix(B, A)
    np.testing.assert_allclose(M.Mw, A.cell_areas(), rtol=1e-12)
    np.testing.assert_allclose(M.wM, B.cell_areas(), rtol=1e-12)
