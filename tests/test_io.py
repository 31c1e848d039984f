"""Persistence round-trips: grids, exchange grids, GCMRegridder, matrices,
zarray codec (reference Grid::ncio / GCMRegridder::ncio /
linear::Weighted_Compressed parity)."""
import numpy as np
import pytest

from icebin_tpu.grid.spec import Grid, GridSpecLonLat, GridSpecXY, modele_lonlat_grid
from icebin_tpu.io.ncio import (read_exchange, read_gcmregridder, read_grid,
                                read_matrix, write_exchange,
                                write_gcmregridder, write_grid, write_matrix)
from icebin_tpu.io.zarray import decode_zarray, encode_zarray
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.matrices import RegridParams

from helpers import SEARISE, toy_elevmask, toy_grids


def test_grid_round_trip_lonlat(tmp_path):
    spec = modele_lonlat_grid(144, 90)
    p = str(tmp_path / "g.nc")
    write_grid(p, spec)
    g = read_grid(p)
    assert isinstance(g.spec, GridSpecLonLat)
    np.testing.assert_array_equal(g.spec.lonb, spec.lonb)
    np.testing.assert_array_equal(g.spec.latb, spec.latb)
    assert g.spec.pole_cap_south and g.spec.pole_cap_north
    assert g.spec.name == spec.name
    np.testing.assert_array_equal(g.spec.cell_areas(), spec.cell_areas())


def test_grid_round_trip_xy_with_mask(tmp_path):
    spec = GridSpecXY(xb=np.linspace(-5e5, 5e5, 21),
                      yb=np.linspace(-3e6, -2e6, 31), projection=SEARISE)
    mask = np.zeros(spec.ncells, dtype=bool)
    mask[::3] = True
    p = str(tmp_path / "gi.nc")
    write_grid(p, Grid(spec, mask=mask))
    g = read_grid(p)
    np.testing.assert_array_equal(g.spec.xb, spec.xb)
    np.testing.assert_array_equal(g.mask, mask)
    # projection survives via proj4 string
    ll1 = g.spec.cell_centers_ll()
    ll2 = spec.cell_centers_ll()
    np.testing.assert_allclose(ll1, ll2, atol=1e-12)


def test_exchange_round_trip(tmp_path):
    from icebin_tpu.grid.exchange import make_exchange_grid
    specA, specI = toy_grids((20, 20), (4, 4))
    xg = make_exchange_grid(specA, specI, subdiv=1)
    p = str(tmp_path / "x.nc")
    write_exchange(p, xg)
    x2 = read_exchange(p)
    np.testing.assert_array_equal(x2.iA, xg.iA)
    np.testing.assert_array_equal(x2.iI, xg.iI)
    np.testing.assert_array_equal(x2.area, xg.area)
    np.testing.assert_array_equal(x2.centroid, xg.centroid)
    assert (x2.nA, x2.nI) == (xg.nA, xg.nI)


def test_gcmregridder_round_trip(tmp_path):
    specA, specI = toy_grids((30, 30), (5, 5))
    gr = GCMRegridder(specA, hcdefs=[0.0, 800.0, 2500.0])
    gr.add_sheet("toy", specI, subdiv=1)
    p = str(tmp_path / "gr.nc")
    write_gcmregridder(p, gr)
    g2 = read_gcmregridder(p)
    np.testing.assert_array_equal(g2.hcdefs, gr.hcdefs)
    assert list(g2.sheets) == ["toy"]
    # matrices built from the reloaded container are IDENTICAL
    elev = toy_elevmask(specI)
    P = RegridParams(scale=True, correctA=True)
    M1 = gr.regrid_matrices("toy", elev).matrix("EvI", P)
    M2 = g2.regrid_matrices("toy", elev).matrix("EvI", P)
    np.testing.assert_array_equal(M1.rows, M2.rows)
    np.testing.assert_array_equal(M1.cols, M2.cols)
    np.testing.assert_array_equal(M1.vals, M2.vals)


@pytest.mark.parametrize("compressed", [False, True])
def test_matrix_round_trip(tmp_path, compressed):
    specA, specI = toy_grids((30, 30), (5, 5))
    gr = GCMRegridder(specA, hcdefs=[0.0, 800.0, 2500.0])
    gr.add_sheet("toy", specI, subdiv=1)
    M = gr.regrid_matrices("toy", toy_elevmask(specI)).matrix(
        "EvI", RegridParams())
    p = str(tmp_path / "m.nc")
    write_matrix(p, M, compressed=compressed)
    M2 = read_matrix(p)
    assert M2.shape == M.shape
    np.testing.assert_array_equal(M2.rows, M.rows)
    np.testing.assert_array_equal(M2.cols, M.cols)
    np.testing.assert_array_equal(M2.vals, M.vals)   # bit-exact f64


def test_zarray_codec_exact_and_compact():
    rng = np.random.default_rng(0)
    n = 50000
    rows = np.sort(rng.integers(0, 5000, n))
    cols = rng.integers(0, 200000, n)
    vals = rng.normal(size=n)
    blob = encode_zarray(rows, cols, vals)
    r, c, v = decode_zarray(blob)
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(r, rows[order])
    np.testing.assert_array_equal(c, cols[order])
    np.testing.assert_array_equal(v, vals[order])    # bit-exact
    raw = n * (8 + 8 + 8)
    assert len(blob) < 0.7 * raw                     # actually compresses


def test_zarray_empty_and_structured():
    r, c, v = decode_zarray(encode_zarray([], [], []))
    assert len(r) == len(c) == len(v) == 0
    # structured (regrid-like) indices compress much better
    rows = np.repeat(np.arange(1000), 3)
    cols = (np.tile([0, 1, 2], 1000) + np.repeat(np.arange(1000), 3) * 40)
    vals = np.full(3000, 25e6)
    blob = encode_zarray(rows, cols, vals)
    assert len(blob) < 0.1 * 3000 * 24
    r, c, v = decode_zarray(blob)
    np.testing.assert_array_equal(r, rows)
    np.testing.assert_array_equal(c, cols)


def test_zarray_native_matches_numpy_codec():
    """The C++ codec (native/zarray.cc) produces byte-identical streams to
    the numpy referee, in both directions, sorted or not."""
    import os
    import icebin_tpu.io.zarray as Z
    from icebin_tpu.ops import native as N
    if not N.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    n = 20000
    # unique keys so the sort is deterministic
    keys = rng.choice(10 * n, size=n, replace=False)
    rows, cols = keys // 300, keys % 300
    vals = rng.uniform(-1, 1, n)
    blob_nat = Z.encode_zarray(rows, cols, vals)
    r, c, v = Z.decode_zarray(blob_nat)
    # numpy fallback path (force): same bytes, same round trip
    N._tried, N._lib = True, None
    try:
        blob_py = Z.encode_zarray(rows, cols, vals)
        r2, c2, v2 = Z.decode_zarray(blob_py)
    finally:
        N._tried = False
    assert blob_nat == blob_py
    np.testing.assert_array_equal(r, r2)
    np.testing.assert_array_equal(c, c2)
    np.testing.assert_array_equal(v, v2)
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(r, rows[order])
    np.testing.assert_array_equal(c, cols[order])


def test_zarray_sorted_fast_path_identical():
    """Pre-sorted input (the producers' common case) skips the lexsort and
    yields the identical blob."""
    import icebin_tpu.io.zarray as Z
    rng = np.random.default_rng(1)
    n = 5000
    rows = np.sort(rng.integers(0, 500, n))
    cols = rng.integers(0, 800, n)
    vals = rng.uniform(0, 1, n)
    order = np.lexsort((cols, rows))
    rs, cs, vs = rows[order], cols[order], vals[order]
    assert Z.encode_zarray(rs, cs, vs) == Z.encode_zarray(rows[order],
                                                          cols[order],
                                                          vals[order])
    r, c, v = Z.decode_zarray(Z.encode_zarray(rs, cs, vs))
    np.testing.assert_array_equal(r, rs)
    np.testing.assert_array_equal(c, cs)
    np.testing.assert_array_equal(v, vs)
