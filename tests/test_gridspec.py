import numpy as np
import pytest

from icebin_tpu.grid.proj import PlateCarree, from_proj4
from icebin_tpu.grid.spec import (Grid, GridSpecLonLat, GridSpecXY,
                                  modele_lonlat_grid)


def test_global_lonlat_areas_sum_to_sphere():
    spec = GridSpecLonLat(lonb=np.linspace(-180, 180, 73),
                          latb=np.linspace(-90, 90, 47), eq_rad=1.0)
    assert spec.ncells == 72 * 46
    np.testing.assert_allclose(spec.cell_areas().sum(), 4 * np.pi, rtol=1e-13)


def test_modele_g2x2_5():
    spec = modele_lonlat_grid(144, 90)
    assert spec.shape == (144, 90)
    # half-height polar rows capped at the poles
    np.testing.assert_allclose(spec.latb[0], -90)
    np.testing.assert_allclose(spec.latb[1], -89)
    np.testing.assert_allclose(spec.latb[2], -87)
    np.testing.assert_allclose(spec.latb[-1], 90)
    a = spec.cell_areas()
    np.testing.assert_allclose(a.sum(), 4 * np.pi * spec.eq_rad ** 2, rtol=1e-12)
    # cap-row cells: all equal, exact cap area / im
    cap = 2 * np.pi * spec.eq_rad ** 2 * (1 - np.sin(np.radians(89)))
    np.testing.assert_allclose(a[:144], cap / 144, rtol=1e-12)


def test_lonlat_polygons_subdiv():
    spec = GridSpecLonLat(lonb=[0, 10, 20], latb=[40, 50], eq_rad=1.0)
    p = spec.cell_polygons(subdiv=1)
    assert p.shape == (2, 4, 2)
    np.testing.assert_allclose(p[0], [[0, 40], [10, 40], [10, 50], [0, 50]])
    p2 = spec.cell_polygons(subdiv=3)
    assert p2.shape == (2, 12, 2)
    np.testing.assert_allclose(p2[0][:4], [[0, 40], [10 / 3, 40], [20 / 3, 40],
                                           [10, 40]])
    # CCW shoelace positive in lon/lat space
    x, y = p2[0][:, 0], p2[0][:, 1]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area > 0


def test_xy_spec():
    spec = GridSpecXY(xb=np.linspace(0, 100, 11), yb=np.linspace(0, 50, 6),
                      projection=PlateCarree())
    assert spec.shape == (10, 5)
    np.testing.assert_allclose(spec.cell_areas(), 100.0)
    r = spec.cell_rects()
    assert r.shape == (50, 4)
    np.testing.assert_allclose(r[0], [0, 0, 10, 10])
    # flat order is x-fastest (Fortran (i,j))
    np.testing.assert_allclose(r[1], [10, 0, 20, 10])
    np.testing.assert_allclose(r[10], [0, 10, 10, 20])
    c = spec.cell_centers()
    np.testing.assert_allclose(c[0], [5, 5])


def test_xy_proj4_string_coercion():
    spec = GridSpecXY(xb=[0, 5000], yb=[0, 5000],
                      projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84")
    ll = spec.cell_centers_ll()
    assert np.isfinite(ll).all()
    assert 80 < ll[0, 1] <= 90


def test_grid_mask():
    spec = GridSpecXY(xb=[0, 1, 2], yb=[0, 1], projection=PlateCarree())
    g = Grid(spec, mask=[True, False])
    assert g.realized().sum() == 1
    with pytest.raises(ValueError):
        Grid(spec, mask=[True])


def test_clipping_predicates():
    """Region clipping (reference SphericalClip/EuclidianClip parity)."""
    from icebin_tpu.grid.gen import (clipped_grid, euclidian_clip_box,
                                     euclidian_clip_circle,
                                     spherical_clip_cap,
                                     spherical_clip_lonlat)
    from icebin_tpu.grid.spec import modele_lonlat_grid

    spec = modele_lonlat_grid(36, 24)
    m = spherical_clip_lonlat(spec, -60.0, 10.0, 55.0, 85.0)  # Greenland-ish
    assert 0 < m.sum() < spec.ncells
    c = spec.cell_centers()
    assert (c[m, 1] >= 55.0).all()
    # lon wrap: window crossing the date line
    mw = spherical_clip_lonlat(spec, 150.0, -150.0, -10.0, 10.0)
    assert mw.any()
    lon = c[mw, 0]
    assert ((lon >= 150.0) | (lon <= -150.0)).all()
    cap = spherical_clip_cap(spec, -60.0, north=False)
    assert (c[cap, 1] <= -60.0).all() and cap.any()

    speci = GridSpecXY(xb=np.linspace(-100.0, 100.0, 21),
                       yb=np.linspace(-100.0, 100.0, 21),
                       projection=PlateCarree())
    box = euclidian_clip_box(speci, -50, -50, 50, 50)
    circ = euclidian_clip_circle(speci, 0, 0, 50)
    assert circ.sum() < box.sum() < speci.ncells
    g = clipped_grid(speci, circ)
    assert g.realized().sum() == circ.sum()
