"""Exchange-grid construction tests (BASELINE.json config #1 scale).

Conservation oracles (SURVEY.md section 4): per-ice-cell column sums equal
exact ice cell areas; total overlap area equals total ice area when the GCM
grid covers the ice domain."""
import numpy as np
import pytest

from icebin_tpu.grid.exchange import make_exchange_grid
from icebin_tpu.grid.proj import PlateCarree, from_proj4
from icebin_tpu.grid.spec import Grid, GridSpecLonLat, GridSpecXY, modele_lonlat_grid

SEARISE = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"


def toy_grids(nI=(100, 100), nA=(8, 10)):
    """Config #1: Cartesian ice grid overlaid on a lat-lon GCM grid via an
    identity (PlateCarree) projection, domains aligned."""
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, nA[0] + 1),
                           latb=np.linspace(30.0, 80.0, nA[1] + 1))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0, nI[0] + 1),
                       yb=np.linspace(30.0, 80.0, nI[1] + 1),
                       projection=PlateCarree())
    return specA, specI


@pytest.mark.parametrize("engine", ["numpy", "jax"])
def test_toy_exchange_conservation(engine):
    specA, specI = toy_grids()
    xg = make_exchange_grid(specA, specI, subdiv=1, engine=engine)
    areasI = specI.cell_areas()
    colsum = xg.area_sums_I()
    np.testing.assert_allclose(colsum, areasI, rtol=1e-12)
    np.testing.assert_allclose(xg.area.sum(), areasI.sum(), rtol=1e-12)
    # Interior ice cells fall inside exactly one A cell; boundary-straddling
    # cells split 2 or 4 ways. With 100/8 and 100/10 ratios, straddles exist.
    assert xg.ncells >= specI.ncells
    # A row sums bounded by A projected areas (PlateCarree: deg^2 areas)
    lonb, latb = specA.lonb, specA.latb
    areaA_plane = np.outer(np.diff(latb), np.diff(lonb)).reshape(-1)
    rowsum = xg.area_sums_A()
    assert (rowsum <= areaA_plane * (1 + 1e-12)).all()
    np.testing.assert_allclose(rowsum.sum(), areaA_plane.sum(), rtol=1e-12)


def test_exchange_parents_consistent():
    specA, specI = toy_grids((20, 20), (4, 5))
    xg = make_exchange_grid(specA, specI, subdiv=1)
    assert xg.iA.min() >= 0 and xg.iA.max() < specA.ncells
    assert xg.iI.min() >= 0 and xg.iI.max() < specI.ncells
    # each ice cell (5x5 per A cell -> aligned, exactly one parent)
    counts = np.bincount(xg.iI, minlength=specI.ncells)
    assert (counts >= 1).all()
    # centroids fall inside their ice cell rects
    r = specI.cell_rects()[xg.iI]
    assert (xg.centroid[:, 0] >= r[:, 0] - 1e-9).all()
    assert (xg.centroid[:, 0] <= r[:, 2] + 1e-9).all()


def test_masked_ice_cells_excluded():
    specA, specI = toy_grids((10, 10), (2, 2))
    mask = np.ones(specI.ncells, dtype=bool)
    mask[:30] = False
    xg = make_exchange_grid(specA, Grid(specI, mask=mask), subdiv=1)
    assert not np.isin(xg.iI, np.nonzero(~mask)[0]).any()
    np.testing.assert_allclose(xg.area.sum(),
                               specI.cell_areas()[mask].sum(), rtol=1e-12)


def test_greenland_style_stereo_exchange():
    """Small SeaRISE-style grid: 20-cell 50 km Greenland patch vs ModelE 2x2.5.
    Ice cells are fully covered by the global A grid -> exact column sums."""
    specA = modele_lonlat_grid(144, 90)
    # ~1000 km square around the projection center, 50 km cells
    specI = GridSpecXY(xb=np.linspace(-500e3, 500e3, 21),
                       yb=np.linspace(-2800e3, -1800e3, 21),
                       projection=SEARISE)
    xg = make_exchange_grid(specA, specI, subdiv=2)
    areasI = specI.cell_areas()
    np.testing.assert_allclose(xg.area_sums_I(), areasI, rtol=1e-12)
    # Even WITHOUT repair, column sums are exact to round-off: the projected
    # A polygons (straight edges, shared chords) tile the plane, so the
    # curvature approximation only moves area BETWEEN A parents, never in or
    # out of an ice cell.  (Repair still matters for masked/partial cases.)
    xg_raw = make_exchange_grid(specA, specI, subdiv=2, repair=False)
    rel = np.abs(xg_raw.area_sums_I() - areasI) / areasI
    assert rel.max() < 1e-12
    # The A-side SPLIT is what edge subdivision refines: per-A row sums move
    # by a small curvature-sized amount between subdiv=2 and subdiv=8.
    xg_raw8 = make_exchange_grid(specA, specI, subdiv=8, repair=False,
                                 engine="numpy")
    rA2 = xg_raw.area_sums_A()
    rA8 = xg_raw8.area_sums_A()
    nz = rA8 > 0
    split_shift = np.abs(rA2[nz] - rA8[nz]).max() / rA8[nz].max()
    assert 1e-12 < split_shift < 1e-3


def test_polar_cap_cell_covered():
    """An ice grid containing the projection pole: the A cap cell must supply
    the coverage there (cap ring polygon encircles the origin)."""
    specA = modele_lonlat_grid(36, 24)  # coarse global grid with caps
    specI = GridSpecXY(xb=np.linspace(-300e3, 300e3, 13),
                       yb=np.linspace(-300e3, 300e3, 13),
                       projection="+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84")
    xg = make_exchange_grid(specA, specI, subdiv=8)
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(), rtol=1e-12)
