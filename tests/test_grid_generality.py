"""Exchange-grid generality (VERDICT r2 item #4): lat-lon x lat-lon,
XY x XY (ice-to-ice), and generic-polygon x XY pairs, with conservation
vs the f64 oracle (reference: ``overlap`` intersects ANY two Grids,
including ``GridSpec_Generic`` [U GridGen_Exchange])."""
import numpy as np
import pytest

from icebin_tpu.grid.exchange import (make_exchange_grid,
                                      make_exchange_grid_lonlat,
                                      make_exchange_grid_xy)
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import (Grid, GridSpecGeneric, GridSpecLonLat,
                                  GridSpecXY, modele_lonlat_grid)


# -- lat-lon x lat-lon ---------------------------------------------------------

def test_lonlat_x_lonlat_global_exact():
    """Global 2x2.5 x 4x5: EXACT separable overlaps -- column sums equal
    the fine grid's spherical cell areas to f64 round-off WITHOUT repair,
    and row sums the coarse areas."""
    specA = modele_lonlat_grid(72, 46)
    specI = modele_lonlat_grid(144, 90)
    xg = make_exchange_grid(specA, specI, repair=False)
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-13)
    np.testing.assert_allclose(xg.area_sums_A(), specA.cell_areas(),
                               rtol=1e-13)
    # total = sphere area
    np.testing.assert_allclose(xg.area.sum(),
                               4 * np.pi * specI.eq_rad ** 2, rtol=1e-13)


def test_lonlat_x_lonlat_regional_offset():
    """Regional grids on different lon branches (0..40 vs -360 offsets)
    still pair correctly; covered fine cells close exactly."""
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 9),
                           latb=np.linspace(30.0, 70.0, 11))
    specI = GridSpecLonLat(lonb=np.linspace(-355.0, -325.0, 31),
                           latb=np.linspace(35.0, 65.0, 31))
    xg = make_exchange_grid(specA, specI, repair=False)
    # specI (5..35 E, 35..65 N) lies strictly inside specA: every fine
    # cell fully covered
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-13)
    assert xg.ncells > 0


def test_lonlat_x_lonlat_matches_hntr_matrix():
    """The exchange areas agree with the Hntr overlap matrix (the exact
    lat-lon regridder) entry by entry."""
    from icebin_tpu.regrid.hntr import Hntr
    specA = modele_lonlat_grid(36, 24)
    specI = modele_lonlat_grid(72, 46)
    xg = make_exchange_grid(specA, specI, repair=False).sort_by("A")
    h = Hntr(specA, specI)          # A from I: matrix (nA, nI) of areas
    M = h.M
    # build dicts keyed (iA, iI)
    got = {(int(a), int(i)): v for a, i, v in zip(xg.iA, xg.iI, xg.area)}
    want = {(int(r), int(c)): v for r, c, v in zip(M.rows, M.cols, M.vals)}
    assert set(got) == set(want)
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12)


def test_lonlat_masks():
    specA = modele_lonlat_grid(36, 24)
    specI = modele_lonlat_grid(72, 46)
    mI = np.zeros(specI.ncells, bool)
    mI[: specI.ncells // 2] = True
    xg = make_exchange_grid(Grid(specA), Grid(specI, mask=mI))
    assert (mI[xg.iI]).all()


# -- XY x XY (ice-to-ice) ------------------------------------------------------

SEARISE = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"


def test_xy_x_xy_nested_resolutions():
    """PISM-style 20 km coarse x 5 km fine in the SAME plane: every fine
    cell is fully covered by exactly one coarse cell (nested borders):
    exact without repair."""
    specC = GridSpecXY(xb=np.linspace(-200e3, 200e3, 21),
                       yb=np.linspace(-400e3, 0e3, 21),
                       projection=SEARISE)
    specF = GridSpecXY(xb=np.linspace(-200e3, 200e3, 81),
                       yb=np.linspace(-400e3, 0e3, 81),
                       projection=SEARISE)
    xg = make_exchange_grid(specC, specF, repair=False)
    assert xg.ncells == specF.ncells          # nested: 1 parent per cell
    np.testing.assert_allclose(xg.area_sums_I(), specF.cell_areas(),
                               rtol=1e-14)
    np.testing.assert_allclose(xg.area_sums_A(), specC.cell_areas(),
                               rtol=1e-14)


def test_xy_x_xy_offset_lattices():
    """Non-nested offset lattices: overlaps split cells; sums still exact
    on the covered interior."""
    specC = GridSpecXY(xb=np.linspace(0.0, 90e3, 10),
                       yb=np.linspace(0.0, 90e3, 10))
    specF = GridSpecXY(xb=np.linspace(13e3, 77e3, 33),
                       yb=np.linspace(11e3, 83e3, 25))
    xg = make_exchange_grid(specC, specF, repair=False)
    np.testing.assert_allclose(xg.area_sums_I(), specF.cell_areas(),
                               rtol=1e-14)
    # a fine cell straddling a coarse border has 2 parents
    counts = np.bincount(xg.iI, minlength=specF.ncells)
    assert counts.max() >= 2


def test_xy_x_xy_cross_projection():
    """Two ice grids in DIFFERENT stereographic projections exchange
    directly (round 4; VERDICT r3 missing #3): the subject grid's plane
    rings reproject through lon/lat into the clip grid's plane and run the
    standard clipper.  The subject fully covers the clip domain, so after
    repair every clip cell's column sums to its area; the raw (unrepaired)
    coverage already agrees to the subdivided-edge placement error."""
    # same physical region (Greenland), two different projection planes
    pA = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"
    pB = "+proj=stere +lat_0=90 +lat_ts=64 +lon_0=-45 +ellps=WGS84"
    a = GridSpecXY(xb=np.linspace(-400e3, 400e3, 17),
                   yb=np.linspace(-2800e3, -2000e3, 17), projection=pA)
    # the clip grid sits well inside A's footprint (reprojected)
    b = GridSpecXY(xb=np.linspace(-100e3, 150e3, 11),
                   yb=np.linspace(-2700e3, -2450e3, 11), projection=pB)
    xg_raw = make_exchange_grid(a, b, subdiv=4, engine="numpy",
                                repair=False)
    rel = np.abs(xg_raw.area_sums_I() - b.cell_areas()) / b.cell_areas()
    assert rel.max() < 5e-4            # subdiv=4 placement error bound
    xg = make_exchange_grid(a, b, subdiv=4, engine="numpy")
    np.testing.assert_allclose(xg.area_sums_I(), b.cell_areas(),
                               rtol=1e-12)
    # engine agreement: the XLA clipper matches the f64 oracle
    xg2 = make_exchange_grid(a, b, subdiv=4, engine="jax", repair=False)
    assert xg2.ncells == xg_raw.ncells
    np.testing.assert_allclose(xg2.area, xg_raw.area, rtol=2e-5,
                               atol=1e-6 * xg_raw.area.max())


def test_xy_x_xy_regrid_matrix_conservation():
    """Ice-to-ice regridding end to end: a WeightedMatrix built from the
    XY x XY exchange conserves mass fine -> coarse."""
    from icebin_tpu.regrid.sparse import WeightedMatrix
    specC = GridSpecXY(xb=np.linspace(0.0, 100e3, 6),
                       yb=np.linspace(0.0, 100e3, 6))
    specF = GridSpecXY(xb=np.linspace(0.0, 100e3, 41),
                       yb=np.linspace(0.0, 100e3, 41))
    xg = make_exchange_grid(specC, specF)
    M = WeightedMatrix(rows=xg.iA, cols=xg.iI, vals=xg.area,
                       shape=(specC.ncells, specF.ncells))
    rng = np.random.default_rng(0)
    f = rng.uniform(0.5, 1.5, specF.ncells)
    out = M.apply(f, scale=True)
    m_src = np.sum(f * M.Mw)
    m_dst = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
    assert abs(m_dst - m_src) / abs(m_src) < 1e-13


# -- generic polygons x XY -----------------------------------------------------

def _hex_polygons(centers, r):
    """(n, 6, 2) hexagon rings (degrees) around lon/lat centers."""
    ang = np.radians(np.arange(6) * 60.0 + 15.0)
    dx = r * np.cos(ang)
    dy = r * np.sin(ang)
    return np.stack([centers[:, None, 0] + dx[None, :],
                     centers[:, None, 1] + dy[None, :]], axis=-1)


def test_generic_x_xy_conservation_and_oracle():
    """Hexagonal generic cells clipped against an XY ice grid: the numpy
    f64 oracle engine and the XLA engine agree, and total overlap equals
    the hexagons' area where fully inside the ice domain."""
    scale = 25e3
    rng = np.random.default_rng(3)
    # non-overlapping hex centers (spacing > 2r) with sub-cell jitter, so
    # the per-ice-cell coverage bound below is meaningful
    gx, gy = np.meshgrid(np.arange(9.0, 31.0, 3.2),
                         np.arange(43.0, 67.0, 3.2))
    centers = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    centers = centers + rng.uniform(-0.3, 0.3, centers.shape)
    polys = _hex_polygons(centers, r=1.2)
    specG = GridSpecGeneric(polygons=polys)
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 65),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 81),
                       projection=PlateCarree(scale=scale))
    xg = make_exchange_grid(specG, specI, repair=False, engine="numpy")
    xg2 = make_exchange_grid(specG, specI, repair=False, engine="jax")
    assert xg.ncells == xg2.ncells
    np.testing.assert_allclose(xg2.area, xg.area, rtol=2e-5,
                               atol=1e-7 * xg.area.max())
    # hexagons are interior: per-A sums equal the exact hexagon plane area
    hex_area = 1.5 * np.sqrt(3.0) * (1.2 * scale) ** 2
    np.testing.assert_allclose(xg.area_sums_A(), hex_area, rtol=1e-9)
    # overlapping hexes never over-cover an ice cell beyond its area
    assert (xg.area_sums_I() <= specI.cell_areas() * (1 + 1e-9)).all()


def test_generic_triangles_x_xy():
    """Triangle fans (an unstructured-mesh stand-in) partitioning a square
    cover the ice cells under them exactly after repair."""
    scale = 10e3
    # 2 triangles per square over a 6x6 lattice of squares
    xs = np.linspace(10.0, 22.0, 7)
    ys = np.linspace(40.0, 52.0, 7)
    tris = []
    for j in range(6):
        for i in range(6):
            x0, x1 = xs[i], xs[i + 1]
            y0, y1 = ys[j], ys[j + 1]
            tris.append([[x0, y0], [x1, y0], [x1, y1]])
            tris.append([[x0, y0], [x1, y1], [x0, y1]])
    specG = GridSpecGeneric(polygons=np.asarray(tris))
    specI = GridSpecXY(xb=np.linspace(12.0 * scale, 20.0 * scale, 17),
                       yb=np.linspace(42.0 * scale, 50.0 * scale, 17),
                       projection=PlateCarree(scale=scale))
    xg = make_exchange_grid(specG, specI, engine="numpy")
    # the triangles tile the plane over the ice grid: full coverage
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-12)


def test_generic_grid_nc_roundtrip(tmp_path):
    """GridSpecGeneric survives the grid NetCDF schema (so the `overlap`
    CLI can consume generic grids like the reference's [U])."""
    from icebin_tpu.io.ncio import read_grid, write_grid
    polys = _hex_polygons(np.array([[10.0, 50.0], [14.0, 52.0]]), r=1.0)
    p = tmp_path / "generic.nc"
    write_grid(str(p), GridSpecGeneric(polygons=polys, name="hexes"))
    g = read_grid(str(p))
    assert isinstance(g.spec, GridSpecGeneric)
    assert g.spec.name == "hexes"
    np.testing.assert_array_equal(g.spec.polygons, polys)


def test_overlap_cli_lonlat_pair(tmp_path):
    """The overlap CLI handles a lat-lon x lat-lon pair end to end."""
    import subprocess, sys
    from icebin_tpu.io.ncio import read_exchange, write_grid
    a, b, o = (str(tmp_path / f) for f in ("a.nc", "b.nc", "x.nc"))
    write_grid(a, modele_lonlat_grid(36, 24))
    write_grid(b, modele_lonlat_grid(72, 46))
    r = subprocess.run([sys.executable, "-m", "icebin_tpu.cli.overlap",
                        a, b, o], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    xg = read_exchange(o)
    specI = modele_lonlat_grid(72, 46)
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-12)


# -- generic x generic (round 4: convex clip polygons) -------------------------

def _tri_grid(x0, x1, y0, y1, n):
    """2n^2 triangles tiling [x0,x1]x[y0,y1] (lon/lat degrees)."""
    xs = np.linspace(x0, x1, n + 1)
    ys = np.linspace(y0, y1, n + 1)
    tris = []
    for j in range(n):
        for i in range(n):
            a, b = xs[i], xs[i + 1]
            c, d = ys[j], ys[j + 1]
            tris.append([[a, c], [b, c], [b, d]])
            tris.append([[a, c], [b, d], [a, d]])
    return np.asarray(tris)


def test_generic_x_generic_conservation():
    """Generic x generic exchange (VERDICT r3 missing #3): triangle
    subjects tiling the plane, clipped against convex hexagonal GENERIC
    cells carrying their own projection.  Both polygon families are
    straight-edged in the (linear PlateCarree) plane, so the f64 oracle is
    exact: interior hexes' column sums equal their plane areas to 1e-12
    WITHOUT repair, and the XLA engine matches the oracle."""
    scale = 10e3
    subj = GridSpecGeneric(polygons=_tri_grid(10.0, 22.0, 40.0, 52.0, 8))
    centers = np.stack(np.meshgrid(np.arange(13.0, 19.1, 2.0),
                                   np.arange(43.0, 49.1, 2.0)),
                       axis=-1).reshape(-1, 2)
    clip = GridSpecGeneric(polygons=_hex_polygons(centers, r=0.8),
                           projection=PlateCarree(scale=scale),
                           name="hexclip")
    xg = make_exchange_grid(subj, clip, engine="numpy", repair=False)
    np.testing.assert_allclose(xg.area_sums_I(), clip.plane_areas(),
                               rtol=1e-12)
    xg2 = make_exchange_grid(subj, clip, engine="jax", repair=False)
    assert xg2.ncells == xg.ncells
    np.testing.assert_allclose(xg2.area, xg.area, rtol=2e-5,
                               atol=1e-7 * xg.area.max())
    # the pallas engine (interpret mode off-TPU) handles convex QUAD clip
    # cells (triangles pad; wider rings route to jax/numpy): rotated
    # squares as the clip side
    ang = np.radians([45.0, 135.0, 225.0, 315.0])
    quads = np.stack([centers[:, None, 0] + 0.9 * np.cos(ang)[None, :],
                      centers[:, None, 1] + 0.9 * np.sin(ang)[None, :]],
                     axis=-1)
    qclip = GridSpecGeneric(polygons=quads,
                            projection=PlateCarree(scale=scale))
    xq = make_exchange_grid(subj, qclip, engine="numpy", repair=False)
    xq3 = make_exchange_grid(subj, qclip, engine="pallas", repair=False)
    # f32 kernel noise flips sliver overlaps across the min-area cutoff,
    # so compare MEASURES (column sums / total), not the nnz pattern
    np.testing.assert_allclose(xq3.area_sums_I(), xq.area_sums_I(),
                               rtol=2e-4)
    np.testing.assert_allclose(xq3.area.sum(), xq.area.sum(), rtol=2e-5)


def test_generic_clip_concave_decomposes():
    """CONCAVE clip cells (round 5, VERDICT r4 missing #1): L-shaped and
    arrow-shaped generic cells ear-clip into convex pieces at build time
    and the piece overlaps sum back to the parent cell -- fully-covered
    concave cells close to their exact f64 plane areas WITHOUT repair."""
    scale = 1e3
    # an L (6 verts, one reflex corner) and an arrow (4 verts, one reflex)
    L = [[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0], [1.0, 3.0],
         [0.0, 3.0]]
    arrow = [[5.0, 0.0], [7.0, 1.0], [9.0, 0.0], [7.0, 3.0], [7.0, 3.0],
             [7.0, 3.0]]
    clip = GridSpecGeneric(polygons=np.asarray([L, arrow]),
                           projection=PlateCarree(scale=scale))
    subj = GridSpecGeneric(polygons=_tri_grid(-1.0, 10.0, -1.0, 4.0, 12))
    xg = make_exchange_grid(subj, clip, engine="numpy", repair=False)
    # exact concave plane areas (shoelace): L = 5, arrow/dart = 4 (deg^2)
    np.testing.assert_allclose(
        xg.area_sums_I(), np.array([5.0, 4.0]) * scale * scale, rtol=1e-12)
    # no duplicate (iA, iI) pairs leak out of the piece aggregation
    key = xg.iA * np.int64(xg.nI) + xg.iI
    assert len(np.unique(key)) == len(key)
    # XLA engine matches the oracle through the same decomposition
    xg2 = make_exchange_grid(subj, clip, engine="jax", repair=False)
    np.testing.assert_allclose(xg2.area_sums_I(), xg.area_sums_I(),
                               rtol=2e-5)


def test_ear_clip_unit():
    from icebin_tpu.grid.decompose import decompose_concave, ear_clip
    # L-shape: 4 triangles, areas summing to 5
    L = np.asarray([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0],
                    [1.0, 3.0], [0.0, 3.0]])
    tris = ear_clip(L)
    assert tris.shape == (4, 3, 2)
    a = 0.5 * np.abs(np.sum(
        tris[:, :, 0] * np.roll(tris[:, :, 1], -1, axis=1)
        - np.roll(tris[:, :, 0], -1, axis=1) * tris[:, :, 1], axis=1))
    np.testing.assert_allclose(a.sum(), 5.0, rtol=1e-14)
    assert (a > 0).all()
    # convex ring passes through decompose_concave untouched
    sq = np.asarray([[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                      [0.0, 1.0], [0.0, 1.0]]])
    pieces, p2c = decompose_concave(sq, np.array([1.0]))
    assert pieces.shape == sq.shape and (p2c == [0]).all()


def test_generic_hex_clip_pallas():
    """Hex clip cells run the PALLAS engine (round 5: VC_MAX >= 8 --
    VERDICT r4 missing #2) and match the f64 oracle on measures."""
    scale = 10e3
    subj = GridSpecGeneric(polygons=_tri_grid(10.0, 22.0, 40.0, 52.0, 8))
    centers = np.stack(np.meshgrid(np.arange(13.0, 19.1, 2.0),
                                   np.arange(43.0, 49.1, 2.0)),
                       axis=-1).reshape(-1, 2)
    clip = GridSpecGeneric(polygons=_hex_polygons(centers, r=0.8),
                           projection=PlateCarree(scale=scale),
                           name="hexclip")
    xg = make_exchange_grid(subj, clip, engine="numpy", repair=False)
    xp = make_exchange_grid(subj, clip, engine="pallas", repair=False)
    np.testing.assert_allclose(xp.area_sums_I(), xg.area_sums_I(),
                               rtol=2e-4)
    np.testing.assert_allclose(xp.area.sum(), xg.area.sum(), rtol=2e-5)


def test_lonlat_x_generic_clip():
    """A lat-lon GCM grid clipped against convex generic cells: the
    anything-x-generic direction of the dispatch."""
    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 11),
                           latb=np.linspace(35.0, 75.0, 11))
    centers = np.stack(np.meshgrid(np.arange(12.0, 28.1, 3.0),
                                   np.arange(45.0, 61.1, 3.0)),
                       axis=-1).reshape(-1, 2)
    clip = GridSpecGeneric(polygons=_hex_polygons(centers, r=1.0),
                           projection=PlateCarree(scale=scale))
    xg = make_exchange_grid(specA, clip, subdiv=4, engine="numpy")
    # A covers every hex: repaired column sums equal the hex plane areas
    np.testing.assert_allclose(xg.area_sums_I(), clip.plane_areas(),
                               rtol=1e-12)


def test_concave_reflex_at_pad_corner():
    """Review r5 regression: a concave cell whose REFLEX corner is
    adjacent to duplicate-padding (zero-length) edges must still be
    detected and decomposed -- the naive consecutive-edge cross test
    returned 0 there and the cell clipped as convex, silently losing 80%
    of its overlap."""
    from icebin_tpu.grid.decompose import convexity_defect
    # L-ring whose padding sits right at the reflex corner (1,1)
    L = np.asarray([[[1.0, 3.0], [0.0, 3.0], [0.0, 0.0], [3.0, 0.0],
                     [3.0, 1.0], [1.0, 1.0], [1.0, 1.0], [1.0, 1.0]]])
    assert convexity_defect(L, np.array([5.0])).all()
    clip = GridSpecGeneric(polygons=L, projection=PlateCarree(scale=1e3))
    subj = GridSpecGeneric(polygons=_tri_grid(-1.0, 4.0, -1.0, 4.0, 10))
    xg = make_exchange_grid(subj, clip, engine="numpy", repair=False)
    np.testing.assert_allclose(xg.area_sums_I(), [5.0e6], rtol=1e-12)
