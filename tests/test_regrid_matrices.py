"""RegridMatrices factory: conservation, partition-of-unity, composition,
elevation classes, correctA, masking, smoothing (BASELINE configs #1-#3).

The conservation oracle (SURVEY.md section 4): for every matrix M with
weights {wM, Mw}, sum_dest apply(f)_dest * wM_dest == sum_src f_src * Mw_src
to f64 round-off; IvA o AvI round-trips preserve mass."""
import numpy as np
import pytest

from icebin_tpu.regrid.matrices import RegridParams, elevation_class_split

from helpers import greenland_patch, toy_elevmask, toy_regridder

PARAMS = RegridParams(scale=True, correctA=False)
PARAMS_CA = RegridParams(scale=True, correctA=True)


@pytest.fixture(scope="module")
def rm():
    gr = toy_regridder()
    elev = toy_elevmask(gr.sheets["toy"].specI)
    return gr.regrid_matrices("toy", elev), gr, elev


def mass(M, f_dest_means, side="dest"):
    w = M.wM if side == "dest" else M.Mw
    v = np.where(np.isfinite(f_dest_means), f_dest_means, 0.0)
    return np.sum(v * w)


@pytest.mark.parametrize("name", ["AvI", "IvA", "EvI", "IvE", "AvE", "EvA"])
@pytest.mark.parametrize("params", [PARAMS, PARAMS_CA])
def test_conservation_identity(rm, name, params):
    rmats, gr, elev = rm
    M = rmats.matrix(name, params)
    rng = np.random.default_rng(0)
    f = rng.uniform(1.0, 2.0, M.shape[1])
    out = M.apply(f, scale=True)
    lhs = mass(M, out)
    rhs = np.sum(f * M.Mw)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


@pytest.mark.parametrize("name", ["AvI", "IvA", "EvI", "IvE", "AvE", "EvA"])
def test_constant_preserved(rm, name):
    """Scaled regrid of a constant field is that constant wherever defined."""
    rmats, gr, elev = rm
    M = rmats.matrix(name, PARAMS)
    out = M.apply(np.full(M.shape[1], 7.25), scale=True)
    ok = np.isfinite(out)
    assert ok.any()
    np.testing.assert_allclose(out[ok], 7.25, rtol=1e-13)


def test_round_trip_mass(rm):
    """config #2 acceptance: IvA o AvI round trip preserves mass."""
    rmats, gr, elev = rm
    AvI = rmats.matrix("AvI", PARAMS)
    IvA = rmats.matrix("IvA", PARAMS)
    rng = np.random.default_rng(1)
    fI = rng.uniform(0.0, 3.0, AvI.shape[1])
    fA = AvI.apply(fI, scale=True)
    fI2 = IvA.apply(np.where(np.isfinite(fA), fA, 0.0), scale=True)
    m0 = np.sum(np.where(np.isfinite(fA), fA, 0.0) * AvI.wM)
    m1 = np.sum(np.where(np.isfinite(fI2), fI2, 0.0) * IvA.wM)
    np.testing.assert_allclose(m1, m0, rtol=1e-12)
    # and vs the original ice mass over covered cells
    mI = np.sum(fI * AvI.Mw)
    np.testing.assert_allclose(m0, mI, rtol=1e-12)


def test_round_trip_relative_error_north_star(rm):
    """North-star: conservation error < 1e-10 relative (BASELINE.md)."""
    rmats, gr, elev = rm
    for a_name, b_name in [("AvI", "IvA"), ("EvI", "IvE")]:
        Mab = rmats.matrix(a_name, PARAMS_CA)
        Mba = rmats.matrix(b_name, PARAMS_CA)
        f = np.cos(np.arange(Mab.shape[1]) * 0.01) + 2.0
        g = Mab.apply(f, scale=True)
        h = Mba.apply(np.where(np.isfinite(g), g, 0.0), scale=True)
        m0 = np.sum(f * Mab.Mw)
        m2 = np.sum(np.where(np.isfinite(h), h, 0.0) * Mba.wM)
        assert abs(m2 - m0) / abs(m0) < 1e-10


def test_EvI_refines_AvI(rm):
    """A<-E<-I equals A<-I exactly: E is a refinement of A."""
    rmats, gr, elev = rm
    AvI = rmats.matrix("AvI", PARAMS)
    EvI = rmats.matrix("EvI", PARAMS)
    AvE = rmats.matrix("AvE", PARAMS)
    rng = np.random.default_rng(2)
    fI = rng.uniform(1.0, 4.0, AvI.shape[1])
    fE = EvI.apply(fI, scale=True)
    fA_via_E = AvE.apply(np.where(np.isfinite(fE), fE, 0.0), scale=True)
    fA = AvI.apply(fI, scale=True)
    ok = np.isfinite(fA)
    np.testing.assert_allclose(fA_via_E[ok], fA[ok], rtol=1e-12)
    # weights also agree
    np.testing.assert_allclose(EvI.Mw, AvI.Mw, rtol=1e-13)


def test_elevation_class_split_unit():
    hc = [0.0, 100.0, 300.0]
    k0, k1, w0, w1 = elevation_class_split([50.0, 0.0, 150.0, 500.0, -20.0], hc)
    np.testing.assert_array_equal(k0, [0, 0, 1, 1, 0])
    np.testing.assert_array_equal(k1, [1, 1, 2, 2, 1])
    np.testing.assert_allclose(w0, [0.5, 1.0, 0.75, 0.0, 1.0])
    np.testing.assert_allclose(w1, [0.5, 0.0, 0.25, 1.0, 0.0])
    np.testing.assert_allclose(w0 + w1, 1.0)


def test_fhc_partition(rm):
    rmats, gr, elev = rm
    fhc = rmats.fhc()
    assert fhc.shape == (gr.nhc, gr.nA)
    iced = fhc.sum(axis=0) > 0
    np.testing.assert_allclose(fhc.sum(axis=0)[iced], 1.0, rtol=1e-12)
    elevE = rmats.elevE()
    ok = np.isfinite(elevE)
    assert ok.any()
    assert elevE[ok].min() >= np.nanmin(elev) - 1e-9
    assert elevE[ok].max() <= np.nanmax(elev) + 1e-9


def test_masking_excludes_nan_cells(rm):
    rmats, gr, elev = rm
    AvI = rmats.matrix("AvI", PARAMS)
    masked = ~np.isfinite(elev)
    assert (AvI.Mw[masked] == 0).all()
    assert AvI.Mw[~masked].min() > 0


def test_correctA_weights_native(rm):
    """With correctA, wM(AvI) of fully-iced A cells ~= native spherical area."""
    rmats, gr, elev = rm
    AvI = rmats.matrix("AvI", PARAMS_CA)
    AvI0 = rmats.matrix("AvI", PARAMS)
    native = gr.specA.cell_areas()
    proj = gr.sheets["toy"].areaA_proj
    full = np.isclose(AvI0.wM, proj, rtol=1e-9)  # fully ice-covered A cells
    assert full.any()
    np.testing.assert_allclose(AvI.wM[full], native[full], rtol=1e-9)


def test_G_space_matrices(rm):
    rmats, gr, elev = rm
    GvI = rmats.matrix("GvI", PARAMS)
    np.testing.assert_allclose(GvI.Mw, rmats.matrix("AvI", PARAMS).Mw,
                               rtol=1e-13)
    # one entry per exchange cell, value = overlap area
    assert GvI.nnz == len(rmats.o)
    np.testing.assert_allclose(GvI.wM.sum(), rmats.o.sum(), rtol=1e-13)


def test_apply_matches_scipy(rm):
    rmats, gr, elev = rm
    M = rmats.matrix("EvI", PARAMS)
    f = np.sin(np.arange(M.shape[1]) * 0.1) + 2.0
    sp = M.to_scipy() @ f
    w = M.wM
    expect = np.where(w > 0, sp / np.where(w > 0, w, 1.0), np.nan)
    got = M.apply(f, scale=True)
    ok = np.isfinite(expect)
    np.testing.assert_allclose(got[ok], expect[ok], rtol=1e-13)
    assert np.isnan(got[~ok]).all()


def test_smoothing_conserves_and_smooths():
    gr = toy_regridder(nI=(60, 60), nA=(6, 6))
    specI = gr.sheets["toy"].specI
    elev = toy_elevmask(specI)
    rmats = gr.regrid_matrices("toy", elev)
    dx = float(np.diff(specI.xb)[0])
    p_smooth = RegridParams(scale=True, correctA=False, sigma=(2 * dx, 2 * dx))
    IvA = rmats.matrix("IvA", PARAMS)
    IvA_s = rmats.matrix("IvA", p_smooth)
    rng = np.random.default_rng(3)
    fA = rng.uniform(0.0, 10.0, IvA.shape[1])
    out = IvA.apply(fA, scale=True)
    out_s = IvA_s.apply(fA, scale=True)
    # conservation identity holds for the smoothed matrix too
    lhs = np.sum(np.where(np.isfinite(out_s), out_s, 0.0) * IvA_s.wM)
    rhs = np.sum(fA * IvA_s.Mw)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # total mass wrt Mw matches the unsmoothed one
    np.testing.assert_allclose(np.sum(fA * IvA_s.Mw), np.sum(fA * IvA.Mw),
                               rtol=1e-12)
    # and the smoothed field is smoother (smaller neighbor differences)
    def roughness(v):
        g = np.where(np.isfinite(v), v, 0.0).reshape(specI.ny, specI.nx)
        return np.abs(np.diff(g, axis=0)).sum() + np.abs(np.diff(g, axis=1)).sum()
    assert roughness(out_s) < roughness(out)


def test_greenland_full_matrix_set():
    """config #2: SeaRISE Greenland 50km vs ModelE 2x2.5, 5 ECs."""
    specA, specI = greenland_patch(50.0)
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    gr = GCMRegridder(specA, hcdefs=[0., 500., 1000., 2000., 3500.])
    gr.add_sheet("greenland", specI, subdiv=2)
    elev = toy_elevmask(specI, ice_frac=0.6)
    rmats = gr.regrid_matrices("greenland", elev)
    rng = np.random.default_rng(4)
    for name in ["AvI", "IvA", "EvI", "IvE", "AvE", "EvA"]:
        M = rmats.matrix(name, PARAMS_CA)
        f = rng.uniform(1.0, 2.0, M.shape[1])
        out = M.apply(f, scale=True)
        lhs = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
        np.testing.assert_allclose(lhs, np.sum(f * M.Mw), rtol=1e-12)


def test_smoothing_sigma3_and_ice_source():
    """Full reference sigma[3] semantics (VERDICT r1 item #10): the third
    component limits smoothing across ELEVATION differences, and smoothing
    composes onto ice-SOURCE (AvI) matrices conservatively."""
    gr = toy_regridder(nI=(60, 60), nA=(6, 6))
    specI = gr.sheets["toy"].specI
    # two flat plateaus at 500 m and 2500 m split down the middle: a tight
    # sigma_z must stop mass mixing between them
    c = specI.cell_centers()
    elev = np.where(c[:, 0] < np.median(c[:, 0]), 500.0, 2500.0)
    rmats = gr.regrid_matrices("toy", elev)
    dx = float(np.diff(specI.xb)[0])
    p2 = RegridParams(scale=True, correctA=False, sigma=(3 * dx, 3 * dx))
    p3 = RegridParams(scale=True, correctA=False,
                      sigma=(3 * dx, 3 * dx, 50.0))
    S2 = rmats._smoothing_fn(p2.sigma)
    S3 = rmats._smoothing_fn(p3.sigma)
    f = np.where(elev > 1000.0, 1.0, 0.0)   # indicator of the high plateau
    out2 = S2 @ f
    out3 = S3 @ f
    # sigma_z=50 m across a 2000 m step: NO leakage to the low side
    low = elev < 1000.0
    assert np.abs(out3[low]).max() < 1e-12
    assert np.abs(out2[low]).max() > 1e-3    # 2-sigma smoother does leak
    # conservation of both (area measure)
    a = specI.cell_areas()
    np.testing.assert_allclose((out3 * a).sum(), (f * a).sum(), rtol=1e-12)

    # ice-SOURCE smoothing: AvI with sigma conserves + equals AvI o S
    AvI_s = rmats.matrix("AvI", p3)
    AvI = rmats.matrix("AvI", RegridParams(scale=True, correctA=False))
    rng = np.random.default_rng(5)
    fI = rng.uniform(0.0, 5.0, AvI.shape[1])
    out_s = AvI_s.apply(fI, scale=True)
    lhs = np.sum(np.where(np.isfinite(out_s), out_s, 0.0) * AvI_s.wM)
    np.testing.assert_allclose(lhs, np.sum(fI * AvI_s.Mw), rtol=1e-12)
    # unscaled composition identity: (M o S) f == M (S f) exactly (the
    # scaled outputs differ by design -- wM follows the composed matrix)
    ref_u = AvI.apply(np.asarray(S3 @ fI), scale=False)
    out_u = AvI_s.apply(fI, scale=False)
    np.testing.assert_allclose(out_u, ref_u, rtol=1e-12)
    # matrices with no ice side reject sigma (reference constraint)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ice side"):
        rmats.matrix("AvE", p3)


def test_smoothing_nonuniform_lattice():
    """Non-uniform border spacings (round-1 raised NotImplementedError):
    conservation in the true area measure + identity off-ice rows."""
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecXY
    from icebin_tpu.ops.smoother import smoothing_matrix
    rng = np.random.default_rng(11)
    xb = np.cumsum(np.concatenate([[0.0], rng.uniform(0.5, 2.0, 40)]))
    yb = np.cumsum(np.concatenate([[0.0], rng.uniform(0.5, 2.0, 36)]))
    specI = GridSpecXY(xb=xb, yb=yb, projection=PlateCarree())
    n = specI.ncells
    mask = rng.uniform(size=n) < 0.8
    S = smoothing_matrix(specI, mask, sigma=(2.0, 2.0))
    a = specI.cell_areas()
    f = rng.uniform(0.0, 3.0, n)
    out = S @ f
    np.testing.assert_allclose((out * a).sum(), (f * a).sum(), rtol=1e-12)
    # off-ice rows are identity
    np.testing.assert_array_equal(out[~mask], f[~mask])
    # on-ice: actually smooths (mixes neighbors)
    assert not np.allclose(out[mask], f[mask])
