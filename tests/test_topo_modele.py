"""TOPO pipeline + mismatched ModelE regridder tests (SURVEY.md section 3.4)."""
import numpy as np
import pytest

from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.hntr import hntr_spec
from icebin_tpu.regrid.matrices import RegridParams
from icebin_tpu.regrid.modele import GCMRegridderModelE
from icebin_tpu.topo.topo import (elevation_class_fields, make_topoo,
                                  merge_topo, synthetic_z1qx1n)

from helpers import toy_elevmask


def test_make_topoo_conserves_fractions():
    fine = hntr_spec(72, 46)
    specO = hntr_spec(36, 24)
    base = synthetic_z1qx1n(fine)
    topoo = make_topoo(base, specO)
    s = topoo.focean + topoo.flake + topoo.fgrnd + topoo.fgice
    np.testing.assert_allclose(s, 1.0, atol=1e-12)
    # global land area conserved
    a_fine = fine.cell_areas()
    a_O = specO.cell_areas()
    np.testing.assert_allclose(np.sum(topoo.focean * a_O),
                               np.sum(base.focean * a_fine), rtol=1e-12)
    np.testing.assert_allclose(np.sum(topoo.fgice * a_O),
                               np.sum(base.fgice * a_fine), rtol=1e-12)


def _toy_gr(nA=(8, 8), nI=(40, 40), scale=25e3):
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, nA[0] + 1),
                           latb=np.linspace(30.0, 70.0, nA[1] + 1))
    specI = GridSpecXY(xb=np.linspace(5.0 * scale, 35.0 * scale, nI[0] + 1),
                       yb=np.linspace(35.0 * scale, 65.0 * scale, nI[1] + 1),
                       projection=PlateCarree(scale=scale))
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1500.0, 3000.0])
    gr.add_sheet("s", specI, subdiv=1)
    return gr, specI


def test_merge_topo_updates_ice_region():
    gr, specI = _toy_gr()
    base = synthetic_z1qx1n(gr.specA)
    elev = toy_elevmask(specI, ice_frac=0.5)
    merged = merge_topo(base, gr, {"s": elev})
    s = merged.focean + merged.flake + merged.fgrnd + merged.fgice
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    rm = gr.regrid_matrices("s", elev)
    AvI = rm.matrix("AvI", RegridParams())
    touched = AvI.wM > 0
    assert touched.any()
    # fgice in the footprint equals covered-area fraction
    np.testing.assert_allclose(merged.fgice[touched],
                               np.minimum(AvI.wM / gr.specA.cell_areas(),
                                          1.0)[touched], rtol=1e-9)
    # zatmo in footprint within ice elevation range
    zs = merged.zatmo[touched]
    assert zs.max() <= np.nanmax(elev) + 1e-6
    # untouched cells unchanged
    np.testing.assert_array_equal(merged.zatmo[~touched], base.zatmo[~touched])


def test_elevation_class_fields():
    gr, specI = _toy_gr()
    elev = toy_elevmask(specI, ice_frac=0.5)
    fhc, elevE, underice = elevation_class_fields(gr, {"s": elev})
    assert fhc.shape == (gr.nhc, gr.nA)
    iced = fhc.sum(axis=0) > 0
    np.testing.assert_allclose(fhc.sum(axis=0)[iced], 1.0, rtol=1e-12)
    assert (underice[:, iced].max(axis=0) == 1).all()
    assert (underice[:, ~iced] == 0).all()
    ok = np.isfinite(elevE)
    assert ok.any()
    assert np.nanmax(elevE) <= np.nanmax(elev) + 1e-9


def ocean_pair(factor=2, n=(8, 8)):
    """A grid and an ocean grid refined by `factor` that nests exactly."""
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, n[0] + 1),
                           latb=np.linspace(30.0, 70.0, n[1] + 1))
    specO = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, factor * n[0] + 1),
                           latb=np.linspace(30.0, 70.0, factor * n[1] + 1))
    return specA, specO


def test_mismatched_equals_plain_when_masks_agree():
    specA, specO = ocean_pair()
    scale = 25e3
    specI = GridSpecXY(xb=np.linspace(5 * scale, 35 * scale, 41),
                       yb=np.linspace(35 * scale, 65 * scale, 41),
                       projection=PlateCarree(scale=scale))
    hc = [0.0, 500.0, 1500.0, 3000.0]
    grO = GCMRegridder(specO, hcdefs=hc)
    grO.add_sheet("s", specI, subdiv=1)
    focean = np.zeros(specO.ncells)          # all land, p == m
    mm = GCMRegridderModelE(grO, specA, focean, focean)
    elev = toy_elevmask(specI, ice_frac=0.5)
    f = mm.regrid_matrices("s", elev)
    M = f.matrix("AvI", RegridParams(scale=True, correctA=False))
    # conservation identity (construction invariant)
    x = np.cos(np.arange(M.shape[1]) * 0.1) + 2
    out = M.apply(x)
    lhs = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
    np.testing.assert_allclose(lhs, np.sum(x * M.Mw), rtol=1e-12)
    # equals the plain A-grid factory built directly over A
    grA = GCMRegridder(specA, hcdefs=hc)
    grA.add_sheet("s", specI, subdiv=1)
    MA = grA.regrid_matrices("s", elev).matrix(
        "AvI", RegridParams(scale=True, correctA=False))
    np.testing.assert_allclose(M.to_scipy().toarray(),
                               MA.to_scipy().toarray(), rtol=1e-9, atol=1e-3)


def test_mismatched_scales_weights_but_conserves():
    specA, specO = ocean_pair()
    scale = 25e3
    specI = GridSpecXY(xb=np.linspace(5 * scale, 35 * scale, 41),
                       yb=np.linspace(35 * scale, 65 * scale, 41),
                       projection=PlateCarree(scale=scale))
    grO = GCMRegridder(specO, hcdefs=[0.0, 1000.0, 3000.0])
    grO.add_sheet("s", specI, subdiv=1)
    rng = np.random.default_rng(0)
    foceanOp = np.clip(rng.uniform(-0.3, 0.6, specO.ncells), 0, 1)
    foceanOm = np.round(foceanOp)            # ModelE rounding
    mm = GCMRegridderModelE(grO, specA, foceanOp, foceanOm)
    elev = toy_elevmask(specI, ice_frac=0.5)
    f = mm.regrid_matrices("s", elev)
    for name in ("AvI", "EvI", "IvA", "IvE"):
        M = f.matrix(name, RegridParams(scale=True, correctA=False))
        x = rng.uniform(1, 2, M.shape[1])
        out = M.apply(x)
        lhs = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
        np.testing.assert_allclose(lhs, np.sum(x * M.Mw), rtol=1e-12)
    # scaled means unchanged by the diagonal (constant in == constant out)
    M = f.matrix("AvI", RegridParams(scale=True, correctA=False))
    out = M.apply(np.full(M.shape[1], 2.5))
    ok = np.isfinite(out)
    np.testing.assert_allclose(out[ok], 2.5, rtol=1e-12)
    # weights actually differ from the unscaled factory where masks disagree
    assert not np.allclose(mm.sAm, 1.0)


def test_mismatched_rejects_bad_inputs():
    specA, specO = ocean_pair()
    grO = GCMRegridder(specO, hcdefs=[0.0, 1000.0])
    with pytest.raises(ValueError):
        GCMRegridderModelE(grO, specA, np.zeros(specO.ncells),
                           np.full(specO.ncells, 0.5))  # not rounded
    bad = GridSpecLonLat(lonb=np.linspace(0, 40, 8),  # does not nest (7 vs 16)
                         latb=np.linspace(30, 70, 9))
    with pytest.raises(ValueError):
        GCMRegridderModelE(GCMRegridder(bad, hcdefs=[0.0, 1.0]), specA,
                           np.zeros(bad.ncells), np.zeros(bad.ncells))
