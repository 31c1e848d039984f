"""Multi-sheet coupling (BASELINE config #5, CPU-mesh scale): Greenland and
Antarctica style sheets under one GCMRegridder/GCMCoupler, each conserving
independently; plus per-sheet matrices from one shared A grid."""
import numpy as np
import jax.numpy as jnp

from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler
from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.matrices import RegridParams

GREENLAND = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"
ANTARCTICA = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"


def build_two_sheet_regridder(res_km=100.0):
    specA = modele_lonlat_grid(72, 45)
    step = res_km * 1e3
    g = GridSpecXY(xb=np.arange(-650e3, 850e3 + 1, step),
                   yb=np.arange(-3350e3, -650e3 + 1, step),
                   projection=GREENLAND, name="greenland")
    a = GridSpecXY(xb=np.arange(-2800e3, 2800e3 + 1, step),
                   yb=np.arange(-2800e3, 2800e3 + 1, step),
                   projection=ANTARCTICA, name="antarctica")
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1500.0, 3000.0])
    gr.add_sheet("greenland", g, subdiv=2)
    gr.add_sheet("antarctica", a, subdiv=2)
    return gr


def test_two_sheets_share_one_A_grid():
    gr = build_two_sheet_regridder()
    P = RegridParams(scale=True, correctA=True)
    rng = np.random.default_rng(0)
    masks = {}
    for name in ("greenland", "antarctica"):
        spec = gr.sheets[name].specI
        c = spec.cell_centers()
        r2 = (((c[:, 0] - c[:, 0].mean()) / (np.ptp(c[:, 0]) / 2.2)) ** 2
              + ((c[:, 1] - c[:, 1].mean()) / (np.ptp(c[:, 1]) / 2.2)) ** 2)
        masks[name] = np.where(r2 < 1, 3000.0 * (1 - r2), np.nan)
    # the two sheets' AvI matrices touch DISJOINT A cells (N vs S hemisphere)
    touched = {}
    for name in masks:
        M = gr.regrid_matrices(name, masks[name]).matrix("AvI", P)
        x = rng.uniform(1, 2, M.shape[1])
        out = M.apply(x)
        lhs = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
        np.testing.assert_allclose(lhs, np.sum(x * M.Mw), rtol=1e-12)
        touched[name] = M.wM > 0
    assert not (touched["greenland"] & touched["antarctica"]).any()
    assert touched["greenland"].any() and touched["antarctica"].any()


def test_multisheet_transient_conservation():
    gr = build_two_sheet_regridder(res_km=150.0)
    cp = GCMCoupler(gr, CouplerConfig(dt=86400.0 * 30, regen_every=3,
                                      matrix_dtype=jnp.float64))
    rng = np.random.default_rng(1)

    def forcing(t, sheet):
        f = np.zeros((8, gr.nE))
        f[0] = 1e-5 * rng.uniform(0.5, 1.0, gr.nE)
        f[4] = -12.0
        return jnp.asarray(f)

    cp.run_transient(forcing, 4)
    rows = cp.ledger.to_rows()
    assert len(rows) == 4
    for r in rows:
        for name in ("greenland", "antarctica"):
            m_in = r[f"{name}.mass_in_E"]
            m_del = r[f"{name}.mass_delivered_I"]
            assert abs(m_in - m_del) / abs(m_in) < 1e-10
