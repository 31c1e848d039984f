"""Shared fixtures: toy grids (BASELINE config #1) and a SeaRISE-style
Greenland patch (config #2 scale) with a synthetic ice-elevation field."""
import numpy as np

from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY, modele_lonlat_grid
from icebin_tpu.regrid.gcmregridder import GCMRegridder

SEARISE = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"


def toy_grids(nI=(100, 100), nA=(8, 10)):
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, nA[0] + 1),
                           latb=np.linspace(30.0, 80.0, nA[1] + 1))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0, nI[0] + 1),
                       yb=np.linspace(30.0, 80.0, nI[1] + 1),
                       projection=PlateCarree())
    return specA, specI


def toy_regridder(nI=(100, 100), nA=(8, 10), hcdefs=(0.0, 500.0, 1000.0,
                                                     2000.0, 3000.0),
                  engine="numpy", subdiv=1):
    specA, specI = toy_grids(nI, nA)
    gr = GCMRegridder(specA, hcdefs=hcdefs)
    gr.add_sheet("toy", specI, subdiv=subdiv, engine=engine)
    return gr


def toy_elevmask(specI, ice_frac=0.8, seed=0):
    """Synthetic dome elevation over a random-ish ice mask."""
    c = specI.cell_centers()
    x = (c[:, 0] - c[:, 0].mean()) / (np.ptp(c[:, 0]) / 2 + 1e-30)
    y = (c[:, 1] - c[:, 1].mean()) / (np.ptp(c[:, 1]) / 2 + 1e-30)
    r2 = x ** 2 + y ** 2
    elev = 3000.0 * np.maximum(0.0, 1.0 - r2)
    rng = np.random.default_rng(seed)
    icy = (r2 < ice_frac) & (rng.uniform(size=len(r2)) < 0.97)
    return np.where(icy, elev, np.nan)


def greenland_patch(res_km=50.0, nA=(144, 90)):
    """SeaRISE-style stereographic Greenland window vs ModelE 2x2.5."""
    specA = modele_lonlat_grid(*nA)
    nx = int(1500e3 / (res_km * 1e3))
    ny = int(2700e3 / (res_km * 1e3))
    specI = GridSpecXY(xb=np.linspace(-650e3, 850e3, nx + 1),
                       yb=np.linspace(-3350e3, -650e3, ny + 1),
                       projection=SEARISE, name=f"greenland_{res_km:g}km")
    return specA, specI
