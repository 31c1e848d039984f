"""Overlap-placement error vs subdiv (VERDICT r2 item #6).

The f64 conservation repair pins column sums; this measures the GEOMETRIC
placement error of approximating curved projected A-cell edges with
4*subdiv straight segments, against a subdiv=16 f64-oracle truth, on the
two named projections.  Prints the table recorded in docs/status.md and
pinned by tests/test_subdiv_accuracy.py.
"""
import numpy as np

from icebin_tpu.grid.exchange import make_exchange_grid
from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid


def main():
    specA = modele_lonlat_grid(144, 90)
    cases = {
        "searise_20km": GridSpecXY(
            xb=np.linspace(-650e3, 870e3, 77),
            yb=np.linspace(-3350e3, -630e3, 137),
            projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 "
                       "+ellps=WGS84"),
        "antarctica_40km": GridSpecXY(
            xb=np.linspace(-2800e3, 2800e3, 141),
            yb=np.linspace(-2800e3, 2800e3, 141),
            projection="+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 "
                       "+ellps=WGS84"),
    }
    for name, specI in cases.items():
        truth = make_exchange_grid(specA, specI, subdiv=16, engine="numpy",
                                   repair=False)
        tA = truth.area_sums_A()
        interior = tA > 0.9 * np.median(tA[tA > 0])
        covered = tA > 0
        print(f"-- {name}: covered={covered.sum()} interior={interior.sum()}")
        for sd in (1, 2, 4, 8):
            xg = make_exchange_grid(specA, specI, subdiv=sd, engine="numpy",
                                    repair=False)
            aA = xg.area_sums_A()
            ri = np.abs(aA[interior] - tA[interior]) / tA[interior]
            rc = np.abs(aA[covered] - tA[covered]) / tA[covered]
            print(f"   subdiv={sd}: interior max {ri.max():.3e} "
                  f"mean {ri.mean():.3e} | all-covered max {rc.max():.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
