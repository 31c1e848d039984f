"""subdiv=4 accuracy tier on the REAL config-#3 matrices (VERDICT r4
next #8): records build time, apply round trip, and placement error as
NUMBERS so the accuracy/speed trade is a table row, not a claim.

For subdiv in (2, 4): build the 5 km Greenland exchange grid on the TPU
Pallas clipper (V0=16 covers the subdiv=4 16-gon subjects), assemble the
EvI/IvE pack at the bench NV, time the bench-identical two-point round
trip, and measure interior A-cell placement error vs a subdiv=16 f64
oracle.  Run: python tools/subdiv_tier.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.grid.spec import Grid, GridSpecXY, modele_lonlat_grid
    from icebin_tpu.ops import pallas_bdt as pb
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams

    specA = modele_lonlat_grid(144, 90)
    specI = GridSpecXY(
        xb=np.linspace(-650e3, 870e3, 305),
        yb=np.linspace(-3350e3, -630e3, 545),
        projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 "
                   "+ellps=WGS84")
    c = specI.cell_centers()
    ex = (np.ptp(specI.xb) / 2.2, np.ptp(specI.yb) / 2.2)
    r2 = (((c[:, 0] - specI.xb.mean()) / ex[0]) ** 2
          + (((c[:, 1] - specI.yb.mean()) / ex[1]) ** 2))
    elev = np.where(r2 < 1.0, 3500.0 * (1.0 - r2), np.nan)

    # placement truth: subdiv=16 f64 oracle at 20 km (the oracle at 5 km
    # costs ~1 h host-side; placement error is resolution-independent to
    # first order -- same protocol as tools/subdiv_error.py)
    spec20 = GridSpecXY(xb=np.linspace(-650e3, 870e3, 77),
                        yb=np.linspace(-3350e3, -630e3, 137),
                        projection=specI.projection)
    truth = make_exchange_grid(specA, spec20, subdiv=16, engine="numpy",
                               repair=False)
    tA = truth.area_sums_A()
    interior = tA > 0.9 * np.median(tA[tA > 0])

    for sd in (2, 4):
        xg20 = make_exchange_grid(specA, spec20, subdiv=sd, engine="numpy",
                                  repair=False)
        aA = xg20.area_sums_A()
        perr = float(np.max(np.abs(aA[interior] - tA[interior])
                            / tA[interior]))

        make_exchange_grid(specA, specI, subdiv=sd)      # warm compiles
        t0 = time.perf_counter()
        xg = make_exchange_grid(specA, specI, subdiv=sd)
        t_build = time.perf_counter() - t0

        gr = GCMRegridder(specA,
                          hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
        gr.add_sheet("g", Grid(specI), exchange=xg, subdiv=sd)
        t0 = time.perf_counter()
        Me = gr.regrid_matrices("g", elev).matrix(
            "EvI", RegridParams(scale=True, correctA=True))
        t_mat = time.perf_counter() - t0
        pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=16)
        rng = np.random.default_rng(0)
        fb = pm.ice_to_blocked(jnp.asarray(
            rng.uniform(0.5, 1.5, (16, pm.nice)), jnp.float32))
        e3 = pb.apply_small_blocked(pm, fb, scale=True)

        def mk(n, _pm=pm, _e3=e3):
            @jax.jit
            def chain(p, e0):
                def body(cc, _):
                    fI = pb.apply_ice_blocked(p, cc, scale=True)
                    return pb.apply_small_blocked(p, fI, scale=True), ()
                cc, _ = jax.lax.scan(body, e0, None, length=n)
                return cc.sum()
            return lambda: chain(_pm, _e3)

        c1, c2 = mk(64), mk(576)
        float(c1()); float(c2())
        t1s, t2s = [], []
        for _ in range(6):
            t0 = time.perf_counter(); float(c1())
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2())
            t2s.append(time.perf_counter() - t0)
        per = (min(t2s) - min(t1s)) / 512
        print(f"subdiv={sd}: placement_err={perr:.2e}  "
              f"build={t_build:.2f}s  matrices={t_mat:.2f}s  "
              f"pairs={xg.ncells}  rt_per8={1e6*per/2:.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
