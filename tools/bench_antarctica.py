"""Antarctica 5 km on the single-chip Pallas fast path (VERDICT r1 #6 done
criterion: apply within 2x of Greenland GB/s; sharded builder accepts it).

Pole-centered stereographic sheet, REAL 5 km resolution (1120x1120 cells,
1.25 M) vs ModelE 2x2.5.  Prints one JSON line with the round-trip
effective GB/s and the Greenland ratio.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.grid.spec import Grid, GridSpecXY, modele_lonlat_grid
    from icebin_tpu.ops.pallas_bdt import (apply_ice_blocked,
                                           apply_small_blocked,
                                           pallas_from_weighted)
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams

    EPSG3031 = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"
    specA = modele_lonlat_grid(144, 90)
    R = 2800e3
    n = int(2 * R / 5e3)                        # 1120 -> 1.25 M cells
    specI = GridSpecXY(xb=np.linspace(-R, R, n + 1),
                       yb=np.linspace(-R, R, n + 1),
                       projection=EPSG3031, name="antarctica_5km")

    t0 = time.perf_counter()
    xg = make_exchange_grid(specA, specI, subdiv=2)
    t_build = time.perf_counter() - t0
    gr = GCMRegridder(specA, hcdefs=[0.0, 1000.0, 2000.0, 3000.0, 4500.0])
    gr.add_sheet("aa", Grid(specI), exchange=xg)
    c = specI.cell_centers()
    r2 = (c[:, 0] ** 2 + c[:, 1] ** 2) / (2500e3) ** 2
    elev = np.where(r2 < 1.0, 4000.0 * (1.0 - r2), np.nan)
    t0 = time.perf_counter()
    rm = gr.regrid_matrices("aa", elev)
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    pm = pallas_from_weighted(Me, small_axis="rows", nv=8)
    t_mat = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    # conservation gate before timing
    f1 = rng.uniform(1.0, 2.0, Me.shape[1])
    fb1 = pm.ice_to_blocked(jnp.asarray(f1[None].repeat(8, 0), jnp.float32))
    e3 = apply_small_blocked(pm, fb1, scale=True)
    dev = np.asarray(pm.e3_to_small(e3)[0], np.float64)
    m_dev = np.sum(np.where(np.isfinite(dev), dev, 0.0) * np.asarray(Me.wM))
    m_src = np.sum(f1 * np.asarray(Me.Mw))
    rel = abs(m_dev - m_src) / abs(m_src)
    assert rel < 1e-5, f"conservation gate failed: {rel}"

    fb = pm.ice_to_blocked(jnp.asarray(
        rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))

    def mk(nrep):
        @jax.jit
        def chain(p, f0):
            def body(c, _):
                e3 = apply_small_blocked(p, c, scale=True)
                return apply_ice_blocked(p, e3, scale=True), ()
            c, _ = jax.lax.scan(body, f0, None, length=nrep)
            return c.sum()
        return chain

    N1, N2 = 8, 40
    c1, c2 = mk(N1), mk(N2)
    float(c1(pm, fb)); float(c2(pm, fb))
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter(); float(c1(pm, fb))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(pm, fb))
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / (N2 - N1)
    gbps = pm.stream_bytes / per / 1e9
    print(json.dumps({
        "metric": "antarctica5km_spmm_GBps", "value": round(gbps, 2),
        "unit": "GB/s",
        "rt_us": round(per * 1e6, 1),
        "n_ice_cells": int(pm.nice),
        "exchange_cells": int(xg.ncells),
        "build_seconds": round(t_build, 2),
        "matrix_seconds": round(t_mat, 2),
        "W8": pm.W8, "npspad": pm.npspad,
        "overflow": 0 if pm.ov_s is None else int(pm.ov_s.size),
        "conservation_rel": float(rel),
    }))


if __name__ == "__main__":
    main()
