"""TS (windows per pseudo-block) sweep at the round-5 configs.

TS=8 halves the per-chunk A1 dot COUNT at twice the contraction depth
(K = 8*ts = 64): same tile bytes and near-same padding (real blocks
average 5.6 windows at Greenland 5 km / 6.6 at Antarctica), but each MXU
op does twice the work -- if the A1 cost is op-count-bound (it is: the
r4 bisect measured ~6% utilization), this is free speed.  PSC halves
alongside so C2 = PSC*ts (and the band-matmul cost) stays fixed.
Run: python tools/probe_ts.py [greenland|antarctica]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def greenland_weighted():
    from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams
    specA = modele_lonlat_grid(144, 90)
    specI = GridSpecXY(
        xb=np.linspace(-650e3, 870e3, 305),
        yb=np.linspace(-3350e3, -630e3, 545),
        projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 "
                   "+ellps=WGS84")
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
    gr.add_sheet("g", specI, subdiv=2)
    c = specI.cell_centers()
    ex = (np.ptp(specI.xb) / 2.2, np.ptp(specI.yb) / 2.2)
    r2 = (((c[:, 0] - specI.xb.mean()) / ex[0]) ** 2
          + (((c[:, 1] - specI.yb.mean()) / ex[1]) ** 2))
    elev = np.where(r2 < 1.0, 3500.0 * (1.0 - r2), np.nan)
    return gr.regrid_matrices("g", elev).matrix(
        "EvI", RegridParams(scale=True, correctA=True))


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from icebin_tpu.ops import tuning

    which = sys.argv[1] if len(sys.argv) > 1 else "greenland"
    if which == "antarctica":
        from tools.probe_ant_nv import build_weighted
        Me = build_weighted()
        n1, n2 = 8, 56
    else:
        Me = greenland_weighted()
        n1, n2 = 64, 576

    rng = np.random.default_rng(0)
    f_all = rng.uniform(0.5, 1.5, (16, Me.shape[1]))
    # independent f64 oracle (comparing configs against each other hides
    # which one is wrong)
    import scipy.sparse as sp
    Msp = sp.coo_matrix((Me.vals, (Me.rows, Me.cols)),
                        shape=Me.shape).tocsr()
    winv = np.where(Me.wM != 0,
                    1.0 / np.where(Me.wM == 0, 1, Me.wM), 0.0)
    ref = (Msp @ f_all.T).T * winv[None, :]
    for ts, psc in ((4, 128), (8, 64), (8, 128), (2, 256)):
        try:
            tuning.apply_tunables()
            pb.PS_CHUNK = psc
            pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=16,
                                         ts=ts)
            fb = pm.ice_to_blocked(jnp.asarray(f_all, jnp.float32))
            e3 = pb.apply_small_blocked(pm, fb, scale=True)
            out = pm.e3_to_small(e3)
            err = (np.nanmax(np.abs(np.asarray(out) - ref))
                   / np.abs(ref).max())
            assert err < 1e-4, err         # vs the f64 oracle
            pb.apply_ice_blocked(pm, e3, scale=True).block_until_ready()

            def mk(n, _pm=pm, _e3=e3):
                @jax.jit
                def chain(p, e0):
                    def body(c, _):
                        fI = pb.apply_ice_blocked(p, c, scale=True)
                        return pb.apply_small_blocked(p, fI,
                                                      scale=True), ()
                    c, _ = jax.lax.scan(body, e0, None, length=n)
                    return c.sum()
                return lambda: chain(_pm, _e3)

            c1, c2 = mk(n1), mk(n2)
            float(c1()); float(c2())
            t1s, t2s = [], []
            for _ in range(8):
                t0 = time.perf_counter(); float(c1())
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(c2())
                t2s.append(time.perf_counter() - t0)
            per = (min(t2s) - min(t1s)) / (n2 - n1)
            print(f"ts={ts} psc={psc}: npspad={pm.npspad} "
                  f"nchunk={pm.nchunk} W8={pm.W8} "
                  f"tilesMB={pm.tiles2.size*4/1e6:.0f} "
                  f"rt={1e6*per:8.1f} us per-8={1e6*per/2:7.1f} us "
                  f"({pm.stream_bytes/per/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"ts={ts} psc={psc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    tuning.apply_tunables()


if __name__ == "__main__":
    main()
