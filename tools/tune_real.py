"""Validate tunables candidates on the REAL config-#3 (Greenland 5 km)
matrix with the bench's two-point timing (relay latency cancels exactly,
unlike tools/autotune.py's chain timing which rides the noise).

    python tools/tune_real.py [psc,sec ...]     # default: the shortlist
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_weighted():
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
    gr.add_sheet("greenland", specI, subdiv=2)
    c = specI.cell_centers()
    ex = (np.ptp(specI.xb) / 2.2, np.ptp(specI.yb) / 2.2)
    r2 = (((c[:, 0] - specI.xb.mean()) / ex[0]) ** 2
          + (((c[:, 1] - specI.yb.mean()) / ex[1]) ** 2))
    elev = np.where(r2 < 1.0, 3500.0 * (1.0 - r2), np.nan)
    rm = gr.regrid_matrices("greenland", elev)
    return rm.matrix("EvI", RegridParams(scale=True, correctA=True))


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb

    cands = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or \
        [(128, 1024), (128, 512), (256, 512), (64, 512), (256, 768)]
    Me = build_weighted()
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (8, Me.shape[1])), jnp.float32)

    def two_point(pm, fb, n1=64, n2=576):
        def mk(n):
            @jax.jit
            def chain(p, f0):
                def body(c, _):
                    e3 = pb.apply_small_blocked(p, c, scale=True)
                    return pb.apply_ice_blocked(p, e3, scale=True), ()
                c, _ = jax.lax.scan(body, f0, None, length=n)
                return c.sum()
            return chain
        c1, c2 = mk(n1), mk(n2)
        float(c1(pm, fb)); float(c2(pm, fb))
        t1s, t2s = [], []
        for _ in range(8):
            t0 = time.perf_counter(); float(c1(pm, fb))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2(pm, fb))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (n2 - n1)

    ref = None
    for (psc, sec) in cands:
        pb.PS_CHUNK, pb.SEC_BLOCKS = psc, sec
        pb._TUNED = True
        try:
            pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=8)
            fb = pm.ice_to_blocked(fI)
            out = np.asarray(pb.apply_small_blocked(pm, fb, scale=True))
            if ref is None:
                ref = out
            err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
            dt = two_point(pm, fb)
        except Exception as exc:
            print(f"psc={psc:4d} sec={sec:5d}: skip "
                  f"({str(exc).splitlines()[0][:80]})", flush=True)
            continue
        print(f"psc={psc:4d} sec={sec:5d}: rt {1e6*dt:7.1f} us  "
              f"({pm.stream_bytes/dt/1e9:5.0f} GB/s, "
              f"{pm.stream_bytes/1e6:5.1f} MB, W8={pm.W8}, "
              f"nchunk={pm.nchunk})  maxrel-vs-first={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
