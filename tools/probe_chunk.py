"""PS_CHUNK / ICE_BATCHED / SMALL_SLOTS sweep at the post-VMEM-unlock
configs (round 5).  The 16 MB scoped-VMEM ceiling boxed every earlier
chunk-size sweep; with VMEM_LIMIT raised the working set can grow, so the
ps_chunk=128 choice must be re-earned.  Run: python tools/probe_chunk.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from icebin_tpu.ops import tuning

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
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    rng = np.random.default_rng(0)

    # (nv, ps_chunk, ice_batched)
    cfgs = [(16, 128, False), (16, 256, False), (16, 512, False),
            (16, 128, True), (64, 128, True), (64, 256, False),
            (8, 256, False)]
    for nv, psc, batched in cfgs:
        try:
            tuning.apply_tunables()           # reset table values
            pb.PS_CHUNK = psc
            pb.ICE_BATCHED = batched
            pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=nv)
            f = rng.uniform(0.5, 1.5, (nv, Me.shape[1]))
            fb = pm.ice_to_blocked(jnp.asarray(f, jnp.float32))
            e3 = pb.apply_small_blocked(pm, fb, scale=True)
            pb.apply_ice_blocked(pm, e3, scale=True).block_until_ready()

            def mk(n):
                @jax.jit
                def chain():
                    def body(cc, _):
                        fI = pb.apply_ice_blocked(pm, cc, scale=True)
                        return pb.apply_small_blocked(pm, fI,
                                                      scale=True), ()
                    cc, _ = jax.lax.scan(body, e3, None, length=n)
                    return cc.sum()
                return chain

            n1, n2 = (64, 576) if nv <= 16 else (32, 288)
            c1, c2 = mk(n1), mk(n2)
            float(c1()); float(c2())
            t1s, t2s = [], []
            for _ in range(8):
                t0 = time.perf_counter(); float(c1())
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(c2())
                t2s.append(time.perf_counter() - t0)
            per = (min(t2s) - min(t1s)) / (n2 - n1)
            print(f"nv={nv} psc={psc} batched={int(batched)}: "
                  f"W8={pm.W8} nchunk={pm.nchunk} "
                  f"rt={1e6*per:7.1f} us  per-8={1e6*per*8/nv:6.1f} us  "
                  f"({pm.stream_bytes/per/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"nv={nv} psc={psc} b={int(batched)}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
    pb.PS_CHUNK = 128
    pb.ICE_BATCHED = False


if __name__ == "__main__":
    main()
