"""NV sweep on the REAL config-#3 matrix: does widening the field batch
(more output sublanes for the A1 contraction, amortized tile stream)
close the dest-ice MXU gap the r4 bisect attributed?

For nv in {8, 16, 32, 64}: pack the same EvI matrix at that NV (section
sizes scaled to keep VMEM in budget), two-point-time the bench-identical
round-trip chain, and report BOTH the raw per-round-trip time and the
per-8-field-group equivalent (rt_us * 8 / nv) -- the apples-to-apples
number vs the r4 148 us.  Run: python tools/probe_nv.py [nv ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from icebin_tpu.ops.pallas_bdt import pallas_from_weighted
    from tools.probe_r4 import build_pm  # noqa: F401 (build path below)

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

    # (nv, sec_blocks, e_sec): None = NV-aware default
    cfgs = [(8, None, None), (16, None, None), (32, None, None),
            (64, None, None), (32, 1024, 2048), (64, 1024, 2048)]
    if len(sys.argv) > 1:
        cfgs = [c for c in cfgs if c[0] in {int(a) for a in sys.argv[1:]}]
    rng = np.random.default_rng(0)
    f8 = rng.uniform(0.5, 1.5, (8, Me.shape[1]))

    # f64 host reference for the 8 real fields (conservation + accuracy)
    import scipy.sparse as sp
    M = sp.coo_matrix((Me.vals, (Me.rows, Me.cols)), shape=Me.shape).tocsr()
    winv = np.where(Me.wM != 0, 1.0 / np.where(Me.wM == 0, 1, Me.wM), 0.0)
    ref_small = (M @ f8.T).T * winv[None, :]

    for nv, sec, esec in cfgs:
        try:
            pm = pallas_from_weighted(Me, small_axis="rows", nv=nv,
                                      sec_blocks=sec, e_sec=esec)
            f = np.zeros((nv, Me.shape[1]))
            for k in range(nv):
                f[k] = f8[k % 8]
            fb = pm.ice_to_blocked(jnp.asarray(f, jnp.float32))
            print(f"nv={nv} sec={pm.sec_blocks} e_sec={pm.e_sec}: "
                  f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
                  f"NWpad={pm.NWpad} nblkpad={pm.nblkpad} "
                  f"groups={len(pm.egroups)} "
                  f"streamMB={pm.stream_bytes/1e6:.1f}", flush=True)

            # accuracy check (dest-small; dest-ice HIGHEST contract)
            e3 = pb.apply_small_blocked(pm, fb, scale=True)
            got = pm.e3_to_small(e3)[:8]
            scale = np.abs(ref_small).max()
            err = np.nanmax(np.abs(np.asarray(got) - ref_small)) / scale
            pb.apply_ice_blocked(pm, e3, scale=True).block_until_ready()
            print(f"  small err={err:.2e}", flush=True)

            def mk(n):
                @jax.jit
                def chain():
                    def body(c, _):
                        fI = pb.apply_ice_blocked(pm, c, scale=True)
                        return pb.apply_small_blocked(pm, fI,
                                                      scale=True), ()
                    c, _ = jax.lax.scan(body, e3, None, length=n)
                    return c.sum()
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
            per8 = per * 8 / nv
            print(f"  rt={1e6*per:7.1f} us   per-8-field rt="
                  f"{1e6*per8:6.1f} us  "
                  f"({pm.stream_bytes/per/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"  nv={nv} sec={sec}: FAILED {type(e).__name__}: "
                  f"{str(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
