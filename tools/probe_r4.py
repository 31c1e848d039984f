"""Round-4 profile: where do the config-#3 round trip's microseconds go?

Times (two-point, relay-latency-cancelling) on the real Greenland 5 km
EvI/IvE pair:
  - full apply_small_blocked / apply_ice_blocked / round trip
  - per-egroup kernel calls in isolation
and prints the pack geometry (npspad, nchunk, W8, egroups) so section
effects are visible.  Run on the TPU chip: python tools/probe_r4.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_pm():
    from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid
    from icebin_tpu.ops.pallas_bdt import pallas_from_weighted
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
    return pallas_from_weighted(Me, small_axis="rows", nv=8)


def timeit(fn, n1=64, n2=576, reps=6):
    import jax

    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                o = fn(c)
                return o, ()
            c, _ = jax.lax.scan(body, 0.0, None, length=n)
            return c
        return chain
    c1, c2 = mk(n1), mk(n2)
    float(c1()); float(c2())
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2())
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb

    pm = build_pm()
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad} nesec={pm.nesec} e_sec={pm.e_sec} "
          f"nblkpad={pm.nblkpad} sec_blocks={pm.sec_blocks} "
          f"nsmall={pm.nsmall} tilesMB={pm.tiles2.size * 4 / 1e6:.1f} "
          f"ov={0 if pm.ov_s is None else pm.ov_s.size}", flush=True)
    print(f"egroups={pm.egroups}", flush=True)
    print(f"bytes_small={pm.bytes_small/1e6:.1f}MB "
          f"bytes_ice={pm.bytes_ice/1e6:.1f}MB", flush=True)

    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    e3 = pb.apply_small_blocked(pm, fb, scale=True)

    def f_small(c):
        o = pb.apply_small_blocked(pm, fb * (1.0 + 0.0 * c), scale=True)
        return o[0, 0]

    def f_ice(c):
        o = pb.apply_ice_blocked(pm, e3 * (1.0 + 0.0 * c), scale=True)
        return o[0, 0, 0]

    def f_rt(c):
        e = pb.apply_small_blocked(pm, fb * (1.0 + 0.0 * c), scale=True)
        o = pb.apply_ice_blocked(pm, e, scale=True)
        return o[0, 0, 0]

    t_s = timeit(f_small)
    print(f"apply_small_blocked : {1e6*t_s:7.1f} us "
          f"({pm.bytes_small/t_s/1e9:.0f} GB/s)", flush=True)
    t_i = timeit(f_ice)
    print(f"apply_ice_blocked   : {1e6*t_i:7.1f} us "
          f"({pm.bytes_ice/t_i/1e9:.0f} GB/s)", flush=True)
    t_rt = timeit(f_rt)
    print(f"round trip          : {1e6*t_rt:7.1f} us "
          f"(sum={1e6*(t_s+t_i):.1f}; "
          f"{pm.stream_bytes/t_rt/1e9:.0f} GB/s)", flush=True)

    # per-egroup kernels in isolation (scale off, raw kernel cost)
    for g in pm.egroups:
        c0, c1, e, lo, hi = g
        tile_mb = (c1 - c0) * pb.PS_CHUNK * pm.tiles2.shape[1] * 128 * 4 / 1e6

        def f_g_small(c, _g=g):
            with jax.enable_x64(False):
                o = pb._mk_fused_small(pm, False, False, 3, _g)(
                    pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2,
                    fb * (1.0 + 0.0 * c), pm.w_off, pm.winvS_e3)
            return o[0, 0]

        def f_g_ice(c, _g=g):
            with jax.enable_x64(False):
                o = pb._mk_fused_ice(pm, False, False, _g)(
                    pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                    e3 * (1.0 + 0.0 * c), pm.tiles2, pm.w_offT,
                    pm.winvI_blk)
            return o[0, 0, 0]

        t1 = timeit(f_g_small)
        t2 = timeit(f_g_ice)
        print(f"group {g}: tiles {tile_mb:6.1f}MB  "
              f"small {1e6*t1:7.1f} us  ice {1e6*t2:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
