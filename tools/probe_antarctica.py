"""Per-kernel timing at Antarctica-5km scale on the round-3 FUSED kernels
(one pallas_call per direction; see ops/pallas_bdt.py docstring for the
design history -- the round-2 two-kernel path's HBM interchange stalled
this sheet at ~0.43x Greenland GB/s)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from icebin_tpu.ops import pallas_bdt as pb

N1, N2 = 8, 40


def timeit(tag, fn, *consts, carry, bytes_=None):
    def mk(n):
        @jax.jit
        def chain(cs, f0):
            def body(c, _):
                out = fn(*cs, c)
                return f0 * (1.0 + jnp.sum(out) * 1e-37), ()
            c, _ = jax.lax.scan(body, f0, None, length=n)
            return c.sum()
        return chain
    c1, c2 = mk(N1), mk(N2)
    float(c1(consts, carry)); float(c2(consts, carry))
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(c1(consts, carry))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(consts, carry))
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / (N2 - N1)
    gbs = "" if bytes_ is None else f" -> {bytes_/per/1e9:6.1f} GB/s"
    print(f"{tag:30s}: {per*1e6:8.1f} us/iter{gbs}", flush=True)
    return per


def build():
    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.grid.spec import Grid, GridSpecXY, modele_lonlat_grid
    from icebin_tpu.ops.pallas_bdt import pallas_from_weighted
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams
    EPSG3031 = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"
    specA = modele_lonlat_grid(144, 90)
    R = 2800e3
    n = int(2 * R / 5e3)
    specI = GridSpecXY(xb=np.linspace(-R, R, n + 1),
                       yb=np.linspace(-R, R, n + 1),
                       projection=EPSG3031, name="antarctica_5km")
    t0 = time.perf_counter()
    xg = make_exchange_grid(specA, specI, subdiv=2)
    print(f"exchange build {time.perf_counter()-t0:.1f}s", flush=True)
    gr = GCMRegridder(specA, hcdefs=[0.0, 1000.0, 2000.0, 3000.0, 4500.0])
    gr.add_sheet("aa", Grid(specI), exchange=xg)
    c = specI.cell_centers()
    r2 = (c[:, 0] ** 2 + c[:, 1] ** 2) / (2500e3) ** 2
    elev = np.where(r2 < 1.0, 4000.0 * (1.0 - r2), np.nan)
    t0 = time.perf_counter()
    rm = gr.regrid_matrices("aa", elev)
    print(f"factory {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    print(f"matrix EvI {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    pm = pallas_from_weighted(Me, small_axis="rows", nv=8)
    print(f"pallas pack {time.perf_counter()-t0:.1f}s", flush=True)
    return pm


def main():
    pm = build()
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    T8 = pm.ts * 8
    tb = pm.tiles2.size * 4
    acc_mb = pm.sec_blocks * pm.NV * 128 * 4 / 2**20
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad} nblkpad={pm.nblkpad} sec-acc={acc_mb:.0f}MB",
          flush=True)

    e3 = pb.apply_small_blocked(pm, fb, scale=True)
    timeit("take fbp", lambda p, f: jnp.take(f, p.pseudo2blk, axis=0),
           pm, carry=fb,
           bytes_=(pm.nblkpad + pm.npspad) * pm.NV * 128 * 4)
    timeit("fused dest-small", lambda p, f: pb.apply_small_blocked(p, f),
           pm, carry=fb, bytes_=pm.bytes_small)
    timeit("fused dest-small 6-pass",
           lambda p, f: pb.apply_small_blocked(p, f, passes=6),
           pm, carry=fb, bytes_=pm.bytes_small)
    timeit("fused dest-ice", lambda p, x: pb.apply_ice_blocked(p, x),
           pm, carry=e3, bytes_=pm.bytes_ice)


if __name__ == "__main__":
    main()
