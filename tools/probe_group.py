"""Probe: G chunks per fused-kernel grid step at config-#3 (Greenland) scale.

docs/status.md limitation #1: the round-3 fused kernels are ~11% slower
than the round-2 two-kernel pipeline at SMALL npspad (Greenland round trip
179 us vs 160), and the autotune ps_chunk sweep showed 256 LOSES (wider W8
band) while 64 also loses (grid-step amortization).  Candidate lever:
group G chunks per grid step -- G chunks' tiles stream per step (big DMA,
few steps) while each chunk keeps its OWN narrow window band.

This probe times the stock fused dest-small kernel against a G-grouped
variant on the real Greenland 5 km EvI matrix, dest-small direction only
(the dest-ice direction needs section-boundary padding to group; measure
the small side first).  Run on the TPU chip:

    python tools/probe_group.py [G ...]
"""
import functools
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


def _mk_grouped_small(pm, G, passes=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from icebin_tpu.ops import pallas_bdt as pb

    PSC, ts, NV, W8 = pb.PS_CHUNK, pm.ts, pm.NV, pm.W8
    C2 = PSC * ts
    assert pm.nchunk % G == 0
    nstep = pm.nchunk // G

    def kernel(base_ref, tiles_ref, f_ref, woff_ref,
               out_ref, s_ref, p2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dims = (((1,), (1,)), ((), ()))
        for g in range(G):
            def body(p, _):
                t = tiles_ref[g * PSC + p]
                f = f_ref[g * PSC + p]
                if passes >= 6:
                    s_ref[:] = jax.lax.dot_general(
                        t, f, dims, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    s_ref[:] = pb._dot3(t, f, dims)
                fold = jnp.concatenate(
                    [s_ref[q * ts:(q + 1) * ts, :] for q in range(8)],
                    axis=1)
                p2_ref[pl.ds(p * ts, ts), :] = fold
                return 0

            jax.lax.fori_loop(0, PSC, body, 0, unroll=PSC)
            woff = woff_ref[g * 8:g * 8 + 1, :]
            u = jax.lax.broadcasted_iota(jnp.int32, (W8, C2), 0)
            band = pb._split3_dot(woff == u, p2_ref[:],
                                  (((1,), (0,)), ((), ())))
            b8 = pl.multiple_of(base_ref[i * G + g], 8)
            out_ref[pl.ds(b8, W8), :] += band

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((G * PSC, 8 * ts, 128), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * PSC, NV, 128), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 8, C2), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pm.NWpad, 8 * NV), lambda i, b: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8 * ts, NV), jnp.float32),
                        pltpu.VMEM((C2, 8 * NV), jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pm.NWpad, 8 * NV), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pm.tiles2.size * NV
            + 2 * pm.nchunk * W8 * C2 * 8 * NV,
            bytes_accessed=pm.tiles2.size * 4, transcendentals=0))


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops.pallas_bdt import apply_small_blocked

    gs = [int(a) for a in sys.argv[1:]] or [2]
    pm = build_pm()
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad} nblkpad={pm.nblkpad} nsmall={pm.nsmall} "
          f"tilesMB={pm.tiles2.size * 4 / 1e6:.1f}", flush=True)
    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)

    def timeit(fn, *a, n1=64, n2=576):
        def mk(n):
            @jax.jit
            def chain():
                def body(c, _):
                    e3 = fn(*a[:-1], a[-1] * (1.0 + 0.0 * c))
                    return e3[0, 0], ()
                c, _ = jax.lax.scan(body, 0.0, None, length=n)
                return c
            return chain
        c1, c2 = mk(n1), mk(n2)
        float(c1()); float(c2())
        t1s, t2s = [], []
        for _ in range(6):
            t0 = time.perf_counter(); float(c1())
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2())
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (n2 - n1)

    # stock: the r4 fused kernel (in-kernel section gather)
    def stock(base, tiles, fb_in):
        from icebin_tpu.ops import pallas_bdt as pb
        with jax.enable_x64(False):
            return pb._mk_fused_small(pm, False, True, 3)(
                base, pm.pseudo2blk, pm.sec_idx, tiles, fb_in,
                pm.w_off, pm.winvS_e3)

    t = timeit(stock, pm.base, pm.tiles2, fb)
    print(f"stock kernel: {1e6 * t:.1f} us "
          f"({pm.bytes_small / t / 1e9:.0f} GB/s-eq)", flush=True)

    ref = np.asarray(stock(pm.base, pm.tiles2, fb))
    for G in gs:
        if pm.nchunk % G:
            print(f"G={G}: skip (nchunk={pm.nchunk} not divisible)")
            continue
        k = _mk_grouped_small(pm, G)

        def grouped(base, tiles, fbp_in, _k=k):
            with jax.enable_x64(False):
                return _k(base, tiles, fbp_in, pm.w_off) * pm.winvS_e3

        out = np.asarray(grouped(pm.base, pm.tiles2, fbp))
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-30)
        t = timeit(grouped, pm.base, pm.tiles2, fbp)
        print(f"G={G}: {1e6 * t:.1f} us "
              f"({pm.bytes_small / t / 1e9:.0f} GB/s-eq)  maxrel={err:.1e}",
              flush=True)

    # full apply for context (gather + kernel + epilogue)
    t = timeit(lambda p, fb_in: apply_small_blocked(p, fb_in, scale=True),
               pm, fb)
    print(f"full apply_small_blocked: {1e6 * t:.1f} us", flush=True)


if __name__ == "__main__":
    main()
