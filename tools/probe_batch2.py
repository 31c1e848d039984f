"""Round 2 of the chunk-batching probes (see probe_batch.py).

Isolates WHICH piece broke the batched dest-small compile (3D bf16 batched
dot vs chunk-level reshape fold), and measures ts=8 packs (half the
per-pseudo ops, K=64 contractions) for both directions.

Run: python tools/probe_batch2.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(mk, n1=64, n2=576, reps=6):
    c1, c2 = mk(n1), mk(n2)
    float(c1()); float(c2())
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2())
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def build_variants(pm, pb, small_mode, ice_mode):
    """Kernel factories for one pack geometry."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PSC, ts, NV, W8 = pb.PS_CHUNK, pm.ts, pm.NV, pm.W8
    C2 = PSC * ts
    SEC = pm.sec_blocks
    c0, c1_, esec, lo, hi = pm.egroups[0]
    nstep = c1_ - c0
    rows = pm.e_sec if pm.nesec > 1 else pm.NWpad
    eoff = esec * pm.e_sec
    TILE_R, TILE_C = pb.TILE_R, pb.TILE_C
    HIGH = pb.HIGH

    def small_kernel(base_ref, p2b_ref, si_ref, tiles_ref, f_ref, woff_ref,
                     out_ref, fg_ref, pr_ref, p2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def gat(p, _):
            j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
            fg_ref[pl.ds(p, 1)] = f_ref[pl.ds(j, 1), :, :]
            return 0
        jax.lax.fori_loop(0, PSC, gat, 0, unroll=PSC)

        dims = (((2,), (2,)), ((0,), (0,)))
        if "high" in small_mode:
            pr_ref[:] = jax.lax.dot_general(
                tiles_ref[:], fg_ref[:], dims,
                preferred_element_type=jnp.float32, precision=HIGH)
        else:  # 3-pass split on 3D operands
            hi_t, lo_t = pb._split2(tiles_ref[:])
            hi_f, lo_f = pb._split2(fg_ref[:])
            acc = jax.lax.dot_general(hi_t, hi_f, dims,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(lo_t, hi_f, dims,
                                       preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(hi_t, lo_f, dims,
                                       preferred_element_type=jnp.float32)
            pr_ref[:] = acc

        if "rfold" in small_mode:       # chunk-level reshape fold
            for q in range(TILE_R):
                blk = pr_ref[:, q * ts:(q + 1) * ts, :]
                p2_ref[:, q * NV:(q + 1) * NV] = blk.reshape(C2, NV)
        else:                           # per-pseudo concat fold
            def fold(p, _):
                f2 = jnp.concatenate(
                    [pr_ref[p, q * ts:(q + 1) * ts, :]
                     for q in range(TILE_R)], axis=1)
                p2_ref[pl.ds(p * ts, ts), :] = f2
                return 0
            jax.lax.fori_loop(0, PSC, fold, 0, unroll=PSC)

        woff = woff_ref[0:1, :]
        u = jax.lax.broadcasted_iota(jnp.int32, (W8, C2), 0)
        band = pb._split3_dot(woff == u, p2_ref[:],
                              (((1,), (0,)), ((), ())))
        b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
        out_ref[pl.ds(b8, W8), :] += band

    small_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                         lambda i, b, p2, si: (c0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEC, NV, TILE_C),
                         lambda i, b, p2, si: (si[c0 + i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, C2), lambda i, b, p2, si: (c0 + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, TILE_R * NV),
                               lambda i, b, p2, si: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PSC, NV, TILE_C), jnp.float32),
            pltpu.VMEM((PSC, TILE_R * ts, NV), jnp.float32),
            pltpu.VMEM((C2, TILE_R * NV), jnp.float32)],
    )
    ks = pl.pallas_call(
        small_kernel, grid_spec=small_spec,
        out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pm.tiles2.size * NV,
            bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    def ice_kernel(base_ref, p2b_ref, si_ref, fl_ref, e3_ref, tiles_ref,
                   woffT_ref, out_ref, fwin_ref, fu_ref, va_ref):
        i = pl.program_id(0)

        @pl.when((fl_ref[c0 + i] & 1) == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
        band = e3_ref[pl.ds(b8, W8), :]
        woffT = woffT_ref[:]
        u = jax.lax.broadcasted_iota(jnp.int32, (C2, W8), 1)
        fwin_ref[:] = pb._split3_dot(woffT == u, band,
                                    (((1,), (0,)), ((), ())))

        if "rfold" in ice_mode:
            for q in range(TILE_R):
                blk = fwin_ref[:, q * NV:(q + 1) * NV]
                fu_ref[:, q * ts:(q + 1) * ts, :] = blk.reshape(PSC, ts, NV)
        else:
            def unf(p, _):
                fw = fwin_ref[pl.ds(p * ts, ts), :]
                for q in range(TILE_R):
                    fu_ref[p, q * ts:(q + 1) * ts, :] = \
                        fw[:, q * NV:(q + 1) * NV]
                return 0
            jax.lax.fori_loop(0, PSC, unf, 0, unroll=PSC)

        va_ref[:] = jax.lax.dot_general(
            fu_ref[:], tiles_ref[:], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=HIGH)

        def scat(p, _):
            j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
            out_ref[pl.ds(j, 1), :, :] += va_ref[pl.ds(p, 1)]
            return 0
        jax.lax.fori_loop(0, PSC, scat, 0, unroll=PSC)

    ice_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((rows, TILE_R * NV),
                         lambda i, b, p2, si, fl: (esec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                         lambda i, b, p2, si, fl: (c0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, 1), lambda i, b, p2, si, fl: (c0 + i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i, b, p2, si, fl: (
                                   si[c0 + i] - lo, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C2, TILE_R * NV), jnp.float32),
            pltpu.VMEM((PSC, TILE_R * ts, NV), jnp.float32),
            pltpu.VMEM((PSC, NV, TILE_C), jnp.float32)],
    )
    ki = pl.pallas_call(
        ice_kernel, grid_spec=ice_spec,
        out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pm.tiles2.size * NV,
            bytes_accessed=pm.tiles2.size * 4, transcendentals=0))
    return ks, ki


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from tools.probe_r4 import build_pm

    pm4 = build_pm()
    rng = np.random.default_rng(0)
    fb = pm4.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm4.nice)), jnp.float32))

    # ts=8 pack of the same matrix
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
    pm8 = pallas_from_weighted(Me, small_axis="rows", nv=8, ts=8)
    print(f"ts=4: npspad={pm4.npspad} tilesMB={pm4.tiles2.size*4/1e6:.1f} "
          f"W8={pm4.W8} | ts=8: npspad={pm8.npspad} "
          f"tilesMB={pm8.tiles2.size*4/1e6:.1f} W8={pm8.W8}", flush=True)

    for tag, pm in (("ts4", pm4), ("ts8", pm8)):
        fbx = fb
        e3_0 = pb.apply_small_blocked(pm, fbx, scale=False)
        ref_s = np.asarray(e3_0)
        ref_i = np.asarray(pb.apply_ice_blocked(pm, e3_0, scale=False))
        rows = pm.e_sec if pm.nesec > 1 else pm.NWpad
        for sm in ("high-rfold", "high-pfold", "split-pfold"):
            for im in ("rfold",):
                try:
                    ks, ki = build_variants(pm, pb, sm, im)
                    with jax.enable_x64(False):
                        os_ = np.asarray(ks(
                            pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2,
                            fbx, pm.w_off))
                        oi = np.asarray(ki(
                            pm.base, pm.pseudo2blk, pm.sec_idx,
                            pm.sec_flags, e3_0, pm.tiles2, pm.w_offT))
                    full = np.concatenate(
                        [np.zeros((pm.NWpad - rows, os_.shape[1]),
                                  np.float32), os_]) \
                        if pm.nesec > 1 else os_
                    es = np.abs(full - ref_s).max() / np.abs(ref_s).max()
                    ei = np.abs(oi - ref_i).max() / np.abs(ref_i).max()

                    def mks(n, _k=ks, _pm=pm, _f=fbx):
                        @jax.jit
                        def chain():
                            def body(cc, _):
                                c2 = cc.at[0, 0, 0].add(1e-30)
                                with jax.enable_x64(False):
                                    e = _k(_pm.base, _pm.pseudo2blk,
                                           _pm.sec_idx, _pm.tiles2, c2,
                                           _pm.w_off)
                                return c2, e[0, 0]
                            cc, es_ = jax.lax.scan(body, _f, None, length=n)
                            return cc[0, 0, 0] + es_.sum()
                        return chain

                    def mki(n, _k=ki, _pm=pm, _e=e3_0):
                        @jax.jit
                        def chain():
                            def body(cc, _):
                                c2 = cc.at[0, 0].add(1e-30)
                                with jax.enable_x64(False):
                                    o = _k(_pm.base, _pm.pseudo2blk,
                                           _pm.sec_idx, _pm.sec_flags, c2,
                                           _pm.tiles2, _pm.w_offT)
                                return c2, o[0, 0, 0]
                            cc, os2 = jax.lax.scan(body, _e, None, length=n)
                            return cc[0, 0] + os2.sum()
                        return chain

                    t_s = timeit(mks)
                    t_i = timeit(mki)
                    print(f"{tag} small[{sm:11s}] {1e6*t_s:6.1f} us "
                          f"(err {es:.1e})  ice[{im}] {1e6*t_i:6.1f} us "
                          f"(err {ei:.1e})", flush=True)
                except Exception as e:
                    print(f"{tag} {sm}/{im}: FAILED {type(e).__name__} "
                          f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
