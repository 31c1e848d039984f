"""Probe: chunk-level batched contraction + chunk-level fold/unfold.

The stock fused kernels interleave per-pseudo VPU slicing with tiny MXU
dots through ONE shared scratch -- a 128-long serial chain per chunk.  The
variants here restructure each chunk as:

  dest-small: gather 128 field rows into Fg (PSC, NV, 128) [independent
    copies], ONE batched dot_general (batch dim p) -> prods (PSC, 8*ts,
    NV), then fold with 8 CHUNK-level slice+reshape ops (leading-dim
    reshapes only -- no 8-lane-minor shape casts).
  dest-ice: unfold fwin with 8 chunk-level ops -> funf (PSC, 8*ts, NV),
    ONE batched dot_general -> vals (PSC, NV, 128), then 128 independent
    RMW scatters.

Falls back to per-p dots into INDEPENDENT scratch slots if Mosaic rejects
batched dot_general.  Run: python tools/probe_batch.py
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


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from icebin_tpu.ops import pallas_bdt as pb
    from tools.probe_r4 import build_pm

    pm = build_pm()
    PSC, ts, NV, W8 = pb.PS_CHUNK, pm.ts, pm.NV, pm.W8
    C2 = PSC * ts
    SEC = pm.sec_blocks
    c0, c1_, esec, lo, hi = pm.egroups[0]
    nstep = c1_ - c0
    rows = pm.e_sec if pm.nesec > 1 else pm.NWpad
    eoff = esec * pm.e_sec
    TILE_R, TILE_C = pb.TILE_R, pb.TILE_C
    HIGH = pb.HIGH

    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    e3_0 = pb.apply_small_blocked(pm, fb, scale=False)
    ref_ice = np.asarray(pb.apply_ice_blocked(pm, e3_0, scale=False))

    batched = "batched" in sys.argv or True

    # ---------------- dest-small variant ----------------
    def mk_small(use_batch):
        def kernel(base_ref, p2b_ref, si_ref, tiles_ref, f_ref, woff_ref,
                   out_ref, fg_ref, pr_ref, p2_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            # 1. independent per-pseudo field gathers
            def gat(p, _):
                j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                fg_ref[pl.ds(p, 1)] = f_ref[pl.ds(j, 1), :, :]
                return 0
            jax.lax.fori_loop(0, PSC, gat, 0, unroll=PSC)

            # 2. batched contraction over lanes (batch dim p)
            if use_batch:
                hi_t, lo_t = pb._split2(tiles_ref[:])
                hi_f, lo_f = pb._split2(fg_ref[:])
                dims = (((2,), (2,)), ((0,), (0,)))
                acc = jax.lax.dot_general(
                    hi_t, hi_f, dims, preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    lo_t, hi_f, dims, preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    hi_t, lo_f, dims, preferred_element_type=jnp.float32)
                pr_ref[:] = acc
            else:
                def prod(p, _):
                    pr_ref[pl.ds(p, 1)] = pb._dot3(
                        tiles_ref[p], fg_ref[p],
                        (((1,), (1,)), ((), ())))[None]
                    return 0
                jax.lax.fori_loop(0, PSC, prod, 0, unroll=PSC)

            # 3. chunk-level fold: (PSC, r*ts+t, v) -> (C2, r*NV+v)
            for q in range(TILE_R):
                blk = pr_ref[:, q * ts:(q + 1) * ts, :]      # (PSC, ts, NV)
                p2_ref[:, q * NV:(q + 1) * NV] = blk.reshape(C2, NV)

            woff = woff_ref[0:1, :]
            u = jax.lax.broadcasted_iota(jnp.int32, (W8, C2), 0)
            band = pb._split3_dot(woff == u, p2_ref[:],
                                  (((1,), (0,)), ((), ())))
            b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
            out_ref[pl.ds(b8, W8), :] += band

        grid_spec = pltpu.PrefetchScalarGridSpec(
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
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    # ---------------- dest-ice variant ----------------
    def mk_ice(use_batch):
        def kernel(base_ref, p2b_ref, si_ref, fl_ref, e3_ref, tiles_ref,
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

            # chunk-level unfold: (C2, r*NV+v) -> (PSC, r*ts+t, v)
            for q in range(TILE_R):
                blk = fwin_ref[:, q * NV:(q + 1) * NV]       # (C2, NV)
                fu_ref[:, q * ts:(q + 1) * ts, :] = blk.reshape(PSC, ts, NV)

            if use_batch:
                dims = (((1,), (1,)), ((0,), (0,)))
                va_ref[:] = jax.lax.dot_general(
                    fu_ref[:], tiles_ref[:], dims,
                    preferred_element_type=jnp.float32, precision=HIGH)
            else:
                def prod(p, _):
                    va_ref[pl.ds(p, 1)] = jax.lax.dot_general(
                        fu_ref[p], tiles_ref[p], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=HIGH)[None]
                    return 0
                jax.lax.fori_loop(0, PSC, prod, 0, unroll=PSC)

            def scat(p, _):
                j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                out_ref[pl.ds(j, 1), :, :] += va_ref[pl.ds(p, 1)]
                return 0
            jax.lax.fori_loop(0, PSC, scat, 0, unroll=PSC)

        grid_spec = pltpu.PrefetchScalarGridSpec(
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
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    # chains: carry the input array, in-place-perturb one element so the
    # body is loop-variant without a full-array copy (scan updates the
    # carried buffer in place)
    def mk_small_chain(applyfn):
        def mk(n):
            @jax.jit
            def chain():
                def body(c, _):
                    c2 = c.at[0, 0, 0].add(1e-30)
                    e = applyfn(c2)
                    return c2, e[0, 0]
                c, es = jax.lax.scan(body, fb, None, length=n)
                return c[0, 0, 0] + es.sum()
            return chain
        return mk

    def mk_ice_chain(applyfn):
        def mk(n):
            @jax.jit
            def chain():
                def body(c, _):
                    c2 = c.at[0, 0].add(1e-30)
                    o = applyfn(c2)
                    return c2, o[0, 0, 0]
                c, os_ = jax.lax.scan(body, e3_0, None, length=n)
                return c[0, 0] + os_.sum()
            return chain
        return mk

    ref_small = np.asarray(pb.apply_small_blocked(pm, fb, scale=False))

    for ub in (True, False):
        tag = "batched" if ub else "slotted"
        try:
            ks = mk_small(ub)
            with jax.enable_x64(False):
                o = np.asarray(ks(pm.base, pm.pseudo2blk, pm.sec_idx,
                                  pm.tiles2, fb, pm.w_off))
            full = np.concatenate(
                [np.zeros((pm.NWpad - rows, TILE_R * NV), np.float32), o]
            ) if pm.nesec > 1 else o
            err = np.abs(full - ref_small).max() / np.abs(ref_small).max()
            def ap(fbb, _k=ks):
                with jax.enable_x64(False):
                    return _k(pm.base, pm.pseudo2blk, pm.sec_idx,
                              pm.tiles2, fbb, pm.w_off)
            t = timeit(mk_small_chain(ap))
            print(f"small [{tag}]: {1e6*t:7.1f} us  maxrel={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"small [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        try:
            ki = mk_ice(ub)
            with jax.enable_x64(False):
                o = np.asarray(ki(pm.base, pm.pseudo2blk, pm.sec_idx,
                                  pm.sec_flags, e3_0, pm.tiles2, pm.w_offT))
            err = np.abs(o - ref_ice).max() / np.abs(ref_ice).max()
            def ap2(e3b, _k=ki):
                with jax.enable_x64(False):
                    return _k(pm.base, pm.pseudo2blk, pm.sec_idx,
                              pm.sec_flags, e3b, pm.tiles2, pm.w_offT)
            t = timeit(mk_ice_chain(ap2))
            print(f"ice   [{tag}]: {1e6*t:7.1f} us  maxrel={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"ice   [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # stock reference with the same in-place chain harness
    t = timeit(mk_small_chain(
        lambda f: pb.apply_small_blocked(pm, f, scale=False)))
    print(f"small [stock  ]: {1e6*t:7.1f} us", flush=True)
    t = timeit(mk_ice_chain(
        lambda e: pb.apply_ice_blocked(pm, e, scale=False)))
    print(f"ice   [stock  ]: {1e6*t:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
