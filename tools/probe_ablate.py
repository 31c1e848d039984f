"""Ablation probe: where do the fused kernels' non-DMA microseconds live?

Times with a bench-identical two-point chain (no artificial full-array ops;
``optimization_barrier`` blocks loop-invariant hoisting) on the real
config-#3 Greenland matrices:

  stock rt / small / ice, then dest-ice ablations (dot3 instead of HIGHEST,
  unfold skipped, scatter to fixed j, dot skipped) and dest-small ablations
  (fold skipped, HIGHEST dot).

Ablated kernels return WRONG results -- they only locate the time.
Run on the TPU chip:  python tools/probe_ablate.py
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
    e3_0 = pb.apply_small_blocked(pm, fb, scale=True)

    # bench-identical round trip
    def mk_rt(n):
        @jax.jit
        def chain():
            def body(c, _):
                e = pb.apply_small_blocked(pm, c, scale=True)
                return pb.apply_ice_blocked(pm, e, scale=True), ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
            return c.sum()
        return chain

    t = timeit(mk_rt)
    print(f"rt stock            : {1e6*t:7.1f} us "
          f"({pm.stream_bytes/t/1e9:.0f} GB/s)", flush=True)

    # single-direction chains: barrier carries a scalar into the input so
    # the body is not loop-invariant but no full-array op is added
    def mk_small_chain(applyfn):
        def mk(n):
            @jax.jit
            def chain():
                def body(c, _):
                    fbb, cc = jax.lax.optimization_barrier((fb, c))
                    e = applyfn(fbb)
                    return cc + e[0, 0], ()
                c, _ = jax.lax.scan(body, 0.0, None, length=n)
                return c
            return chain
        return mk

    def mk_ice_chain(applyfn):
        def mk(n):
            @jax.jit
            def chain():
                def body(c, _):
                    e3b, cc = jax.lax.optimization_barrier((e3_0, c))
                    o = applyfn(e3b)
                    return cc + o[0, 0, 0], ()
                c, _ = jax.lax.scan(body, 0.0, None, length=n)
                return c
            return chain
        return mk

    t = timeit(mk_small_chain(
        lambda f: pb.apply_small_blocked(pm, f, scale=True)))
    print(f"small stock (scaled): {1e6*t:7.1f} us "
          f"({pm.bytes_small/t/1e9:.0f} GB/s; floor "
          f"{pm.bytes_small/740e9*1e6:.1f})", flush=True)
    t = timeit(mk_ice_chain(
        lambda e: pb.apply_ice_blocked(pm, e, scale=True)))
    print(f"ice stock (scaled)  : {1e6*t:7.1f} us "
          f"({pm.bytes_ice/t/1e9:.0f} GB/s; floor "
          f"{pm.bytes_ice/740e9*1e6:.1f})", flush=True)

    # ---- dest-ice ablation kernels ----
    def mk_ice_kernel(mode):
        def kernel(base_ref, p2b_ref, si_ref, fl_ref, e3_ref, tiles_ref,
                   woffT_ref, out_ref, fwin_ref, f_ref):
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

            def body(p, _):
                fw = fwin_ref[pl.ds(p * ts, ts), :]
                if mode == "nounfold":
                    # WRONG result: contract fwin rows directly
                    val = jax.lax.dot_general(
                        fw, tiles_ref[p][:ts, :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=HIGH)
                    out_ref[pl.ds(0, 1), :, :] += val[None, :NV, :]
                    return 0
                for q in range(TILE_R):
                    f_ref[q * ts:(q + 1) * ts, :] = \
                        fw[:, q * NV:(q + 1) * NV]
                if mode == "nodot":
                    val = f_ref[0:NV, :TILE_C] * 0.0 + 1.0
                elif mode == "dot3":
                    val = pb._dot3(f_ref[:], tiles_ref[p],
                                   (((0,), (0,)), ((), ())))
                else:
                    val = jax.lax.dot_general(
                        f_ref[:], tiles_ref[p], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HIGH)
                if mode == "fixedj":
                    out_ref[pl.ds(0, 1), :, :] += val[None]
                else:
                    j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                    out_ref[pl.ds(j, 1), :, :] += val[None]
                return 0

            jax.lax.fori_loop(0, PSC, body, 0, unroll=PSC)

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
                pltpu.VMEM((TILE_R * ts, NV), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    for mode in ("stockk", "dot3", "fixedj", "nounfold", "nodot"):
        k = mk_ice_kernel(mode)

        def ap(e3b, _k=k):
            with jax.enable_x64(False):
                return _k(pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                          e3b, pm.tiles2, pm.w_offT)
        t = timeit(mk_ice_chain(ap))
        print(f"ice kernel [{mode:9s}]: {1e6*t:7.1f} us", flush=True)

    # ---- dest-small ablation kernels ----
    def mk_small_kernel(mode):
        def kernel(base_ref, p2b_ref, si_ref, tiles_ref, f_ref, woff_ref,
                   out_ref, s_ref, p2_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            dims = (((1,), (1,)), ((), ()))

            def body(p, _):
                t = tiles_ref[p]
                j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                f = f_ref[pl.ds(j, 1), :, :][0]
                if mode == "high":
                    s_ref[:] = jax.lax.dot_general(
                        t, f, dims, preferred_element_type=jnp.float32,
                        precision=HIGH)
                else:
                    s_ref[:] = pb._dot3(t, f, dims)
                if mode == "nofold":
                    p2_ref[pl.ds(p * ts, ts), :] = \
                        s_ref[:ts, :].repeat(TILE_R, axis=1)
                else:
                    fold = jnp.concatenate(
                        [s_ref[q * ts:(q + 1) * ts, :]
                         for q in range(TILE_R)], axis=1)
                    p2_ref[pl.ds(p * ts, ts), :] = fold
                return 0

            jax.lax.fori_loop(0, PSC, body, 0, unroll=PSC)

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
                pltpu.VMEM((TILE_R * ts, NV), jnp.float32),
                pltpu.VMEM((C2, TILE_R * NV), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    for mode in ("stockk", "high", "nofold"):
        k = mk_small_kernel(mode)

        def ap(fbb, _k=k):
            with jax.enable_x64(False):
                return _k(pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2,
                          fbb, pm.w_off)
        t = timeit(mk_small_chain(ap))
        print(f"small kernel [{mode:7s}]: {1e6*t:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
