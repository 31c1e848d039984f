"""Bisect the dest-ice kernel's unhidden compute (~28 us over its stream
floor; probe_rmw showed the scatter is NOT it).  Cumulative variants:
  stream   : fetch blocks only (floor)
  +band    : + one-hot band matmul into fwin
  +unfold  : + chunk-level unfold into fu
  +dot     : + batched HIGHEST contraction into va
  +scatter : + per-pseudo RMW (== full kernel)
Round 5: takes the pack NV on the command line (default 16, the bench
config) and compiles under the unlocked VMEM_LIMIT.
Run: python tools/probe_ice_bisect.py [nv]"""
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
    from tools.probe_ts import greenland_weighted

    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Me = greenland_weighted()
    pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=nv)
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
        jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)),
                    jnp.float32))
    e3_0 = pb.apply_small_blocked(pm, fb, scale=True)

    def mk_ice(level):
        def kernel(base_ref, p2b_ref, si_ref, fl_ref, e3_ref, tiles_ref,
                   woffT_ref, out_ref, fwin_ref, fu_ref, va_ref):
            i = pl.program_id(0)

            @pl.when((fl_ref[c0 + i] & 1) == 1)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
            if level >= 1:
                band = e3_ref[pl.ds(b8, W8), :]
                woffT = woffT_ref[:]
                u = jax.lax.broadcasted_iota(jnp.int32, (C2, W8), 1)
                fwin_ref[:] = pb._split3_dot(woffT == u, band,
                                            (((1,), (0,)), ((), ())))
            else:
                # still touch the inputs so fetches happen
                v = (jnp.sum(tiles_ref[0, 0:1, :], axis=1, keepdims=True)
                     + jnp.sum(e3_ref[0:1, 0:128], axis=1, keepdims=True))
                out_ref[0:1, 0:1, 0:1] += v[None]
                return
            if level >= 2:
                for q in range(TILE_R):
                    blk = fwin_ref[:, q * NV:(q + 1) * NV]
                    fu_ref[:, q * ts:(q + 1) * ts, :] = blk.reshape(
                        PSC, ts, NV)
            if level >= 3:
                va_ref[:] = jax.lax.dot_general(
                    fu_ref[:], tiles_ref[:], (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=HIGH)
            if level >= 4:
                def body(p, _):
                    j = (p2b_ref[(c0 + i) * PSC + p]
                         - si_ref[c0 + i] * SEC)
                    out_ref[pl.ds(j, 1), :, :] += va_ref[pl.ds(p, 1)]
                    return 0
                jax.lax.fori_loop(0, PSC, body, 0, unroll=PSC)
            else:
                out_ref[0:1, 0:1, 0:1] += fwin_ref[0:1, 0:1][None]

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
            scratch_shapes=[pltpu.VMEM((C2, TILE_R * NV), jnp.float32),
                            pltpu.VMEM((PSC, TILE_R * ts, NV), jnp.float32),
                            pltpu.VMEM((PSC, NV, TILE_C), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pb.VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    names = ("stream", "+band", "+unfold", "+dot", "+scatter")
    for level in range(5):
        k = mk_ice(level)

        def mk(n, _k=k):
            @jax.jit
            def chain():
                def body(c, _):
                    c2 = c.at[0, 0].add(1e-30)
                    with jax.enable_x64(False):
                        o = _k(pm.base, pm.pseudo2blk, pm.sec_idx,
                               pm.sec_flags, c2, pm.tiles2, pm.w_offT)
                    return c2, o[0, 0, 0]
                c, os_ = jax.lax.scan(body, e3_0, None, length=n)
                return c[0, 0] + os_.sum()
            return chain

        t = timeit(mk)
        print(f"ice [{names[level]:8s}]: {1e6*t:6.1f} us", flush=True)


if __name__ == "__main__":
    main()
