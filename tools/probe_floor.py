"""Empirical DMA floor of the fused kernels: identical grid/BlockSpecs,
near-zero compute (one element consumed per block, so every fetch still
happens).  stock - floor = compute time NOT hidden behind the stream.
Run: python tools/probe_floor.py"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(mk, n1=64, n2=576, reps=8):
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
    TILE_R, TILE_C = pb.TILE_R, pb.TILE_C

    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    e3_0 = pb.apply_small_blocked(pm, fb, scale=True)

    # ---- stream-only dest-small pattern: tiles + field sections in,
    # E3-sized out (written once per step so the writeback happens)
    def sk(tiles_ref, f_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        v = (jnp.sum(tiles_ref[0, 0:1, :], axis=1, keepdims=True)
             + jnp.sum(f_ref[0, 0:1, :], axis=1, keepdims=True))
        out_ref[0:1, 0:1] += v

    ks = pl.pallas_call(
        sk, grid=(nstep,),
        in_specs=[pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i: (i // (nstep // 2 + 1), 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, TILE_R * NV), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2, transcendentals=0,
                                      bytes_accessed=pm.tiles2.size * 4))

    # ---- stream-only dest-ice pattern: tiles + e3 in, blocked field out
    def ik(e3_ref, tiles_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i % (nstep // 2 + 1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        v = (jnp.sum(tiles_ref[0, 0:1, :], axis=1, keepdims=True)
             + jnp.sum(e3_ref[0:1, :], axis=1, keepdims=True))
        out_ref[0:1, 0:1, 0:1] += v[None]

    ki = pl.pallas_call(
        ik, grid=(nstep,),
        in_specs=[pl.BlockSpec((rows, TILE_R * NV), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i: (i // (nstep // 2 + 1), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm.nblkpad, NV, TILE_C),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2, transcendentals=0,
                                      bytes_accessed=pm.tiles2.size * 4))

    def mk_rt_floor(n):
        @jax.jit
        def chain():
            def body(c, _):
                with jax.enable_x64(False):
                    e = ks(pm.tiles2, c, )
                    o = ki(e, pm.tiles2)
                return o, ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
            return c.sum()
        return chain

    def mk_rt_stock(n):
        @jax.jit
        def chain():
            def body(c, _):
                e = pb.apply_small_blocked(pm, c, scale=True)
                return pb.apply_ice_blocked(pm, e, scale=True), ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
            return c.sum()
        return chain

    t = timeit(mk_rt_floor)
    print(f"rt STREAM floor: {1e6*t:7.1f} us "
          f"({pm.stream_bytes/t/1e9:.0f} GB/s)", flush=True)
    t = timeit(mk_rt_stock)
    print(f"rt stock       : {1e6*t:7.1f} us "
          f"({pm.stream_bytes/t/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
