"""Probe: break the per-pseudo serial chain with multi-slot scratch.

Hypothesis (r4): the fused kernels' per-pseudo fold/unfold goes through ONE
shared VMEM scratch buffer (s_ref / f_ref), so iteration p+1's VPU writes
wait for iteration p's MXU read -- a serial VPU->MXU->VPU chain ~2048 long.
Variants here give the scratch NSLOT parity slots so consecutive pseudos
use independent buffers and Mosaic can software-pipeline.

Run on the TPU chip:  python tools/probe_slots.py [nslot ...]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(mkchain, n1=64, n2=576, reps=6):
    c1, c2 = mkchain(n1), mkchain(n2)
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

    nslots = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
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
    e3 = pb.apply_small_blocked(pm, fb, scale=True)

    # ---------------- dest-small variant ----------------
    def mk_small(NSLOT):
        def kernel(base_ref, p2b_ref, si_ref, tiles_ref, f_ref, woff_ref,
                   out_ref, s_ref, p2_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            dims = (((1,), (1,)), ((), ()))
            for p in range(PSC):
                t = tiles_ref[p]
                j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                f = f_ref[pl.ds(j, 1), :, :][0]
                sl = p % NSLOT
                s_ref[sl] = pb._dot3(t, f, dims)
                fold = jnp.concatenate(
                    [s_ref[sl, q * ts:(q + 1) * ts, :]
                     for q in range(TILE_R)], axis=1)
                p2_ref[pl.ds(p * ts, ts), :] = fold

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
                pltpu.VMEM((NSLOT, TILE_R * ts, NV), jnp.float32),
                pltpu.VMEM((C2, TILE_R * NV), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    # ---------------- dest-ice variant ----------------
    def mk_ice(NSLOT):
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
            for p in range(PSC):
                fw = fwin_ref[pl.ds(p * ts, ts), :]
                sl = p % NSLOT
                for q in range(TILE_R):
                    f_ref[sl, q * ts:(q + 1) * ts, :] = \
                        fw[:, q * NV:(q + 1) * NV]
                val = jax.lax.dot_general(
                    f_ref[sl], tiles_ref[p], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HIGH)
                j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
                out_ref[pl.ds(j, 1), :, :] += val[None]

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
                pltpu.VMEM((NSLOT, TILE_R * ts, NV), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * pm.tiles2.size * NV,
                bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    def chain_small(k, n):
        @jax.jit
        def c():
            def body(carry, _):
                with jax.enable_x64(False):
                    o = k(pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2,
                          carry, pm.w_off)
                return carry * (1.0 + o[0, 0] * 1e-37), ()
            cc, _ = jax.lax.scan(body, fb, None, length=n)
            return cc.sum()
        return c

    def chain_ice(k, n):
        @jax.jit
        def c():
            def body(carry, _):
                with jax.enable_x64(False):
                    o = k(pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                          carry, pm.tiles2, pm.w_offT)
                return carry * (1.0 + o[0, 0, 0] * 1e-37), ()
            cc, _ = jax.lax.scan(body, e3, None, length=n)
            return cc.sum()
        return c

    print(f"nstep={nstep} W8={W8} rows={rows}", flush=True)
    ref_s = ref_i = None
    for NSLOT in nslots:
        ks, ki = mk_small(NSLOT), mk_ice(NSLOT)
        with jax.enable_x64(False):
            os_ = np.asarray(ks(pm.base, pm.pseudo2blk, pm.sec_idx,
                                pm.tiles2, fb, pm.w_off))
            oi = np.asarray(ki(pm.base, pm.pseudo2blk, pm.sec_idx,
                               pm.sec_flags, e3, pm.tiles2, pm.w_offT))
        if ref_s is None:
            ref_s, ref_i = os_, oi
        else:
            assert np.array_equal(ref_s, os_), "small mismatch"
            assert np.array_equal(ref_i, oi), "ice mismatch"
        t_s = timeit(functools.partial(chain_small, ks))
        t_i = timeit(functools.partial(chain_ice, ki))
        print(f"NSLOT={NSLOT}: small {1e6*t_s:7.1f} us  "
              f"ice {1e6*t_i:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
