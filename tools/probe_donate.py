"""Probe: donate the dest-ice output buffer (input_output_aliases) so the
scan-carry copy (28 us/rt in the trace) disappears.
Run: python tools/probe_donate.py"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


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

    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    ref = np.asarray(pb.apply_ice_blocked(
        pm, pb.apply_small_blocked(pm, fb, scale=True), scale=True))

    # donated-output dest-ice kernel: extra ANY-space input aliased to out
    def kernel2(base_ref, p2b_ref, si_ref, fl_ref, e3_ref, tiles_ref,
                woffT_ref, winv_ref, don_ref, out_ref, fwin_ref, fu_ref,
                va_ref):
        pb._fused_ice_kernel(PSC, ts, W8, SEC, c0, eoff, True, True,
                             base_ref, p2b_ref, si_ref, fl_ref, e3_ref,
                             tiles_ref, woffT_ref, winv_ref,
                             out_ref, fwin_ref, fu_ref, va_ref)

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
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEC, 1, TILE_C),
                         lambda i, b, p2, si, fl: (si[c0 + i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # donor (never read)
        ],
        out_specs=pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i, b, p2, si, fl: (si[c0 + i] - lo,
                                                         0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C2, TILE_R * NV), jnp.float32),
                        pltpu.VMEM((PSC, TILE_R * ts, NV), jnp.float32),
                        pltpu.VMEM((PSC, NV, TILE_C), jnp.float32)],
    )
    kd = pl.pallas_call(
        kernel2, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                       jnp.float32),
        input_output_aliases={8: 0},   # donor operand (4 scalars + 4) -> out
        cost_estimate=pl.CostEstimate(
            flops=2 * pm.tiles2.size * NV,
            bytes_accessed=pm.tiles2.size * 4, transcendentals=0))

    def apply_ice_donated(e3, donor):
        with jax.enable_x64(False):
            return kd(pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                      e3, pm.tiles2, pm.w_offT, pm.winvI_blk, donor)

    out = np.asarray(apply_ice_donated(
        pb.apply_small_blocked(pm, fb, scale=True), fb))
    exact = np.array_equal(out, ref)
    print("donated exact:", exact, flush=True)

    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                e = pb.apply_small_blocked(pm, c, scale=True)
                return apply_ice_donated(e, c), ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
            return c.sum()
        return chain

    c1, c2 = mk(64), mk(576)
    float(c1()); float(c2())
    t1s, t2s = [], []
    for _ in range(8):
        t0 = time.perf_counter(); float(c1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2())
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / 512
    print(f"rt donated: {1e6*per:6.1f} us "
          f"({pm.stream_bytes/per/1e9:.0f} GB/s; vs_baseline "
          f"{pm.stream_bytes/per/1e9/(0.7*819):.3f})", flush=True)


if __name__ == "__main__":
    main()
