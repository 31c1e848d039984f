"""Prototype: lane-packed A1/B2' kernel I/O (VERDICT r2 item #1).

The A1 prods output and B2' fwin input are (npspad, TS*8, NV) with NV=8 in
the LANE (minor) dim -> Mosaic DMAs them at 32 B granules; at Antarctica
scale (npspad ~ 15k) that is ~0.5 ms of stall per 15.7 MB buffer side and
the round trip drops to ~0.43x Greenland GB/s.

Fix candidates (both keep every other kernel byte-identical):

V0 in-kernel reshape: A1 computes acc (TS*8, NV) rows (t*8+r) as today and
   writes acc.reshape(TS, 8*NV) -- a row-major fold whose flat order
   exactly matches the XLA glue reshape, so the out block becomes
   (B, TS, 64): 256 B granules.  Works only if Mosaic supports the
   sublane->lane shape cast.
V1 slice+concat with r-major tiles: tiles stored (npspad, 8*TS, 128) with
   rows r*TS+t; the (TS*8, NV) dot result is folded to (TS, 8*NV) by 8
   static sublane slices + one lane concat (and the exact inverse on the
   B2' input side), which Mosaic lowers to cheap vreg ops.

Either way the XLA glue between A1->A2 and B1->B2' stays a FREE row-major
reshape (same flat layout), so no XLA transpose appears (the round-2
attempt died on that).
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icebin_tpu.ops import pallas_bdt as pb
from icebin_tpu.ops.bdt import TILE_C, TILE_R
from icebin_tpu.regrid.sparse import WeightedMatrix

N1, N2 = 8, 40
HIGH = jax.lax.Precision.HIGHEST


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
    print(f"{tag:34s}: {per*1e6:8.1f} us/iter{gbs}", flush=True)
    return per


def synthetic_matrix(nice, nsmall, seed=0, spread=40):
    """Antarctica-shaped synthetic EvI: banded small rows over a big ice
    axis, ~2 entries/cell, windows jittered so blocks hold ~5 windows."""
    rng = np.random.default_rng(seed)
    c = np.arange(nice, dtype=np.int64)
    s_base = (c * (nsmall - spread - 4)) // nice
    rows, cols, vals = [], [], []
    for d in (0, 1):
        jitter = rng.integers(0, spread, nice)
        rows.append(s_base + d + jitter)
        cols.append(c)
        vals.append(rng.uniform(0.1, 1.0, nice))
    return WeightedMatrix(rows=np.concatenate(rows),
                          cols=np.concatenate(cols),
                          vals=np.concatenate(vals),
                          shape=(nsmall, nice))


# ---- V0: in-kernel reshape -------------------------------------------------

def _prods_v0_kernel(B, tiles_ref, f_ref, out_ref):
    ts = out_ref.shape[1]
    for b in range(B):
        t = tiles_ref[b]
        f = f_ref[b]
        thi = t.astype(jnp.bfloat16)
        tlo = (t - thi.astype(jnp.float32)).astype(jnp.bfloat16)
        fhi = f.astype(jnp.bfloat16)
        flo = (f - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(thi, fhi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(tlo, fhi, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(thi, flo, dims,
                                   preferred_element_type=jnp.float32)
        out_ref[b] = acc.reshape(ts, acc.shape[0] // ts * acc.shape[1])


def mk_prods_v0(pm):
    T8, NV, B = pm.ts * TILE_R, pm.NV, pb._blk_step(pm.npspad)
    nstep = pm.npspad // B
    return pl.pallas_call(
        functools.partial(_prods_v0_kernel, B),
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((B, T8, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, NV, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, pm.ts, TILE_R * NV), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm.npspad, pm.ts, TILE_R * NV),
                                       jnp.float32),
    )


# ---- V1: r-major tiles, slice+concat fold ---------------------------------

def tiles_rmajor(pm):
    """(npspad, TS*8, 128) rows t*8+r  ->  rows r*TS+t (host relayout)."""
    t = np.asarray(pm.tiles2).reshape(pm.npspad, pm.ts, TILE_R, TILE_C)
    return jnp.asarray(np.ascontiguousarray(
        t.transpose(0, 2, 1, 3).reshape(pm.npspad, pm.ts * TILE_R, TILE_C)))


def _prods_v1_kernel(B, ts, tiles_ref, f_ref, out_ref):
    for b in range(B):
        t = tiles_ref[b]                       # (8*ts, 128) rows r*ts+t
        f = f_ref[b]
        thi = t.astype(jnp.bfloat16)
        tlo = (t - thi.astype(jnp.float32)).astype(jnp.bfloat16)
        fhi = f.astype(jnp.bfloat16)
        flo = (f - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(thi, fhi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(tlo, fhi, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(thi, flo, dims,
                                   preferred_element_type=jnp.float32)
        # (8*ts, NV) rows r*ts+t -> (ts, 8*NV) lanes r*NV+v
        out_ref[b] = jnp.concatenate(
            [acc[r * ts:(r + 1) * ts, :] for r in range(TILE_R)], axis=1)


def mk_prods_v1(pm):
    T8, NV, B = pm.ts * TILE_R, pm.NV, pb._blk_step(pm.npspad)
    nstep = pm.npspad // B
    return pl.pallas_call(
        functools.partial(_prods_v1_kernel, B, pm.ts),
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((B, T8, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, NV, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, pm.ts, TILE_R * NV), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm.npspad, pm.ts, TILE_R * NV),
                                       jnp.float32),
    )


# ---- B2' variants ----------------------------------------------------------

def _ct_v0_kernel(B, sec_blocks, scale, p2b_ref, si_ref, fl_ref,
                  fwin_ref, tiles_ref, winv_ref, out_ref):
    """fwin (B, ts, 8*NV) lane-packed; in-kernel reshape back to (T8, NV)."""
    i = pl.program_id(0)

    @pl.when((fl_ref[i] & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ts = fwin_ref.shape[1]
    for b in range(B):
        fw = fwin_ref[b]                        # (ts, 64)
        f32 = fw.reshape(ts * TILE_R, fw.shape[1] // TILE_R)
        val = jax.lax.dot_general(
            f32, tiles_ref[b], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH)
        j = p2b_ref[i * B + b] - si_ref[i] * sec_blocks
        out_ref[pl.ds(j, 1), :, :] += val[None]

    if scale:
        @pl.when((fl_ref[i] & 2) == 2)
        def _():
            out_ref[:] = out_ref[:] * winv_ref[:]


def _ct_v1_kernel(B, sec_blocks, scale, p2b_ref, si_ref, fl_ref,
                  fwin_ref, tiles_ref, winv_ref, out_ref):
    """fwin (B, ts, 8*NV); tiles r-major; sublane-concat unfold."""
    i = pl.program_id(0)

    @pl.when((fl_ref[i] & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ts = fwin_ref.shape[1]
    NV = fwin_ref.shape[2] // TILE_R
    for b in range(B):
        fw = fwin_ref[b]                        # (ts, 64) lanes r*NV+v
        # -> (8*ts, NV) rows r*ts+t, matching r-major tiles
        f32 = jnp.concatenate(
            [fw[:, r * NV:(r + 1) * NV] for r in range(TILE_R)], axis=0)
        val = jax.lax.dot_general(
            f32, tiles_ref[b], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH)
        j = p2b_ref[i * B + b] - si_ref[i] * sec_blocks
        out_ref[pl.ds(j, 1), :, :] += val[None]

    if scale:
        @pl.when((fl_ref[i] & 2) == 2)
        def _():
            out_ref[:] = out_ref[:] * winv_ref[:]


def mk_ct(pm, kernel, scale=True):
    T8, NV, B = pm.ts * TILE_R, pm.NV, pb._blk_step(pm.npspad)
    nstep = pm.npspad // B
    SEC = pm.sec_blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((B, pm.ts, TILE_R * NV),
                         lambda i, p2b, si, fl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T8, TILE_C), lambda i, p2b, si, fl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEC, 1, TILE_C),
                         lambda i, p2b, si, fl: (si[i], 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i, p2b, si, fl: (si[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(kernel, B, SEC, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pm.nblkpad, NV, TILE_C),
                                       jnp.float32),
    )


# ---- assembled full paths ---------------------------------------------------

def apply_small_lp(pm, tiles, mk_prods, fb):
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)
    prods = mk_prods(tiles, fbp)                        # (npspad, ts, 64)
    p2 = prods.reshape(pm.npspad * pm.ts, TILE_R * pm.NV)
    padrows = pm.nchunkpad * pb.PS_CHUNK * pm.ts - pm.npspad * pm.ts
    if padrows:
        p2 = jnp.pad(p2, ((0, padrows), (0, 0)))
    return pb._mk_scatter(pm, False, True)(pm.base, p2, pm.w_off,
                                           pm.winvS_e3)


def apply_ice_lp(pm, tiles, ct, e3):
    fwin = pb._mk_gather(pm, False)(pm.base, e3, pm.w_offT)
    fwin = fwin[:pm.npspad * pm.ts]
    fwin3 = fwin.reshape(pm.npspad, pm.ts, TILE_R * pm.NV)
    return ct(pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
              fwin3, tiles, pm.winvI_blk)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    nice = 200_000 if args.small else 1_254_400
    nsmall = 6_000 if args.small else 30_000
    M = synthetic_matrix(nice, nsmall)
    t0 = time.perf_counter()
    pm = pb.pallas_from_weighted(M, small_axis="rows", nv=8)
    print(f"pack {time.perf_counter()-t0:.1f}s  npspad={pm.npspad} "
          f"W8={pm.W8} nblkpad={pm.nblkpad} NWpad={pm.NWpad} "
          f"ov={0 if pm.ov_s is None else pm.ov_s.size}", flush=True)
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)
    T8 = pm.ts * TILE_R
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4

    # reference outputs
    e3_ref = np.asarray(pb.apply_small_blocked(pm, fb, scale=True))
    out_ref = np.asarray(pb.apply_ice_blocked(pm, jnp.asarray(e3_ref),
                                              scale=True))

    trm = tiles_rmajor(pm)
    sc = np.abs(e3_ref).max()

    # V0 feasibility: in-kernel reshape
    for name, mkp, tl in (("V0 reshape", mk_prods_v0, pm.tiles2),
                          ("V1 r-major", mk_prods_v1, trm)):
        try:
            e3 = np.asarray(apply_small_lp(pm, tl, mkp(pm), fb))
            err = np.abs(e3 - e3_ref).max() / sc
            print(f"A-side {name}: max rel err {err:.2e}", flush=True)
            if err < 1e-4:
                timeit(f"A1' {name}", lambda p, f, mkp=mkp, tl=tl:
                       mkp(p)(tl, f), pm, carry=fbp, bytes_=tb + pbytes)
                timeit(f"full dest-small {name}",
                       lambda p, f, mkp=mkp, tl=tl:
                       apply_small_lp(p, tl, mkp(p), f),
                       pm, carry=fb, bytes_=pm.bytes_small)
        except Exception as e:
            print(f"A-side {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    e3j = jnp.asarray(e3_ref)
    osc = np.abs(out_ref).max()
    for name, k, tl in (("V0 reshape", _ct_v0_kernel, pm.tiles2),
                        ("V1 r-major", _ct_v1_kernel, trm)):
        try:
            ct = mk_ct(pm, k)
            out = np.asarray(apply_ice_lp(pm, tl, ct, e3j))
            err = np.abs(out - out_ref).max() / osc
            print(f"B-side {name}: max rel err {err:.2e}", flush=True)
            if err < 1e-4:
                timeit(f"full dest-ice {name}",
                       lambda p, x, ct=ct, tl=tl: apply_ice_lp(p, tl, ct, x),
                       pm, carry=e3j, bytes_=pm.bytes_ice)
        except Exception as e:
            print(f"B-side {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # current-path references at this scale
    timeit("A1 prods (current)", lambda p, f: pb._mk_prods(p, False)(
        p.tiles2, f), pm, carry=fbp, bytes_=tb + pbytes)
    timeit("full dest-small (current)",
           lambda p, f: pb.apply_small_blocked(p, f), pm, carry=fb,
           bytes_=pm.bytes_small)
    timeit("full dest-ice (current)",
           lambda p, x: pb.apply_ice_blocked(p, x), pm, carry=e3j,
           bytes_=pm.bytes_ice)


if __name__ == "__main__":
    main()
