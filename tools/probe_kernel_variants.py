"""On-chip experiments for the next round of pallas_bdt tuning.

Hypotheses from tools/profile_pallas_cfg3.py (two-point timing, cfg #3):
  A1 prods 79.7us / B2' 85.7us -- MXU-bound: precision=HIGHEST is a 6-pass
     bf16 emulation and the NV=8 output wastes 15/16 of the MXU lanes.
     Variant: pre-split tiles to bf16 (hi, lo) at build time, split the
     field in-kernel -> 3 passes at ~f32 accuracy.
  A2 scatter 73.8us moving only 2 MB -- the dynamic-slice `+=` into the
     VMEM-resident E3 accumulator serializes the in-kernel chunk loop.
     Variant: band matmuls write DISJOINT per-chunk outputs (pipelined),
     then a tiny VPU-only accumulate kernel folds them into E3.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench as B
from icebin_tpu.ops import pallas_bdt as pb
from icebin_tpu.ops.bdt import TILE_C, TILE_R

N1, N2 = 32, 160


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


# ---- A1 variants -----------------------------------------------------------

def _prods_kernel_default(B_, tiles_ref, f_ref, out_ref):
    for b in range(B_):
        out_ref[b] = jax.lax.dot_general(
            tiles_ref[b], f_ref[b], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _prods_kernel_presplit(B_, thi_ref, tlo_ref, f_ref, out_ref):
    for b in range(B_):
        f = f_ref[b]
        fhi = f.astype(jnp.bfloat16)
        flo = (f - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(thi_ref[b], fhi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(tlo_ref[b], fhi, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(thi_ref[b], flo, dims,
                                   preferred_element_type=jnp.float32)
        out_ref[b] = acc


def mk_prods_variant(pm, kernel, extra_tiles=0):
    T8, NV, Bs = pm.ts * TILE_R, pm.NV, pb.BLK_STEP
    nstep = pm.npspad // Bs
    tspec = pl.BlockSpec((Bs, T8, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [tspec] * (1 + extra_tiles) + [
        pl.BlockSpec((Bs, NV, TILE_C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(kernel, Bs),
        grid=(nstep,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bs, T8, NV), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm.npspad, T8, NV), jnp.float32),
    )


# ---- A2 variants -----------------------------------------------------------

def _band_kernel(W8, base_ref, p2_ref, woff_ref, out_ref):
    """One chunk per grid step; DISJOINT output (no RMW, fully pipelined)."""
    del base_ref
    p2 = p2_ref[:]                                  # (C2, 8*NV)
    woff = woff_ref[0:1, :]                         # (1, C2)
    u = jax.lax.broadcasted_iota(jnp.int32, (W8, p2.shape[0]), 0)
    out_ref[0] = pb._split3_dot(woff == u, p2, (((1,), (0,)), ((), ())))


def _accum_kernel(W8, nstep, base_ref, bands_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b8 = pl.multiple_of(base_ref[i], TILE_R)
    out_ref[pl.ds(b8, W8), :] += bands_ref[0]


def mk_scatter_split(pm):
    C2, NV, W8 = pb.PS_CHUNK * pm.ts, pm.NV, pm.W8
    bands_call = pl.pallas_call(
        functools.partial(_band_kernel, W8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pm.nchunkpad,),
            in_specs=[
                pl.BlockSpec((C2, TILE_R * NV), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, C2), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W8, TILE_R * NV),
                                   lambda i, b: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((pm.nchunkpad, W8, TILE_R * NV),
                                       jnp.float32),
    )
    accum_call = pl.pallas_call(
        functools.partial(_accum_kernel, W8, pm.nchunkpad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pm.nchunkpad,),
            in_specs=[pl.BlockSpec((1, W8, TILE_R * NV),
                                   lambda i, b: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((pm.NWpad, TILE_R * NV),
                                   lambda i, b: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((pm.NWpad, TILE_R * NV), jnp.float32),
    )

    def run(base, p2, w_off, w_off1):
        bands = bands_call(base, p2, w_off1)
        return accum_call(base, bands)
    return run


def main():
    mats, _ = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)
    T8 = pm.ts * TILE_R
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad}", flush=True)

    # reference points
    timeit("A1 prods HIGHEST (current)",
           lambda p, f: pb._mk_prods(p, False)(p.tiles2, f), pm, carry=fbp,
           bytes_=tb + pbytes)
    timeit("A1 prods DEFAULT (bound)",
           lambda p, f: mk_prods_variant(p, _prods_kernel_default)(
               p.tiles2, f), pm, carry=fbp, bytes_=tb + pbytes)

    thi = pm.tiles2.astype(jnp.bfloat16)
    tlo = (pm.tiles2 - thi.astype(jnp.float32)).astype(jnp.bfloat16)
    timeit("A1 prods presplit 3-pass",
           lambda p, h, l, f: mk_prods_variant(
               p, _prods_kernel_presplit, extra_tiles=1)(h, l, f),
           pm, thi, tlo, carry=fbp, bytes_=tb + pbytes)
    # accuracy of the 3-pass variant vs f64
    ref = np.einsum("brc,bvc->brv",
                    np.asarray(pm.tiles2, np.float64),
                    np.asarray(fbp, np.float64))
    got = np.asarray(mk_prods_variant(pm, _prods_kernel_presplit,
                                      extra_tiles=1)(thi, tlo, fbp),
                     np.float64)
    cur = np.asarray(pb._mk_prods(pm, False)(pm.tiles2, fbp), np.float64)
    scale = np.abs(ref).max()
    print(f"presplit max err {np.abs(got-ref).max()/scale:.2e} "
          f"(current HIGHEST: {np.abs(cur-ref).max()/scale:.2e})",
          flush=True)

    # A2: split band+accum vs fused RMW
    p2 = jnp.zeros((pm.nchunkpad * pb.PS_CHUNK * pm.ts, TILE_R * pm.NV),
                   jnp.float32)
    timeit("A2 scatter fused RMW (current)",
           lambda p, x: pb._mk_scatter(p, False)(p.base, x, p.w_off),
           pm, carry=p2, bytes_=pbytes)
    C2 = pb.PS_CHUNK * pm.ts
    w_off1 = pm.w_off.reshape(pm.nchunkpad, TILE_R, C2)[:, 0, :]
    w_off1 = w_off1.reshape(pm.nchunkpad * 1, C2)
    # per-chunk w_off rows (TILE_R block rows per chunk)
    split = mk_scatter_split(pm)
    timeit("A2 split band+accum",
           lambda p, x: split(p.base, x, p.w_off, p.w_off),
           pm, carry=p2, bytes_=pbytes)
    # equivalence
    rngp = np.random.default_rng(1)
    p2r = jnp.asarray(rngp.uniform(-1, 1, p2.shape), jnp.float32)
    a = np.asarray(pb._mk_scatter(pm, False)(pm.base, p2r, pm.w_off))
    b2 = np.asarray(split(pm.base, p2r, pm.w_off, pm.w_off))
    print(f"A2 split max diff {np.abs(a-b2).max():.2e}", flush=True)




# ---- second wave: batched dot, BLK_STEP sweep, fused scale -----------------

def _prods_kernel_batched(B_, tiles_ref, f_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        tiles_ref[:], f_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def mk_prods_bs(pm, kernel, bs):
    T8, NV = pm.ts * TILE_R, pm.NV
    nstep = pm.npspad // bs
    return pl.pallas_call(
        functools.partial(kernel, bs),
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((bs, T8, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, NV, TILE_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, T8, NV), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm.npspad, T8, NV), jnp.float32),
    )


def _scatter_scaled_kernel(W8, G, nstep, base_ref, p2_ref, woff_ref,
                           winv_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    C2 = woff_ref.shape[1]
    for g in range(G):
        p2 = p2_ref[g * C2:(g + 1) * C2, :]
        woff = woff_ref[g * TILE_R:g * TILE_R + 1, :]
        u = jax.lax.broadcasted_iota(jnp.int32, (W8, C2), 0)
        band = pb._split3_dot(woff == u, p2, (((1,), (0,)), ((), ())))
        b8 = pl.multiple_of(base_ref[i * G + g], TILE_R)
        out_ref[pl.ds(b8, W8), :] += band

    @pl.when(i == nstep - 1)
    def _():
        out_ref[:] = out_ref[:] * winv_ref[:]


def mk_scatter_scaled(pm):
    C2, NV, W8 = pb.PS_CHUNK * pm.ts, pm.NV, pm.W8
    G = min(pb.CH_GROUP, pm.nchunkpad)
    nstep = pm.nchunkpad // G
    return pl.pallas_call(
        functools.partial(_scatter_scaled_kernel, W8, G, nstep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((G * C2, TILE_R * NV), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * TILE_R, C2), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.NWpad, TILE_R * NV), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((pm.NWpad, TILE_R * NV),
                                   lambda i, b: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((pm.NWpad, TILE_R * NV), jnp.float32),
    )


def main2():
    mats, _ = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)
    T8 = pm.ts * TILE_R
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8}", flush=True)

    timeit("A1 loop HIGHEST bs=64 (cur)",
           lambda p, f: pb._mk_prods(p, False)(p.tiles2, f), pm, carry=fbp,
           bytes_=tb + pbytes)
    timeit("A1 batched HIGHEST bs=64",
           lambda p, f: mk_prods_bs(p, _prods_kernel_batched, 64)(
               p.tiles2, f), pm, carry=fbp, bytes_=tb + pbytes)
    for bs in (128, 256, 512):
        timeit(f"A1 batched HIGHEST bs={bs}",
               lambda p, f, bs=bs: mk_prods_bs(
                   p, _prods_kernel_batched, bs)(p.tiles2, f),
               pm, carry=fbp, bytes_=tb + pbytes)
    timeit("A1 loop bs=128 HIGHEST",
           lambda p, f: mk_prods_bs(p, pb._prods_kernel if hasattr(pb, '_prods_kernel') else None, 128)(p.tiles2, f),
           pm, carry=fbp, bytes_=tb + pbytes)

    p2 = jnp.zeros((pm.nchunkpad * pb.PS_CHUNK * pm.ts, TILE_R * pm.NV),
                   jnp.float32)
    timeit("A2 + XLA scale (current)",
           lambda p, x: pb._mk_scatter(p, False)(p.base, x, p.w_off)
           * p.winvS_e3, pm, carry=p2, bytes_=pbytes)
    sc = mk_scatter_scaled(pm)
    timeit("A2 fused scale",
           lambda p, x: sc(p.base, x, p.w_off, p.winvS_e3),
           pm, carry=p2, bytes_=pbytes)
    # equivalence
    rngp = np.random.default_rng(1)
    p2r = jnp.asarray(rngp.uniform(-1, 1, p2.shape), jnp.float32)
    a = np.asarray(pb._mk_scatter(pm, False)(pm.base, p2r, pm.w_off)
                   * pm.winvS_e3)
    b2 = np.asarray(sc(pm.base, p2r, pm.w_off, pm.winvS_e3))
    print(f"A2 fused-scale max diff {np.abs(a-b2).max():.2e}", flush=True)




# ---- wave 3: in-kernel split 3-pass (no layout change) ---------------------

def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prods_kernel_iks(B_, tiles_ref, f_ref, out_ref):
    for b in range(B_):
        thi, tlo = _split2(tiles_ref[b])
        fhi, flo = _split2(f_ref[b])
        dims = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(thi, fhi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(tlo, fhi, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(thi, flo, dims,
                                   preferred_element_type=jnp.float32)
        out_ref[b] = acc


def _contract_true_kernel_iks(B_, nstep, scale, p2b_ref, fwin_ref, tiles_ref,
                              winv_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for b in range(B_):
        fhi, flo = _split2(fwin_ref[b])
        thi, tlo = _split2(tiles_ref[b])
        dims = (((0,), (0,)), ((), ()))
        val = jax.lax.dot_general(fhi, thi, dims,
                                  preferred_element_type=jnp.float32)
        val += jax.lax.dot_general(fhi, tlo, dims,
                                   preferred_element_type=jnp.float32)
        val += jax.lax.dot_general(flo, thi, dims,
                                   preferred_element_type=jnp.float32)
        j = p2b_ref[i * B_ + b]
        out_ref[pl.ds(j, 1), :, :] += val[None]

    if scale:
        @pl.when(i == nstep - 1)
        def _():
            out_ref[:] = out_ref[:] * winv_ref[:]


def mk_contract_true_iks(pm, scale):
    T8, NV, Bs = pm.ts * TILE_R, pm.NV, pb.BLK_STEP
    nstep = pm.npspad // Bs
    return pl.pallas_call(
        functools.partial(_contract_true_kernel_iks, Bs, nstep, scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((Bs, T8, NV), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bs, T8, TILE_C), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.nblkpad, 1, TILE_C), lambda i, b: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((pm.nblkpad, NV, TILE_C),
                                   lambda i, b: (0, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((pm.nblkpad, NV, TILE_C),
                                       jnp.float32),
    )


def main3():
    mats, _ = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)
    T8 = pm.ts * TILE_R
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8}", flush=True)

    timeit("A1 HIGHEST (current)",
           lambda p, f: pb._mk_prods(p, False)(p.tiles2, f), pm, carry=fbp,
           bytes_=tb + pbytes)
    timeit("A1 in-kernel split 3-pass",
           lambda p, f: mk_prods_variant(p, _prods_kernel_iks)(p.tiles2, f),
           pm, carry=fbp, bytes_=tb + pbytes)
    ref = np.einsum("brc,bvc->brv",
                    np.asarray(pm.tiles2, np.float64),
                    np.asarray(fbp, np.float64))
    got = np.asarray(mk_prods_variant(pm, _prods_kernel_iks)(
        pm.tiles2, fbp), np.float64)
    scale_ = np.abs(ref).max()
    print(f"A1 iks max err {np.abs(got-ref).max()/scale_:.2e}", flush=True)

    fwin3 = jnp.asarray(rng.uniform(-1, 1, (pm.npspad, T8, pm.NV)),
                        jnp.float32)
    timeit("B2' HIGHEST (current)",
           lambda p, x: pb._mk_contract_true(p, True, False)(
               p.pseudo2blk, x, p.tiles2, p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    ct = mk_contract_true_iks(pm, True)
    timeit("B2' in-kernel split 3-pass",
           lambda p, x: ct(p.pseudo2blk, x, p.tiles2, p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    a = np.asarray(pb._mk_contract_true(pm, True, False)(
        pm.pseudo2blk, fwin3, pm.tiles2, pm.winvI_blk), np.float64)
    b3 = np.asarray(ct(pm.pseudo2blk, fwin3, pm.tiles2, pm.winvI_blk),
                    np.float64)
    s = np.abs(a).max()
    print(f"B2' iks max diff vs HIGHEST {np.abs(a-b3).max()/s:.2e}",
          flush=True)


# ---- wave 4: B2' RMW chain -------------------------------------------------

def _contract_true_dual_kernel(B_, nstep, scale, p2b_ref, fwin_ref,
                               tiles_ref, winv_ref, out_ref, acc_ref):
    """Dual accumulators split the serialized += chain by parity of b;
    the final step folds acc into out and scales."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for b in range(B_):
        val = jax.lax.dot_general(
            fwin_ref[b], tiles_ref[b], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        j = p2b_ref[i * B_ + b]
        if b % 2 == 0:
            out_ref[pl.ds(j, 1), :, :] += val[None]
        else:
            acc_ref[pl.ds(j, 1), :, :] += val[None]

    @pl.when(i == nstep - 1)
    def _():
        if scale:
            out_ref[:] = (out_ref[:] + acc_ref[:]) * winv_ref[:]
        else:
            out_ref[:] = out_ref[:] + acc_ref[:]


def mk_contract_true_dual(pm, scale):
    T8, NV, Bs = pm.ts * TILE_R, pm.NV, pb.BLK_STEP
    nstep = pm.npspad // Bs
    return pl.pallas_call(
        functools.partial(_contract_true_dual_kernel, Bs, nstep, scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((Bs, T8, NV), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bs, T8, TILE_C), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.nblkpad, 1, TILE_C), lambda i, b: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((pm.nblkpad, NV, TILE_C),
                                   lambda i, b: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((pm.nblkpad, NV, TILE_C),
                                       jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((pm.nblkpad, NV, TILE_C),
                                       jnp.float32),
    )


def main4():
    mats, _ = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    T8 = pm.ts * TILE_R
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4
    fwin3 = jnp.asarray(rng.uniform(-1, 1, (pm.npspad, T8, pm.NV)),
                        jnp.float32)
    print(f"npspad={pm.npspad} nblkpad={pm.nblkpad}", flush=True)

    timeit("B2' HIGHEST RMW (current)",
           lambda p, x: pb._mk_contract_true(p, True, False)(
               p.pseudo2blk, x, p.tiles2, p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    timeit("B2 plain no-RMW (floor)",
           lambda p, x: pb._mk_contract(p, False)(x, p.tiles2),
           pm, carry=fwin3, bytes_=tb + pbytes)
    dual = mk_contract_true_dual(pm, True)
    timeit("B2' dual-parity RMW",
           lambda p, x: dual(p.pseudo2blk, x, p.tiles2, p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    a = np.asarray(pb._mk_contract_true(pm, True, False)(
        pm.pseudo2blk, fwin3, pm.tiles2, pm.winvI_blk), np.float64)
    b4 = np.asarray(dual(pm.pseudo2blk, fwin3, pm.tiles2, pm.winvI_blk),
                    np.float64)
    s = np.abs(a).max()
    print(f"B2' dual max diff {np.abs(a-b4).max()/s:.2e}", flush=True)


if __name__ == "__main__":
    import sys
    arg = sys.argv[1] if len(sys.argv) > 1 else "1"
    {"1": main, "2": main2, "3": main3, "4": main4}[arg]()
