"""Break down where config #3 (real Greenland 5 km) round-trip time goes.

Times each sub-stage of the BDT apply as its own N-rep chained jit so the
op-overhead shows up per stage: the tile einsums alone, the band
scatter/gather machinery, and the full directions.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops import bdt as bdtmod
from icebin_tpu.ops.bdt import apply_bdt, TILE_C

N = 64
LAT = 0.027


def timeit(tag, fn, *consts, carry):
    """fn(*consts, carry) must return an array broadcastable with carry."""
    @jax.jit
    def chain(cs, f0):
        def body(c, _):
            out = fn(*cs, c)
            # re-inject a scalar of the output into the carry: dependency
            # chain without requiring shape match
            return f0 + jnp.sum(out) * 1e-30, ()
        c, _ = jax.lax.scan(body, f0, None, length=N)
        return c.sum()
    float(chain(consts, carry))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(consts, carry))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    print(f"{tag:42s}: {per*1e6:9.1f} us/iter")
    return per


def main():
    import dataclasses
    from icebin_tpu.ops.bdt import bdt_from_weighted
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    evi = bdt_from_weighted(Me, small_axis="rows")
    ive = dataclasses.replace(evi, transposed=not evi.transposed)
    nblk, T = evi.row_start.shape
    nvar = 8
    print(f"nice={evi.nice} nsmall={evi.nsmall} nblk={nblk} T={T} "
          f"tiles={evi.tiles.size*4/1e6:.1f}MB "
          f"ov={0 if evi.ov_rows is None else evi.ov_rows.size}")
    if evi.scat_onehot is not None:
        print(f"scat_onehot {evi.scat_onehot.shape} "
              f"{evi.scat_onehot.size*4/1e6:.2f}MB wide="
              f"{0 if evi.scat_wide_idx is None else evi.scat_wide_idx.size}")
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (nvar, evi.nice)), jnp.float32)
    fS = jnp.asarray(rng.uniform(0.5, 1.5, (nvar, evi.nsmall)), jnp.float32)
    npad = nblk * TILE_C
    fIb = jnp.pad(fI, ((0, 0), (0, npad - evi.nice))).reshape(nvar, nblk,
                                                              TILE_C)

    timeit("dest-small tile einsum only",
           lambda t, f: jnp.einsum("btrc,vbc->vbtr", t, f,
                                   preferred_element_type=t.dtype),
           evi.tiles, carry=fIb)
    timeit("dest-small full",
           lambda b, f: bdtmod.tiles_dest_small_unscaled(
               b.tiles, b.row_start, f, b.nsmall, b.scat_onehot,
               b.scat_base, b.scat_wide_idx, b.scat_wide_rs),
           evi, carry=fIb)
    timeit("dest-ice full",
           lambda b, f: bdtmod.tiles_dest_ice_unscaled(
               b.tiles, b.row_start, f, b.scat_onehot, b.scat_base,
               b.scat_wide_idx, b.scat_wide_rs),
           evi, carry=fS)
    timeit("apply_bdt dest-small (EvI)",
           lambda b, f: apply_bdt(b, f, scale=True, fill=0.0),
           evi, carry=fI)
    timeit("apply_bdt dest-ice  (IvE)",
           lambda b, f: apply_bdt(b, f, scale=True, fill=0.0),
           ive, carry=fS)

    def rt(e, i, f):
        ee = apply_bdt(e, f, scale=True, fill=0.0)
        return apply_bdt(i, ee, scale=True, fill=0.0)
    timeit("full round trip", rt, evi, ive, carry=fI)


if __name__ == "__main__":
    main()
