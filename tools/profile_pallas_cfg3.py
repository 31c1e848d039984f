"""Per-kernel timing of the fused Pallas BDT pipeline at config #3."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops import pallas_bdt as pb

N = 64
LAT = 0.027


def timeit(tag, fn, *consts, carry, bytes_=None):
    @jax.jit
    def chain(cs, f0):
        def body(c, _):
            out = fn(*cs, c)
            return f0 * (1.0 + jnp.sum(out) * 1e-37), ()
        c, _ = jax.lax.scan(body, f0, None, length=N)
        return c.sum()
    float(chain(consts, carry))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(consts, carry))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    gbs = "" if bytes_ is None else f" -> {bytes_/per/1e9:6.1f} GB/s"
    print(f"{tag:30s}: {per*1e6:8.1f} us/iter{gbs}")
    return per


def main():
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    nvar = 8
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (nvar, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    tb = pm.tiles2.size * 4
    pbytes = pm.nblkpad * pm.T * 8 * pm.NV * 4
    e3 = pb.apply_small_blocked(pm, fb, scale=True)
    p2 = jnp.zeros((pm.nblkpad * pm.T, 8 * pm.NV), jnp.float32)
    fwin3 = jnp.zeros((pm.nblkpad, pm.T * 8, pm.NV), jnp.float32)

    timeit("A1 prods (tiles stream)",
           lambda p, f: pb._mk_prods(p, False)(p.tiles2, f), pm, carry=fb,
           bytes_=tb + pbytes)
    timeit("A2 scatter",
           lambda p, q: pb._mk_scatter(p, False)(p.base, q, p.w_off),
           pm, carry=p2, bytes_=pbytes)
    timeit("B1 gather",
           lambda p, e: pb._mk_gather(p, False)(p.base, e, p.w_offT),
           pm, carry=e3, bytes_=pbytes)
    timeit("B2 contract (tiles stream)",
           lambda p, f: pb._mk_contract(p, True, False)(f, p.tiles2,
                                                        p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    timeit("EvI full", lambda p, f: pb.apply_small_blocked(p, f, scale=True),
           pm, carry=fb, bytes_=pm.bytes_small)
    timeit("IvE full", lambda p, e: pb.apply_ice_blocked(p, e, scale=True),
           pm, carry=e3, bytes_=pm.bytes_ice)


if __name__ == "__main__":
    main()
