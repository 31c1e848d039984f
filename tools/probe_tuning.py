"""Tune BLK_STEP for the streaming kernels + measure kernel-boundary cost."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops import pallas_bdt as pb

N = 64
LAT = 0.027


def timeit(tag, fn, *consts, carry):
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
    print(f"{tag:40s}: {per*1e6:8.1f} us/iter")
    return per


def main():
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    e3 = pb.apply_small_blocked(pm, fb, scale=True)
    fwin3 = jnp.zeros((pm.nblkpad, pm.T * 8, pm.NV), jnp.float32)
    tb = pm.tiles2.size * 4

    for bs in (8, 16, 32, 64):
        pb.BLK_STEP = bs
        t = timeit(f"A1 prods BLK_STEP={bs}",
                   lambda p, f: pb._mk_prods(p, False)(p.tiles2, f),
                   pm, carry=fb)
        print(f"{'':40s}   -> {tb/t/1e9:6.1f} GB/s")
        t = timeit(f"B2 contract BLK_STEP={bs}",
                   lambda p, f: pb._mk_contract(p, True, False)(
                       f, p.tiles2, p.winvI_blk),
                   pm, carry=fwin3)
        print(f"{'':40s}   -> {tb/t/1e9:6.1f} GB/s")
    pb.BLK_STEP = 8

    # boundary cost: two dependent A1 calls in one body vs one
    def two_a1(p, f):
        pr = pb._mk_prods(p, False)(p.tiles2, f)
        return pb._mk_prods(p, False)(p.tiles2,
                                      f * (1.0 + jnp.sum(pr) * 1e-37))
    timeit("A1 x2 dependent", two_a1, pm, carry=fb)


if __name__ == "__main__":
    main()
