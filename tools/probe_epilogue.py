"""Which part of apply_small_blocked costs 280us beyond the kernels?"""
import dataclasses
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


def main():
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    e3 = pb.apply_small_blocked(pm, fb, scale=True)
    pm0 = dataclasses.replace(pm, ov_s=None, ov_c=None, ov_v=None)

    timeit("EvI full (w/ overflow 765)",
           lambda p, f: pb.apply_small_blocked(p, f, scale=True),
           pm, carry=fb)
    timeit("EvI no-overflow",
           lambda p, f: pb.apply_small_blocked(p, f, scale=True),
           pm0, carry=fb)
    timeit("EvI no-overflow unscaled",
           lambda p, f: pb.apply_small_blocked(p, f, scale=False),
           pm0, carry=fb)
    timeit("IvE full (w/ overflow)",
           lambda p, e: pb.apply_ice_blocked(p, e, scale=True),
           pm, carry=e3)
    timeit("IvE no-overflow",
           lambda p, e: pb.apply_ice_blocked(p, e, scale=True),
           pm0, carry=e3)
    timeit("blocked_to_ice transpose",
           lambda p, f: p.blocked_to_ice(f) + 1.0, pm, carry=fb)
    timeit("A1+reshape+A2 manual",
           lambda p, f: pb._mk_scatter(p, False)(
               p.base,
               pb._mk_prods(p, False)(p.tiles2, f).reshape(
                   p.nblkpad * p.T, 8 * p.NV),
               p.w_off, p.winvS_e3),
           pm, carry=fb)


if __name__ == "__main__":
    main()
