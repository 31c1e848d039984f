"""Why is the chained round trip slower than the sum of its directions?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops import pallas_bdt as pb

N = 64
LAT = 0.027


def timeit(tag, chainfn, *args):
    float(chainfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chainfn(*args))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    print(f"{tag:34s}: {per*1e6:8.1f} us/iter")
    return per


def main():
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    e3 = pb.apply_small_blocked(pm, fb, scale=True)

    @jax.jit
    def only_evi(p, f0):
        def body(c, _):
            e = pb.apply_small_blocked(p, c, scale=True)
            return c * (1.0 + jnp.sum(e) * 1e-37), ()
        c, _ = jax.lax.scan(body, f0, None, length=N)
        return c.sum()

    @jax.jit
    def only_ive(p, e0):
        def body(c, _):
            o = pb.apply_ice_blocked(p, c * 0 + e0, scale=True)
            return c * (1.0 + jnp.sum(o) * 1e-37), ()
        c, _ = jax.lax.scan(body, e0, None, length=N)
        return c.sum()

    @jax.jit
    def rt(p, f0):
        def body(c, _):
            e = pb.apply_small_blocked(p, c, scale=True)
            return pb.apply_ice_blocked(p, e, scale=True), ()
        c, _ = jax.lax.scan(body, f0, None, length=N)
        return c.sum()

    timeit("EvI only", only_evi, pm, fb)
    timeit("IvE only", only_ive, pm, e3)
    timeit("round trip", rt, pm, fb)


if __name__ == "__main__":
    main()
