"""The real A1 prods kernel on synthetic data at Greenland vs Antarctica
grid depths (same block shapes, same per-step work -- only nstep and total
array size differ). Isolates the scale-dependent slowdown seen in
probe_antarctica (197 GB/s vs 613)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icebin_tpu.ops import pallas_bdt as pb

N1, N2 = 8, 40


def timeit(tag, fn, *consts, carry, bytes_=None):
    def mk(n):
        @jax.jit
        def chain(cs, f0):
            def body(c, _):
                out = fn(*cs, c)
                return c * (1.0 + jnp.sum(out[0, 0]) * 1e-37), ()
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
    print(f"{tag:40s}: {per*1e6:8.1f} us/iter{gbs}", flush=True)
    return per


def mk_prods(nrows, bs, passes):
    T8, NV = 32, 8

    def kernel(B, tiles_ref, f_ref, out_ref):
        for b in range(B):
            if passes >= 6:
                out_ref[b] = jax.lax.dot_general(
                    tiles_ref[b], f_ref[b], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                t = tiles_ref[b]
                f = f_ref[b]
                thi = t.astype(jnp.bfloat16)
                tlo = (t - thi.astype(jnp.float32)).astype(jnp.bfloat16)
                fhi = f.astype(jnp.bfloat16)
                flo = (f - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
                dims = (((1,), (1,)), ((), ()))
                acc = jax.lax.dot_general(
                    thi, fhi, dims, preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    tlo, fhi, dims, preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    thi, flo, dims, preferred_element_type=jnp.float32)
                out_ref[b] = acc

    return pl.pallas_call(
        functools.partial(kernel, bs),
        grid=(nrows // bs,),
        in_specs=[
            pl.BlockSpec((bs, T8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, NV, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, T8, NV), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, T8, NV), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    for nrows, tag in ((2048, "greenland-depth"), (15360, "antarctica-depth")):
        t = jnp.asarray(rng.uniform(-1, 1, (nrows, 32, 128)), jnp.float32)
        nb = nrows * 32 * 128 * 4 + nrows * 8 * 128 * 4
        f = jnp.asarray(rng.uniform(-1, 1, (nrows, 8, 128)), jnp.float32)
        for bs in (64, 128, 256):
            for passes in (3,):
                fn = mk_prods(nrows, bs, passes)
                timeit(f"prods {tag} bs={bs} p={passes}",
                       lambda tt, c, fn=fn: fn(tt, c),
                       t, carry=f, bytes_=nb)


if __name__ == "__main__":
    main()
