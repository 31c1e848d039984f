"""Pure Pallas stream-reduce at Greenland (34 MB) vs Antarctica (250 MB)
array sizes: is big-array tile streaming itself slow, independent of the
SpMM kernels?"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1, N2 = 8, 40


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
    print(f"{tag:36s}: {per*1e6:8.1f} us/iter{gbs}", flush=True)
    return per


def _sum_kernel(x_ref, c_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = c_ref[:]        # carry-dependence keeps the call in
                                     # the scan (no loop-invariant hoist)

    out_ref[:] += jnp.sum(x_ref[:], axis=0)


def mk_stream(nrows, bs):
    return pl.pallas_call(
        _sum_kernel,
        grid=(nrows // bs,),
        in_specs=[pl.BlockSpec((bs, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((32, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    for nrows, tag in ((2048, "34MB"), (15360, "252MB")):
        x = jnp.asarray(rng.uniform(-1, 1, (nrows, 32, 128)), jnp.float32)
        nb = nrows * 32 * 128 * 4
        # carry must feed the chain: add scalar-dependence via the field
        for bs in (64, 128, 256, 512):
            fn = mk_stream(nrows, bs)
            timeit(f"stream {tag} bs={bs}",
                   lambda xx, c, fn=fn: fn(xx, c),
                   x, carry=jnp.zeros((32, 128), jnp.float32), bytes_=nb)


if __name__ == "__main__":
    main()
