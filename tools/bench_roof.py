"""Measure practical HBM stream roofs on the attached chip: reduce, copy,
and a Pallas streaming reduce (what a well-formed kernel can expect)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32
LAT = 0.027
MB = 256
shape = (MB * 1024 * 1024 // 4 // 128, 128)


def timed(tag, chainfn, x, bytes_per_iter):
    float(chainfn(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chainfn(x))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    print(f"{tag:28s}: {bytes_per_iter/per/1e9:7.1f} GB/s  ({per*1e3:.2f} ms)")


def main():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=shape), jnp.float32)
    nbytes = x.size * 4

    @jax.jit
    def red_chain(x):
        def body(c, _):
            # (1 + c*eps) forces per-iteration recompute (no hoisting)
            return jnp.sum(x * (1.0 + c * 1e-30)) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(1), None, length=N)
        return c
    timed("XLA reduce-sum", red_chain, x, nbytes)

    @jax.jit
    def copy_chain(x):
        def body(c, _):
            return c * 1.0000001 + 0.0, ()
        c, _ = jax.lax.scan(body, x, None, length=N)
        return c.sum()
    timed("XLA scale (r+w)", copy_chain, x, 2 * nbytes)

    # Pallas streaming reduce: grid over row-chunks, accumulate in VMEM
    CH = 512

    def kern(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    grid = (shape[0] // CH,)
    pk = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((CH, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )

    @jax.jit
    def pallas_chain(x):
        def body(c, _):
            return jnp.sum(pk(x * (1.0 + c * 1e-30))) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(1), None, length=N)
        return c
    timed("Pallas stream reduce (r+w)", pallas_chain, x, 2 * nbytes)


if __name__ == "__main__":
    main()
