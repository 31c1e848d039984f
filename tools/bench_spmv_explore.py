"""Explore XLA SpMV/SpMM throughput on the real chip (design probe).
Single-call timing; problem sized so kernel time >> dispatch overhead,
which is measured separately and subtracted."""
import time
import numpy as np
import jax, jax.numpy as jnp

def timed(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def main():
    rng = np.random.default_rng(0)
    # dispatch overhead
    trivial = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    overhead = timed(trivial, x0, iters=20)
    print(f"dispatch overhead: {overhead*1e3:.2f} ms")

    nI, K, nE, nvar = 4_000_000, 4, 65_000, 8
    base = (np.arange(nI) * (nE // nI)).astype(np.int64)
    cols = np.clip(base[:, None] + rng.integers(-1000, 1000, (nI, K)), 0, nE - 1).astype(np.int32)
    vals = jnp.asarray(rng.uniform(0.5, 1.0, (nI, K)), jnp.float32)
    colsj = jnp.asarray(cols); del cols
    fE = jnp.asarray(rng.uniform(0, 1, (nvar, nE)), jnp.float32)

    @jax.jit
    def ell_apply(cols, vals, f):
        g = jnp.take(f, cols.reshape(-1), axis=1).reshape(nvar, nI, K)
        return jnp.einsum("vrk,rk->vr", g, vals)
    t = timed(ell_apply, colsj, vals, fE) - overhead
    nnz = nI * K
    bytes_ = nnz*4 + nnz*4 + nvar*nnz*4 + nvar*nI*4
    print(f"ELL dest-I: {t*1e3:.3f} ms/apply, logical {bytes_/1e6:.0f} MB -> {bytes_/t/1e9:.1f} GB/s")

    nnz2 = 16_000_000
    rows2 = np.sort(rng.integers(0, nE, nnz2)).astype(np.int32)
    cols2 = rng.integers(0, nI, nnz2).astype(np.int32)
    vals2 = jnp.asarray(rng.uniform(0.5, 1, nnz2), jnp.float32)
    rows2j, cols2j = jnp.asarray(rows2), jnp.asarray(cols2)
    fI = jnp.asarray(rng.uniform(0, 1, (nvar, nI)), jnp.float32)

    @jax.jit
    def coo_apply(rows, cols, vals, f):
        g = jnp.take(f, cols, axis=1) * vals[None, :]
        return jax.vmap(lambda c: jax.ops.segment_sum(c, rows, num_segments=nE, indices_are_sorted=True))(g)
    t2 = timed(coo_apply, rows2j, cols2j, vals2, fI) - overhead
    bytes2 = nnz2*(4+4) + nvar*nnz2*4 + nvar*nE*4
    print(f"COO dest-E: {t2*1e3:.3f} ms/apply, logical {bytes2/1e6:.0f} MB -> {bytes2/t2/1e9:.1f} GB/s")

    # contiguous-run streaming (pallas design target): vals * fx row-major reduce per row run
    # modeled as a dense (nvar, nnz) elementwise multiply + row-window sum via reshape (uniform runs)
    run = 1024
    nrows3 = nnz2 // run
    fx = jnp.asarray(rng.uniform(0, 1, (nvar, nnz2)), jnp.float32)
    @jax.jit
    def stream(vals, fx):
        prod = vals[None, :] * fx
        return prod.reshape(nvar, nrows3, run).sum(-1)
    t3 = timed(stream, vals2, fx) - overhead
    bytes3 = nnz2*4 + nvar*nnz2*4 + nvar*nrows3*4
    print(f"uniform-run stream: {t3*1e3:.3f} ms, logical {bytes3/1e6:.0f} MB -> {bytes3/t3/1e9:.1f} GB/s")

if __name__ == "__main__":
    main()
