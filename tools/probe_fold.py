"""How fast can XLA fold (N, 8, 8) -> (N, 64) on TPU? (the A1->A2 glue)"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 64
LAT = 0.027
NB, T8, NV = 1344, 80, 8
NT = NB * T8 // 8


def timeit(tag, fn, x):
    @jax.jit
    def chain(x0):
        def body(c, _):
            out = fn(c)
            s = jnp.sum(out) * 1e-37
            return c * (1.0 + s), ()
        c, _ = jax.lax.scan(body, x0, None, length=N)
        return c.sum()
    float(chain(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    print(f"{tag:38s}: {per*1e6:8.1f} us/iter")


def main():
    rng = np.random.default_rng(0)
    p3 = jnp.asarray(rng.uniform(size=(NB, T8, NV)), jnp.float32)

    timeit("reshape (NB,T8,NV)->(NT,64)",
           lambda x: x.reshape(NT, 8 * NV) + 1.0, p3)

    K = np.zeros((8, NV, 8 * NV), np.float32)
    for r in range(8):
        for v in range(NV):
            K[r, v, r * NV + v] = 1.0
    Kj = jnp.asarray(K)
    timeit("einsum nrv,rvl->nl (onehot K)",
           lambda x: jnp.einsum("nrv,rvl->nl",
                                x.reshape(NT, 8, NV), Kj,
                                preferred_element_type=jnp.float32), p3)

    # 8 slice-matmuls with static embedding matrices
    Ers = [jnp.asarray(K[r]) for r in range(8)]
    def slicemm(x):
        x3 = x.reshape(NT, 8, NV)
        out = x3[:, 0, :] @ Ers[0]
        for r in range(1, 8):
            out = out + x3[:, r, :] @ Ers[r]
        return out
    timeit("8x slice @ E_r", slicemm, p3)

    # pure transpose cost for scale: (NB,T8,NV) -> (NB,NV,T8)
    timeit("transpose (NB,T8,NV)->(NB,NV,T8)",
           lambda x: x.transpose(0, 2, 1) + 1.0, p3)

    # what if A1 emitted (NB, 8, T, NV) row-major (r,t)? fold = reshape too
    p4 = jnp.asarray(rng.uniform(size=(NB, 8, T8 // 8, NV)), jnp.float32)
    timeit("reshape (NB,8,T,NV)->(NB*8*T,NV)",
           lambda x: x.reshape(NB * 8 * (T8 // 8), NV) + 1.0, p4)


if __name__ == "__main__":
    main()
