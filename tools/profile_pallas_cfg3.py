"""Per-kernel timing of the fused Pallas BDT pipeline at config #3."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops import pallas_bdt as pb

N1, N2 = 32, 160


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
    print(f"{tag:30s}: {per*1e6:8.1f} us/iter{gbs}")
    return per


def main():
    mats, _ = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32)
    fb = pm.ice_to_blocked(fI)
    print(f"npspad={pm.npspad} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad} nblkpad={pm.nblkpad} ts={pm.ts} "
          f"tiles2={pm.tiles2.size*4/1e6:.1f} MB "
          f"ov={0 if pm.ov_s is None else pm.ov_s.size}")
    T8 = pm.ts * 8
    tb = pm.tiles2.size * 4
    pbytes = pm.npspad * T8 * pm.NV * 4
    e3 = pb.apply_small_blocked(pm, fb, scale=True)
    p2 = jnp.zeros((pm.npspad * pm.ts, 8 * pm.NV), jnp.float32)
    fwin3 = jnp.zeros((pm.npspad, T8, pm.NV), jnp.float32)
    fbp = jnp.take(fb, pm.pseudo2blk, axis=0)

    timeit("gather fbp (take)",
           lambda p, f: jnp.take(f, p.pseudo2blk, axis=0), pm, carry=fb,
           bytes_=2 * pm.npspad * pm.NV * 128 * 4)
    timeit("A1 prods (tiles stream)",
           lambda p, f: pb._mk_prods(p, False)(p.tiles2, f), pm, carry=fbp,
           bytes_=tb + pbytes)
    timeit("A2 scatter",
           lambda p, x: pb._mk_scatter(p, False)(
               p.base, x.reshape(p.npspad * p.ts, 8 * p.NV), p.w_off,
               p.winvS_e3),
           pm, carry=fwin3, bytes_=pbytes)
    timeit("B1 gather",
           lambda p, x: pb._mk_gather(p, False)(p.base, x, p.w_offT),
           pm, carry=e3, bytes_=pbytes)
    timeit("B2' contract_true",
           lambda p, x: pb._mk_contract_true(p, True, False)(
               p.pseudo2blk, p.sec_idx, p.sec_flags, x, p.tiles2,
               p.winvI_blk),
           pm, carry=fwin3, bytes_=tb + pbytes)
    timeit("full dest-small", lambda p, f: pb.apply_small_blocked(p, f),
           pm, carry=fb, bytes_=pm.bytes_small)
    timeit("full dest-ice", lambda p, x: pb.apply_ice_blocked(p, x),
           pm, carry=e3, bytes_=pm.bytes_ice)

    @jax.jit
    def rt(p, f):
        e = pb.apply_small_blocked(p, f, scale=True)
        return pb.apply_ice_blocked(p, e, scale=True)
    timeit("round trip", rt, pm, carry=fb, bytes_=pm.stream_bytes)


if __name__ == "__main__":
    main()
