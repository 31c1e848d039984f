"""Config #3 round-trip benchmark: fused Pallas kernels vs the XLA BDT path.

Round trip = EvI (scaled) then IvE (scaled) on the real Greenland 5 km x
ModelE 2x2.5 matrix set, 8 fields; E stays in E3 layout between directions.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from icebin_tpu.ops.bdt import apply_bdt
from icebin_tpu.ops.pallas_bdt import (pallas_from_weighted,
                                       apply_small_blocked,
                                       apply_ice_blocked)

N = 64
LAT = 0.027


def timed(tag, chainfn, *args, bytes_per_iter=None):
    float(chainfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chainfn(*args))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    gbs = "" if bytes_per_iter is None else (
        f" -> {bytes_per_iter/per/1e9:6.1f} GB/s effective")
    print(f"{tag:28s}: {per*1e6:8.1f} us/round-trip{gbs}")
    return per


def main():
    import dataclasses
    from icebin_tpu.ops.bdt import bdt_from_weighted
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    evi = bdt_from_weighted(Me, small_axis="rows")
    ive = dataclasses.replace(evi, transposed=not evi.transposed)
    rng = np.random.default_rng(0)
    nvar = 8
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (nvar, evi.nice)), jnp.float32)
    nov = 0 if pm.ov_s is None else pm.ov_s.size
    print(f"T={pm.T} W8={pm.W8} nchunk={pm.nchunk} nblkpad={pm.nblkpad} "
          f"tiles={pm.tiles2.size*4/1e6:.1f}MB overflow={nov}")

    # correctness cross-check vs the XLA path
    e_ref = np.asarray(apply_bdt(evi, fI, scale=True, fill=0.0))
    fb = pm.ice_to_blocked(fI)
    e3 = apply_small_blocked(pm, fb, scale=True)
    e_got = np.asarray(pm.e3_to_small(e3))
    err = np.max(np.abs(e_got - e_ref) / (np.abs(e_ref) + 1e-9))
    i_ref = np.asarray(apply_bdt(ive, jnp.asarray(e_ref), scale=True,
                                 fill=0.0))
    i_got = np.asarray(pm.blocked_to_ice(
        apply_ice_blocked(pm, e3, scale=True)))
    erri = np.max(np.abs(i_got - i_ref) / (np.abs(i_ref) + 1e-9))
    print(f"vs XLA path: EvI rel err {err:.2e}, IvE rel err {erri:.2e}")
    assert err < 1e-4 and erri < 1e-4

    # XLA BDT chain (what bench.py currently measures)
    @jax.jit
    def chain_xla(e, i, f):
        def body(c, _):
            ee = apply_bdt(e, c, scale=True, fill=0.0)
            return apply_bdt(i, ee, scale=True, fill=0.0), ()
        c, _ = jax.lax.scan(body, f, None, length=N)
        return c.sum()
    bytes_xla = (2 * evi.tiles.size * 4
                 + (0 if evi.scat_onehot is None
                    else 2 * evi.scat_onehot.size * 4)
                 + 2 * nvar * (evi.nice + evi.nsmall) * 4)
    timed("XLA BDT", chain_xla, evi, ive, fI, bytes_per_iter=bytes_xla)

    # Pallas chain (blocked/E3 layouts end to end)
    @jax.jit
    def chain_pl(p, fb0):
        def body(c, _):
            e3 = apply_small_blocked(p, c, scale=True)
            return apply_ice_blocked(p, e3, scale=True), ()
        c, _ = jax.lax.scan(body, fb0, None, length=N)
        return c.sum()
    timed("Pallas fused", chain_pl, pm, fb,
          bytes_per_iter=pm.stream_bytes)


if __name__ == "__main__":
    main()
