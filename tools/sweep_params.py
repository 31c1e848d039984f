"""Sweep Pallas BDT kernel parameters on the real config-#3 matrices.

Builds the Greenland 5 km matrix set once, then re-times the chained
EvI∘IvE round trip for each (BLK_STEP, CH_GROUP) combo and for the
precision variant selected by ICEBIN_ONEHOT_SPLIT.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from icebin_tpu.ops import pallas_bdt as pb

    N = 64
    LAT = 0.027
    mats = B.build_matrices()
    (pm, Me, Mi) = mats["greenland"]
    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (pm.NV, pm.nice)), jnp.float32))

    # accuracy reference (host f64)
    import scipy.sparse as sp
    f = np.asarray(pm.blocked_to_ice(fb))
    M = sp.coo_matrix((Me.vals, (Me.rows, Me.cols)), shape=Me.shape).tocsr()
    wM = np.asarray(Me.wM, np.float64)
    refE = (M @ f.T).T / np.where(wM == 0, 1, wM)[None, :]

    def run(tag):
        # re-jit with fresh kernel closures
        @jax.jit
        def chain(m, f0):
            def body(c, _):
                e3 = pb.apply_small_blocked(m, c, scale=True)
                return pb.apply_ice_blocked(m, e3, scale=True), ()
            c, _ = jax.lax.scan(body, f0, None, length=N)
            return c.sum(), pb.apply_small_blocked(m, f0, scale=True)

        s, e3 = chain(pm, fb)
        float(s)
        got = np.asarray(pm.e3_to_small(e3), np.float64)[:, :len(wM)]
        err = np.nanmax(np.abs(got - refE)[:, wM != 0]
                        / np.maximum(np.abs(refE[:, wM != 0]), 1e-12))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(pm, fb)[0])
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - LAT) / N
        gbps = pm.stream_bytes / per / 1e9
        print(f"{tag:28s}: {per*1e6:7.1f} us/rt  {gbps:6.1f} GB/s  "
              f"maxrel={err:.2e}", flush=True)

    run(f"base BLK={pb.BLK_STEP} CHG={pb.CH_GROUP}")
    for blk in (64, 256):
        pb.BLK_STEP = blk
        run(f"BLK_STEP={blk}")
    pb.BLK_STEP = 128


if __name__ == "__main__":
    sys.exit(main())
