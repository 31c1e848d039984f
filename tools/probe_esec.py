"""On-chip probe: E-section-split fused kernels at global-EC-class width.

Builds a banded random matrix whose E space spans several E_SEC sections,
runs both fused apply directions on the attached TPU (real Mosaic, not
interpret), checks against the dense f64 reference, and times the round
trip.  Run:  python tools/probe_esec.py [nsmall] [nice]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from icebin_tpu.ops.pallas_bdt import (E_SEC, apply_ice_blocked,
                                           apply_small_blocked,
                                           pallas_from_weighted)
    from icebin_tpu.regrid.sparse import WeightedMatrix

    nsmall = int(sys.argv[1]) if len(sys.argv) > 1 else (E_SEC * 8) * 3 + 40
    nice = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    nnz = 8 * nice
    rng = np.random.default_rng(0)
    cols = rng.integers(0, nice, nnz)
    center = (cols.astype(np.int64) * nsmall) // nice
    rows = np.clip(center + rng.integers(-60, 61, nnz), 0, nsmall - 1)
    vals = rng.uniform(0.1, 2.0, nnz)
    key = rows.astype(np.int64) * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    M = WeightedMatrix(rows=(uk // nice).astype(np.int64),
                       cols=(uk % nice).astype(np.int64),
                       vals=np.bincount(inv, weights=vals),
                       shape=(nsmall, nice))
    t0 = time.perf_counter()
    pm = pallas_from_weighted(M, small_axis="rows")
    print(f"pack {time.perf_counter() - t0:.2f}s  nesec={pm.nesec} "
          f"groups={len(pm.egroups)} nchunk={pm.nchunk} W8={pm.W8} "
          f"NWpad={pm.NWpad} nblkpad={pm.nblkpad} "
          f"ov={0 if pm.ov_s is None else len(pm.ov_s)}", flush=True)
    for g in pm.egroups:
        print(f"  group esec={g[2]} chunks=[{g[0]},{g[1]}) "
              f"isecs=[{g[3]},{g[4]})", flush=True)

    f = rng.uniform(-1.0, 1.0, (pm.NV, nice)).astype(np.float32)
    fb = pm.ice_to_blocked(f)
    e3 = apply_small_blocked(pm, fb, scale=True)
    out = np.asarray(pm.e3_to_small(e3))
    import scipy.sparse as sp
    D = sp.coo_matrix((M.vals, (M.rows, M.cols)), shape=M.shape).tocsr()
    wS = np.asarray(D.sum(axis=1)).ravel()
    wI = np.asarray(D.sum(axis=0)).ravel()
    ref = (D @ f.T).T / np.where(wS == 0, 1.0, wS)[None, :]
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-30)
    print(f"dest-small maxrel={err:.2e}", flush=True)
    assert err < 1e-4

    g2 = rng.uniform(-1.0, 1.0, (pm.NV, nsmall)).astype(np.float32)
    e3i = pm.small_to_e3(g2)
    fbo = apply_ice_blocked(pm, e3i, scale=True)
    outi = np.asarray(pm.blocked_to_ice(fbo))
    refi = (D.T @ g2.T).T / np.where(wI == 0, 1.0, wI)[None, :]
    erri = np.max(np.abs(outi - refi)) / max(np.max(np.abs(refi)), 1e-30)
    print(f"dest-ice  maxrel={erri:.2e}", flush=True)
    assert erri < 1e-4

    # time the EvI∘IvE round trip
    import jax.numpy as jnp

    @jax.jit
    def rt(fb):
        e3 = apply_small_blocked(pm, fb, scale=True)
        return apply_ice_blocked(pm, e3, scale=True)

    r = rt(fb)
    jax.block_until_ready(r)
    n1, n2 = 8, 40
    ts = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(n):
            r = rt(fb)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / (n2 - n1)
    gbps = pm.stream_bytes / dt / 1e9
    print(f"round trip {1e6 * dt:.0f} us  ({gbps:.0f} GB/s eff, "
          f"{pm.stream_bytes / 1e6:.0f} MB)", flush=True)
    print("OK")


if __name__ == "__main__":
    main()
