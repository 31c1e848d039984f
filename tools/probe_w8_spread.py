"""Per-chunk window-spread distribution of the production packs.

The band one-hot matmul's cost is ~ W8 (the GLOBAL max per-chunk window
spread, pallas_bdt.py _finish_pack).  If the spread distribution has a
tight body and a heavy tail, capping W8 at a quantile and demoting the
tail tiles to the COO overflow epilogue would shrink every chunk's band
matmul.  This probe measures the actual distribution for the config-#3
Greenland and Antarctica EvI/IvE packs.  Run: python tools/probe_w8_spread.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def spread_stats(name, pm):
    C2 = pm.w_offT.shape[0] // pm.nchunkpad
    off = np.asarray(pm.w_offT).reshape(pm.nchunkpad, C2)[:pm.nchunk]
    sp = off.max(axis=1) + 1
    qs = np.quantile(sp, [0.5, 0.9, 0.95, 0.99, 1.0])
    # tiles that would demote at each candidate cap (multiples of 8)
    print(f"{name}: nchunk={pm.nchunk} W8={pm.W8} "
          f"spread q50/q90/q95/q99/max = "
          + "/".join(f"{int(q)}" for q in qs))
    for cap_q in (0.90, 0.95, 0.99):
        cap = int(-(-int(np.quantile(sp, cap_q)) // 8) * 8)
        n_oob = int((off >= cap).sum())
        total = off.size
        print(f"  cap@q{int(cap_q*100)}={cap}: demotes {n_oob} "
              f"pseudo-rows of {total} ({100*n_oob/total:.2f}%), "
              f"band work x{cap/pm.W8:.3f}")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # host-side packing probe
    from icebin_tpu.ops.pallas_bdt import pallas_from_weighted
    from tools.probe_ant_nv import build_weighted
    M = build_weighted()
    pm = pallas_from_weighted(M, small_axis="rows", nv=16)
    spread_stats("antarctica EvI pack (nv=16)", pm)


if __name__ == "__main__":
    main()
