"""Kernel-tunables sweep for the attached chip (VERDICT r2 item #9).

Sweeps the fused-kernel tunables (ps_chunk, sec_blocks) on two synthetic
matrices shaped like the named workloads (config #3 Greenland-scale and
config #5 Antarctica-scale), checks correctness per configuration against
the default-config apply, and prints a ``icebin_tpu.ops.tuning`` table
entry for the measured device kind.

Run on any chip:  python tools/autotune.py  [--quick]
"""
import argparse
import json
import time

import numpy as np


def timeit(fn, consts, carry, n1=8, n2=40):
    import jax
    import jax.numpy as jnp

    def mk(n):
        @jax.jit
        def chain(cs, f0):
            def body(c, _):
                out = fn(*cs, c)
                return f0 * (1.0 + jnp.sum(out) * 1e-37), ()
            c, _ = jax.lax.scan(body, f0, None, length=n)
            return c.sum()
        return chain
    c1, c2 = mk(n1), mk(n2)
    float(c1(consts, carry)); float(c2(consts, carry))
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(c1(consts, carry))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(consts, carry))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def synthetic_matrix(nice, nsmall, seed=0, spread=40):
    from icebin_tpu.regrid.sparse import WeightedMatrix
    rng = np.random.default_rng(seed)
    c = np.arange(nice, dtype=np.int64)
    s_base = (c * (nsmall - spread - 4)) // nice
    rows, cols, vals = [], [], []
    for d in (0, 1):
        jitter = rng.integers(0, spread, nice)
        rows.append(s_base + d + jitter)
        cols.append(c)
        vals.append(rng.uniform(0.1, 1.0, nice))
    return WeightedMatrix(rows=np.concatenate(rows),
                          cols=np.concatenate(cols),
                          vals=np.concatenate(vals),
                          shape=(nsmall, nice))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller matrices / fewer reps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb

    kind = jax.devices()[0].device_kind
    print(f"# device_kind = {kind!r}", flush=True)

    sizes = ([(200_000, 6_000)] if args.quick
             else [(160_000, 8_000), (1_254_400, 30_000)])
    mats = [synthetic_matrix(n, s) for n, s in sizes]
    rng = np.random.default_rng(0)

    best = {}
    results = {}
    for psc in (64, 128, 256):
        for sec in (512, 1024, 2048):
            pb.PS_CHUNK, pb.SEC_BLOCKS = psc, sec
            pb._TUNED = True            # pin the sweep values
            total = 0.0
            ok = True
            try:
                for M in mats:
                    pm = pb.pallas_from_weighted(M, small_axis="rows", nv=8)
                    fI = jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)),
                                     jnp.float32)
                    fb = pm.ice_to_blocked(fI)
                    # conservation gate per config
                    e3 = pb.apply_small_blocked(pm, fb, scale=True)
                    dev = np.asarray(pm.e3_to_small(e3)[0], np.float64)
                    m_dev = np.sum(np.where(np.isfinite(dev), dev, 0.0)
                                   * np.asarray(pm.wS, np.float64))
                    m_src = np.sum(np.asarray(fI[0], np.float64)
                                   * np.asarray(pm.wI, np.float64))
                    if abs(m_dev - m_src) / abs(m_src) > 1e-5:
                        ok = False
                        break
                    ta = timeit(lambda p, f: pb.apply_small_blocked(p, f),
                                (pm,), fb)
                    tb = timeit(lambda p, x: pb.apply_ice_blocked(p, x),
                                (pm,), e3)
                    total += ta + tb
            except Exception as exc:     # e.g. scoped-VMEM OOM: skip config
                print(f"  skip ({type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:90]})", flush=True)
                ok = False
            results[(psc, sec)] = total if ok else float("inf")
            print(f"ps_chunk={psc:4d} sec_blocks={sec:5d}: "
                  f"{'FAIL' if not ok else f'{1e6*total:8.1f} us total rt'}",
                  flush=True)
    (psc, sec) = min(results, key=results.get)
    key = kind.lower().replace(" ", "").replace("tpu", "")
    print("\n# paste into icebin_tpu/ops/tuning.py _TABLE:")
    print(json.dumps({key: dict(ps_chunk=psc, sec_blocks=sec,
                                w8_cap=2048)}))


if __name__ == "__main__":
    main()
