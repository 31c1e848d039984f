"""Kernel-tunables sweep for the attached chip (VERDICT r2 item #9,
round-4 methodology fix: VERDICT r3 item #9).

Sweeps the fused-kernel tunables (ps_chunk, sec_blocks) on two synthetic
matrices shaped like the named workloads (config #3 Greenland-scale and
config #5 Antarctica-scale), checks correctness per configuration against
the default-config apply, and prints a ``icebin_tpu.ops.tuning`` table
entry for the measured device kind.

Timing is the BENCH-IDENTICAL two-point round-trip chain (the same
methodology as tools/tune_real.py and bench.py: the EvI∘IvE scan timed at
two chain lengths, slope = per-round-trip time, so the relay sync latency
cancels EXACTLY): the r3 sweep's chain carried an extra full-array
multiply per iteration and short chains, which rode relay-latency noise
and once mis-ordered 256/512 ahead of 128/1024 (ops/tuning.py history).

Run on any chip:  python tools/autotune.py  [--quick] [--real]
``--real`` sweeps on the REAL config-#3 Greenland matrix (slower build,
definitive; the synthetic default reproduces the same ordering on v5e).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit_rt(pm, fb, n1=64, n2=320, reps=6):
    """Two-point round-trip chain, bench methodology (relay cancels)."""
    import jax
    from icebin_tpu.ops import pallas_bdt as pb

    def mk(n):
        @jax.jit
        def chain(p, f0):
            def body(c, _):
                e3 = pb.apply_small_blocked(p, c, scale=True)
                return pb.apply_ice_blocked(p, e3, scale=True), ()
            c, _ = jax.lax.scan(body, f0, None, length=n)
            return c.sum()
        return chain
    c1, c2 = mk(n1), mk(n2)
    float(c1(pm, fb)); float(c2(pm, fb))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1(pm, fb))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(pm, fb))
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
    ap.add_argument("--real", action="store_true",
                    help="sweep on the REAL config-#3 Greenland matrix "
                         "(tools/tune_real.py's workload)")
    ap.add_argument("--configs", default=None,
                    help="comma list of psc:sec pairs (e.g. "
                         "'128:1024,256:512'); default = the 3x3 grid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb

    kind = jax.devices()[0].device_kind
    print(f"# device_kind = {kind!r}", flush=True)

    if args.real:
        from tools.tune_real import build_weighted
        mats = [build_weighted()]
    else:
        sizes = ([(200_000, 6_000)] if args.quick
                 else [(160_000, 8_000), (1_254_400, 30_000)])
        mats = [synthetic_matrix(n, s) for n, s in sizes]
    rng = np.random.default_rng(0)

    if args.configs:
        cands = [tuple(int(x) for x in c.split(":"))
                 for c in args.configs.split(",")]
    else:
        # round 5: the VMEM unlock makes full sections affordable, so the
        # grid centers on large sec_blocks; ps_chunk stays the dominant
        # knob (W8 band width scales with it)
        cands = [(psc, sec) for psc in (64, 128, 256)
                 for sec in (1024, 2048, 4096)]

    results = {}
    for (psc, sec) in cands:
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
                n1, n2 = (16, 80) if pm.npspad >= 8192 else (64, 320)
                total += timeit_rt(pm, fb, n1=n1, n2=n2,
                                   reps=4 if args.quick else 6)
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
                                w8_cap=2048,
                                vmem_limit=int(pb.VMEM_LIMIT))}))
    print("# NOTE: vmem_limit above is the CURRENT module value; run "
          "tools/probe_vmem-style buffer doubling (see ops/pallas_bdt "
          "VMEM_LIMIT docstring) to measure the chip's real headroom "
          "before raising it on a new device kind")


if __name__ == "__main__":
    main()
