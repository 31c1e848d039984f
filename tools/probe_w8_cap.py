"""Real-chip effect of the W8 quantile cap on the Antarctica apply chain.

The band one-hot matmuls cost ~W8 per chunk; Antarctica's W8=368 comes
from its worst chunk while the median spread is 173 (probe_w8_spread).
Sweeps w8_quantile at nv=16 and prints per-8-field round-trip times plus
the demoted-entry count.  Conservation-gated vs the host f64 oracle.
Run: python tools/probe_w8_cap.py [quantiles...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.probe_ant_nv import build_weighted, timeit  # noqa: E402

N1, N2 = 8, 56


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb

    qs = [float(a) for a in sys.argv[1:]] or [1.0, 0.95, 0.90, 0.75, 0.50]
    Me = build_weighted()
    time.sleep(5.0)
    rng = np.random.default_rng(0)
    f1 = np.asarray(rng.uniform(1.0, 2.0, Me.shape[1]))
    m_src = np.sum(f1 * Me.Mw)

    for q in qs:
        pm = pb.pallas_from_weighted(Me, small_axis="rows", nv=16,
                                     w8_quantile=q)
        nov = 0 if pm.ov_s is None else int(pm.ov_s.size)
        dev = np.asarray(pb.apply_small(pm, jnp.asarray(f1, jnp.float32)),
                         np.float64)
        m_dev = np.nansum(np.where(np.isfinite(dev), dev, 0.0) * Me.wM)
        rel = abs(m_dev - m_src) / abs(m_src)
        assert rel < 1e-5, f"conservation gate failed at q={q}: {rel}"

        e3 = pm.small_to_e3(jnp.asarray(
            rng.uniform(0.5, 1.5, (16, pm.nsmall)), jnp.float32))

        def mk(n, _pm=pm, _e3=e3):
            @jax.jit
            def chain(p, e0):
                def body(c, _):
                    fI = pb.apply_ice_blocked(p, c, scale=True)
                    return pb.apply_small_blocked(p, fI, scale=True), ()
                c, _ = jax.lax.scan(body, e0, None, length=n)
                return c.sum()
            return lambda: chain(_pm, _e3)

        per = timeit(mk)
        print(f"q={q:4.2f}: W8={pm.W8:4d} nov={nov:6d} "
              f"rt={1e6*per:7.1f} us  per-8={1e6*per/2:7.1f} us "
              f"(cons {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
