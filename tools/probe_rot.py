"""Probe: ROTATED round-trip chain (carry = E3, the production order
IvE -> EvI) so the scan-carry copy is 2.1 MB instead of 8.4 MB.
Run: python tools/probe_rot.py"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from tools.probe_r4 import build_pm

    pm = build_pm()
    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    e3_0 = pb.apply_small_blocked(pm, fb, scale=True)

    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                fI = pb.apply_ice_blocked(pm, c, scale=True)
                return pb.apply_small_blocked(pm, fI, scale=True), ()
            c, _ = jax.lax.scan(body, e3_0, None, length=n)
            return c.sum()
        return chain

    c1, c2 = mk(64), mk(576)
    float(c1()); float(c2())
    t1s, t2s = [], []
    for _ in range(8):
        t0 = time.perf_counter(); float(c1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2())
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / 512
    print(f"rt rotated: {1e6*per:6.1f} us "
          f"({pm.stream_bytes/per/1e9:.0f} GB/s; vs_baseline "
          f"{pm.stream_bytes/per/1e9/(0.7*819):.3f})", flush=True)


if __name__ == "__main__":
    main()
