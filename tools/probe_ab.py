"""A/B the round-4 kernel variants in ONE process with the bench-identical
round-trip chain: (SMALL_SLOTS, ICE_BATCHED) combos, jax cache cleared
between.  Run: python tools/probe_ab.py"""
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

    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                e = pb.apply_small_blocked(pm, c, scale=True)
                return pb.apply_ice_blocked(pm, e, scale=True), ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
            return c.sum()
        return chain

    ref = None
    for slots, batched in ((1, False), (2, False), (1, True), (2, True),
                           (4, True)):
        pb.SMALL_SLOTS = slots
        pb.ICE_BATCHED = batched
        jax.clear_caches()
        out = np.asarray(pb.apply_ice_blocked(
            pm, pb.apply_small_blocked(pm, fb, scale=True), scale=True))
        if ref is None:
            ref = out
        else:
            exact = np.array_equal(ref, out)
            assert exact, f"variant ({slots},{batched}) not bit-exact"
        c1, c2 = mk(64), mk(576)
        float(c1()); float(c2())
        t1s, t2s = [], []
        for _ in range(8):
            t0 = time.perf_counter(); float(c1())
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2())
            t2s.append(time.perf_counter() - t0)
        per = (min(t2s) - min(t1s)) / 512
        print(f"slots={slots} batched={batched}: rt {1e6*per:6.1f} us "
              f"({pm.stream_bytes/per/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
