"""One kernel-variant round-trip timing (bench-identical chain).
Usage: python tools/probe_ab1.py SLOTS BATCHED(0/1)"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from icebin_tpu.ops import pallas_bdt as pb
    from tools.probe_r4 import build_pm

    pb.SMALL_SLOTS = int(sys.argv[1])
    pb.ICE_BATCHED = bool(int(sys.argv[2]))
    pm = build_pm()
    rng = np.random.default_rng(0)
    fb = pm.ice_to_blocked(
        jnp.asarray(rng.uniform(0.5, 1.5, (8, pm.nice)), jnp.float32))
    out = np.asarray(pb.apply_ice_blocked(
        pm, pb.apply_small_blocked(pm, fb, scale=True), scale=True))
    print("checksum", float(np.nansum(out)), flush=True)

    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                e = pb.apply_small_blocked(pm, c, scale=True)
                return pb.apply_ice_blocked(pm, e, scale=True), ()
            c, _ = jax.lax.scan(body, fb, None, length=n)
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
    print(f"slots={sys.argv[1]} batched={sys.argv[2]}: rt {1e6*per:6.1f} us"
          f" ({pm.stream_bytes/per/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
