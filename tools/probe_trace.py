"""Capture a jax.profiler trace of the config-#3 round-trip chain and
summarize per-op device durations (the floor probe shows ~80 us of
UNHIDDEN compute per round trip: stream floor 92.5 us vs stock 172.8 --
find where it lives).  Run: python tools/probe_trace.py"""
import glob
import gzip
import json
import sys

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

    @jax.jit
    def chain(p, f0):
        def body(c, _):
            e = pb.apply_small_blocked(p, c, scale=True)
            return pb.apply_ice_blocked(p, e, scale=True), ()
        c, _ = jax.lax.scan(body, f0, None, length=64)
        return c.sum()

    float(chain(pm, fb))          # compile + warm
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(3):
            float(chain(pm, fb))

    # parse the trace: sum durations by op name on the device track
    paths = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written", flush=True)
        return
    path = max(paths)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # find TPU device track pids
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    tot = {}
    cnt = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "?")
            tot[nm] = tot.get(nm, 0.0) + e.get("dur", 0.0)
            cnt[nm] = cnt.get(nm, 0) + 1
    print(f"# trace {path}; device pids {sorted(dev_pids)}", flush=True)
    for nm, us in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/3/64:9.2f} us/rt  x{cnt[nm]:6d}  {nm[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
