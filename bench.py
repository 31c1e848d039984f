"""Driver benchmark: ONE JSON line with the flagship SpMM throughput.

Measures the fused Pallas BDT regrid apply (EvI o IvE round trips, 8
fields, f32; icebin_tpu.ops.pallas_bdt) on the REAL SeaRISE Greenland 5 km
x ModelE 2x2.5 matrix set with 5 elevation classes (BASELINE.json config
#3 -- the north star's named end-to-end target), exchange grid built by
the native C++ engine, on the real TPU chip.  (Multi-sheet config #5 runs
in tests/test_multisheet.py; a pole-centered sheet rides the slower
scatter fallback and would dilute the headline bandwidth with a
latency-bound small-matrix leg.)

Methodology notes (see .claude/skills/verify/SKILL.md):
* block_until_ready is unreliable through the axon relay and a sync fetch
  costs ~27 ms, so the apply chain runs N dependent round trips inside ONE
  jit and is synced once by fetching a scalar that depends on the output.
* conservation is asserted (f64, < 1e-10) before timing -- a fast wrong
  answer must fail the bench.
* byte accounting counts what one round trip actually streams (tiles twice
  -- once per direction -- products/window intermediates, fields, E3).
* vs_baseline = achieved / (0.70 * nominal HBM roof): 1.0 == the north-star
  target "SpMV >= 70% of HBM roof" (BASELINE.md).  No reference numbers
  exist (reference publishes none).  Measured practical stream roof on the
  attached v5e is ~740 GB/s r+w (tools/bench_roof.py).
"""
import json
import sys
import time

import numpy as np

N_REPS = 64
NVAR = 8

ROOFS_GBPS = {  # nominal HBM bandwidth per chip
    "v5lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6e": 1640.0, "v6": 1640.0,
}


def nominal_roof():
    import jax
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for k, v in ROOFS_GBPS.items():
        if k in kind:
            return v
    return 819.0


def build_matrices():
    from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid
    from icebin_tpu.ops.pallas_bdt import pallas_from_weighted
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams

    specA = modele_lonlat_grid(144, 90)
    sheets = {
        "greenland": GridSpecXY(
            xb=np.linspace(-650e3, 870e3, 305),
            yb=np.linspace(-3350e3, -630e3, 545),
            projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 "
                       "+ellps=WGS84"),
    }
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
    P = RegridParams(scale=True, correctA=True)
    out = {}
    for name, specI in sheets.items():
        gr.add_sheet(name, specI, subdiv=2)
        c = specI.cell_centers()
        ex = (np.ptp(specI.xb) / 2.2, np.ptp(specI.yb) / 2.2)
        r2 = (((c[:, 0] - specI.xb.mean()) / ex[0]) ** 2
              + (((c[:, 1] - specI.yb.mean()) / ex[1]) ** 2))
        elev = np.where(r2 < 1.0, 3500.0 * (1.0 - r2), np.nan)
        rm = gr.regrid_matrices(name, elev)
        Me = rm.matrix("EvI", P)
        Mi = rm.matrix("IvE", P)
        # ONE Pallas tile set serves both directions (exact transposes)
        pm = pallas_from_weighted(Me, small_axis="rows", nv=NVAR)
        out[name] = (pm, Me, Mi)
    return out


def main():
    import jax
    # Global x64 breaks Mosaic grid-index legalization, so it stays OFF;
    # the f64 conservation-repair gate runs under a scoped enable_x64
    # context (hot arrays are all explicitly f32 either way).
    import jax.numpy as jnp
    from icebin_tpu.coupler.ledger import repair_mass
    from icebin_tpu.ops.pallas_bdt import (apply_small, apply_small_blocked,
                                           apply_ice_blocked)

    mats = build_matrices()
    rng = np.random.default_rng(0)

    # conservation gates per sheet (host f64 oracle vs device f32 apply,
    # then the f64-repaired runtime path at the north-star bound)
    for name, (pm, Me, Mi) in mats.items():
        f1 = np.asarray(rng.uniform(1.0, 2.0, Me.shape[1]))
        dev = np.asarray(apply_small(pm, jnp.asarray(f1, jnp.float32)),
                         np.float64)
        m_dev = np.nansum(np.where(np.isfinite(dev), dev, 0.0) * Me.wM)
        m_src = np.sum(f1 * Me.Mw)
        if abs(m_dev - m_src) / abs(m_src) > 1e-5:
            print(json.dumps({"metric": "regrid_spmm_effective_GBps",
                              "value": 0.0, "unit": "GB/s",
                              "vs_baseline": 0.0,
                              "error": f"conservation gate failed: {name}"}))
            return
        with jax.enable_x64(True):
            rep = repair_mass(
                jnp.asarray(np.where(np.isfinite(dev), dev, 0.0),
                            jnp.float64)[None],
                jnp.asarray(Me.wM), jnp.asarray([m_src]))
            m_rep = float(jnp.sum(rep[0] * jnp.asarray(Me.wM)))
        assert abs(m_rep - m_src) / abs(m_src) < 1e-10, "repair gate failed"

    pms = [pm for (pm, _, _) in mats.values()]
    fbs = [pm.ice_to_blocked(
               jnp.asarray(rng.uniform(0.5, 1.5, (NVAR, pm.nice)),
                           jnp.float32))
           for pm in pms]

    @jax.jit
    def chain(ms, fs):
        def body(c, _):
            out = []
            for pm, fb in zip(ms, c):
                e3 = apply_small_blocked(pm, fb, scale=True)
                out.append(apply_ice_blocked(pm, e3, scale=True))
            return tuple(out), ()
        c, _ = jax.lax.scan(body, tuple(fs), None, length=N_REPS)
        return sum(x.sum() for x in c)

    float(chain(pms, fbs))                   # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(pms, fbs))
        ts.append(time.perf_counter() - t0)
    lat = 0.027                               # relay sync latency (measured)
    per_rt = max((min(ts) - lat) / N_REPS, 1e-9)

    # both directions stream the SAME tile set; each round trip still
    # reads it twice (once per direction)
    rt_bytes = sum(pm.stream_bytes for pm in pms)
    gbps = rt_bytes / per_rt / 1e9
    roof = nominal_roof()
    print(json.dumps({"metric": "regrid_spmm_effective_GBps",
                      "value": round(gbps, 2), "unit": "GB/s",
                      "vs_baseline": round(gbps / (0.70 * roof), 4)}))


if __name__ == "__main__":
    sys.exit(main())
