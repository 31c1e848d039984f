"""Production-scale TOPO / global-EC proof run (VERDICT r3 missing #4).

Generates a synthetic minute-class global Z1QX1N in the REAL GISS
sequential format (default: the true Z1QX1N family shape 10800 x 5400 =
58.3 M cells), then runs the reference's actual offline workflow end to
end, timed and conservation-checked:

  1. write + re-read the GISS file (format exercised at scale),
  2. ``make_topoo`` -- Hntr-downsample to the ModelE 2x2.5 ocean grid,
  3. ``merge_topo`` + ``elevation_class_fields`` with a SeaRISE-class
     5 km Greenland sheet,
  4. ``global_ec`` -- the full EC matrix set written compressed (zarray).

Usage: python tools/topo_scale.py [IM JM]   (e.g. 2160 1080 for a quick
run).  Prints one JSON line; record the wall times in docs/status.md.
Reference: [U modele/z1qx1n_bs1, make_topoo, global_ec; SURVEY.md §3.4].
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    im = int(sys.argv[1]) if len(sys.argv) > 2 else 10800
    jm = int(sys.argv[2]) if len(sys.argv) > 2 else 5400
    from icebin_tpu.cli.global_ec import main as global_ec_main
    from icebin_tpu.io.giss import read_z1qx1n, write_z1qx1n
    from icebin_tpu.grid.spec import GridSpecXY, modele_lonlat_grid
    from icebin_tpu.io.ncio import write_gcmregridder
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.hntr import hntr_spec
    from icebin_tpu.topo.topo import (elevation_class_fields, make_topoo,
                                      merge_topo, synthetic_z1qx1n)

    out = {"im": im, "jm": jm, "cells": im * jm}
    spec = hntr_spec(im, jm)

    t0 = time.perf_counter()
    base = synthetic_z1qx1n(spec)
    out["gen_s"] = round(time.perf_counter() - t0, 2)

    d = tempfile.mkdtemp(prefix="topo_scale_")
    giss_path = os.path.join(d, f"z1qx1n_{im}x{jm}.giss")
    t0 = time.perf_counter()
    write_z1qx1n(giss_path, base)
    out["write_giss_s"] = round(time.perf_counter() - t0, 2)
    out["giss_MB"] = round(os.path.getsize(giss_path) / 1e6, 1)

    t0 = time.perf_counter()
    base2 = read_z1qx1n(giss_path)
    out["read_giss_s"] = round(time.perf_counter() - t0, 2)
    assert base2.spec.ncells == im * jm

    specO = modele_lonlat_grid(144, 90)
    t0 = time.perf_counter()
    topoo = make_topoo(base2, specO)
    out["make_topoo_s"] = round(time.perf_counter() - t0, 2)
    # conservation: Hntr preserves area integrals of every fraction field
    aF = base2.spec.cell_areas()
    aO = specO.cell_areas()
    for k in ("focean", "fgice"):
        mF = float(np.sum(getattr(base2, k) * aF))
        mO = float(np.sum(getattr(topoo, k) * aO))
        rel = abs(mO - mF) / max(abs(mF), 1e-30)
        out[f"cons_{k}"] = f"{rel:.1e}"
        assert rel < 1e-10, (k, rel)
    s = topoo.focean + topoo.flake + topoo.fgrnd + topoo.fgice
    assert np.abs(s - 1.0).max() < 1e-9

    # Greenland 5 km sheet -> merged TOPO + EC fields + compressed EC set
    gr = GCMRegridder(specO, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
    specI = GridSpecXY(
        xb=np.linspace(-650e3, 870e3, 305),
        yb=np.linspace(-3350e3, -630e3, 545),
        projection="+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 "
                   "+ellps=WGS84")
    # OFFLINE host tool: prefer the native C++ clip engine (0.9 s for
    # this build, deterministic) over the TPU path -- the r4 run's 824 s
    # "hot spot" was relay weather on the device engine, not the build
    # (the same build benches at ~1.4 s warm on TPU; tools logs r5)
    from icebin_tpu.ops import native as _native
    eng = "native" if _native.available() else "auto"
    t0 = time.perf_counter()
    gr.add_sheet("greenland", specI, subdiv=2, engine=eng)
    out["sheet_build_engine"] = eng
    out["sheet_build_s"] = round(time.perf_counter() - t0, 2)
    c = specI.cell_centers()
    ex = (np.ptp(specI.xb) / 2.2, np.ptp(specI.yb) / 2.2)
    r2 = (((c[:, 0] - specI.xb.mean()) / ex[0]) ** 2
          + (((c[:, 1] - specI.yb.mean()) / ex[1]) ** 2))
    elev = np.where(r2 < 1.0, 3500.0 * (1.0 - r2), np.nan)

    t0 = time.perf_counter()
    merged = merge_topo(topoo, gr, {"greenland": elev})
    fhc, elevE, underice = elevation_class_fields(gr, {"greenland": elev})
    out["merge_ec_s"] = round(time.perf_counter() - t0, 2)
    assert np.isfinite(fhc).all() and fhc.max() <= 1.0 + 1e-12

    # global EC matrix set through the REAL global_ec CLI, compressed
    # (the reference's global_ec output artifact)
    gr_path = os.path.join(d, "gr.nc")
    elev_path = os.path.join(d, "elev.npy")
    ec_path = os.path.join(d, "global_ec.nc")
    write_gcmregridder(gr_path, gr)
    np.save(elev_path, elev)
    t0 = time.perf_counter()
    rc = global_ec_main([gr_path, ec_path,
                         "--elevmask", f"greenland={elev_path}"])
    out["global_ec_s"] = round(time.perf_counter() - t0, 2)
    assert rc == 0
    out["ec_MB"] = round(os.path.getsize(ec_path) / 1e6, 1)
    out["tmpdir"] = d
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
