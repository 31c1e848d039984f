#!/usr/bin/env python
"""Staged reference-verification protocol (SURVEY.md final section).

``/root/reference`` (upstream citibeth/icebin) was EMPTY in every session so
far; all reference citations in this repo are ``[U]`` (unverified upstream
paths).  THE MOMENT the mount is populated, run:

    python tools/verify_reference.py [--reference /root/reference]

It executes SURVEY.md's verification protocol and fails loudly if the mount
is still empty:

1. inventories the mount (file map for correcting SURVEY.md section 1),
2. greps every class/function name from SURVEY.md section 2 so ``[U]``
   citations can be upgraded to real file:line,
3. locates the regrid-composition source (RegridMatrices) and the contracts
   table for a manual diff against section 3.2 / the VarSet contracts,
4. emits a checklist of numeric comparisons to run (regridded-output
   allclose vs the reference's Python API, per the north star), and
5. reminds the operator to re-run the copy-paste detector against the now
   populated mount (COPYCHECK ran against an empty directory in round 1).

Exit status: 2 if the mount is empty/missing (the protocol CANNOT run),
1 if grep finds none of the expected symbols (wrong mount?), 0 otherwise.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# SURVEY.md section 2 "Key classes/functions" column, one probe per row.
SYMBOLS = [
    "TupleList", "accum", "spcopy",                       # spsparse
    "Weighted_Eigen", "Weighted_Tuple", "Weighted_Compressed", "ZArray",
    "Indexing", "Domain",
    "NcIO", "ncio_vector",
    "UTSystem", "CVConverter",
    "F90Array",
    "GridSpec_XY", "GridSpec_LonLat", "AbbrGrid", "ExchangeGrid",
    "GridGen_LonLat", "GridGen_XY", "EuclidianClip", "SphericalClip",
    "GridGen_Exchange",
    "IceRegridder_L0", "GvI", "GvAp", "GvEp",
    "RegridMatrices", "RegridParams", "MakeDenseEigen", "SparseSet",
    "GCMRegridder_Standard", "regrid_matrices",
    "smoothing_matrix", "Smoother",
    "VarSet", "VectorMultivec",
    "GCMCoupler", "IceCoupler", "IceWriter",
    "IceCoupler_PISM",
    "GCMCoupler_ModelE", "gcmce_couple_native", "gcmce_new",
    "update_topo", "E1vE0",
    "Hntr", "HntrSpec",
    "make_topoo", "merge_topo", "global_ec", "z1qx1n",
    "GCMRegridder_ModelE", "foceanAOp",
]

# numeric comparisons to run by hand once the mount builds (north star:
# "regridded fields matching the reference's output (allclose)")
NUMERIC_CHECKLIST = """
Numeric verification checklist (run after building the reference pylib):

  1. Toy Cartesian 100x100 <-> 8x10 lat-lon (BASELINE config #1):
       ref:  icebin.GCMRegridder(...).regrid_matrices(...).matrix('AvI')
       ours: tests/helpers.toy_regridder + rm.matrix('AvI', params)
       assert np.allclose on (wM, M.todense(), Mw) after index alignment.
  2. SeaRISE Greenland 20 km (config #2): same comparison for all six
     matrices {AvI, IvA, EvI, IvE, AvE, EvA} with scale/correctA on/off.
  3. Hntr: compare our regrid/hntr.py overlap matrix against the
     reference Hntr for 1x1 -> 2x2.5 (exact row/col sums first).
  4. TOPO: make_topoo outputs (FOCEAN/FLAKE/FGRND/FGICE/ZATMO, fhc,
     elevE, underice) vs cli/make_topoo.py on the same inputs.
  5. Conservation parity: reference achieves ~machine precision via CGAL;
     ours via f64 repair -- compare per-cell |colsum - area| distributions.

Also re-run the mechanical copy-paste detector against the populated
mount (round-1 COPYCHECK.json compared against an EMPTY directory).
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable summary on stdout")
    args = ap.parse_args()
    ref = args.reference

    if not os.path.isdir(ref) or not os.listdir(ref):
        print(f"FAIL: reference mount {ref!r} is EMPTY or missing -- the "
              f"verification protocol cannot run. All [U] citations remain "
              f"unverified; re-run when the mount is populated.",
              file=sys.stderr)
        return 2

    files = subprocess.run(
        ["find", ref, "-type", "f"], capture_output=True, text=True
    ).stdout.splitlines()
    print(f"mount populated: {len(files)} files")
    for f in files[:50]:
        print("  ", f)
    if len(files) > 50:
        print(f"   ... and {len(files) - 50} more")

    hits = {}
    for sym in SYMBOLS:
        out = subprocess.run(
            ["grep", "-rln", sym, ref], capture_output=True, text=True
        ).stdout.splitlines()
        hits[sym] = out[:5]
    found = {s: h for s, h in hits.items() if h}
    missing = [s for s, h in hits.items() if not h]
    print(f"\nsymbols found: {len(found)}/{len(SYMBOLS)}")
    for s, h in sorted(found.items()):
        print(f"  {s}: {h[0]}" + (f" (+{len(h)-1})" if len(h) > 1 else ""))
    if missing:
        print("\nNOT found (SURVEY.md rows to correct):")
        for s in missing:
            print("  ", s)
    print(NUMERIC_CHECKLIST)

    if args.json:
        print(json.dumps({"files": len(files), "found": len(found),
                          "missing": missing}))
    return 0 if found else 1


if __name__ == "__main__":
    sys.exit(main())
