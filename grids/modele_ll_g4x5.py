#!/usr/bin/env python
"""ModelE 4 x 5 degree atmosphere grid (reference 4x5 grid script [U]).

    python grids/modele_ll_g4x5.py [out.nc]
"""
import sys

from icebin_tpu.grid.spec import modele_lonlat_grid
from icebin_tpu.io.ncio import write_grid

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "modele_ll_g4x5.nc"
    spec = modele_lonlat_grid(72, 45)
    write_grid(out, spec)
    print(f"wrote {out}: {spec.name} ({spec.nlon}x{spec.nlat})")
