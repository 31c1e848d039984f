#!/usr/bin/env python
"""ModelE 2 x 2.5 degree atmosphere grid (reference grid script
``modele_ll_g2x2_5.py`` [U]; SURVEY.md section 3.1).

    python grids/modele_ll_g2x2_5.py [out.nc]
"""
import sys

from icebin_tpu.grid.spec import modele_lonlat_grid
from icebin_tpu.io.ncio import write_grid

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "modele_ll_g2x2_5.nc"
    spec = modele_lonlat_grid(144, 90)
    write_grid(out, spec)
    print(f"wrote {out}: {spec.name} ({spec.nlon}x{spec.nlat})")
