"""`overlap`: offline exchange-grid construction CLI.

Reference: ``overlap gridA.nc gridI.nc exgrid.nc`` computes the exchange
grid by CGAL intersection (reference ``sbin/overlap.cpp`` [U]; SURVEY.md
section 3.1).  Same calling convention here; the clipping engine is
selectable (f64 numpy oracle / XLA / Pallas on TPU).

    python -m icebin_tpu.cli.overlap gridA.nc gridI.nc exgrid.nc \
        [--subdiv 2] [--engine numpy|jax|pallas] [--no-repair]
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="overlap", description=__doc__)
    ap.add_argument("gridA")
    ap.add_argument("gridI")
    ap.add_argument("out")
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "numpy", "native", "jax", "pallas"])
    ap.add_argument("--no-repair", action="store_true")
    args = ap.parse_args(argv)

    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.io.ncio import read_grid, write_exchange

    gA = read_grid(args.gridA)
    gI = read_grid(args.gridI)
    t0 = time.time()
    xg = make_exchange_grid(gA, gI, subdiv=args.subdiv, engine=args.engine,
                            repair=not args.no_repair)
    dt = time.time() - t0
    write_exchange(args.out, xg)
    ncand = xg.ncells
    print(f"overlap: {ncand} exchange cells in {dt:.1f}s "
          f"({gI.spec.ncells / max(dt, 1e-9):.0f} ice cells/s, "
          f"engine={args.engine})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
