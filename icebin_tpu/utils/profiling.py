"""Roofline accounting: byte/FLOP bookkeeping for the hot kernels.

Reference: none -- the reference has ad-hoc timing prints only (SURVEY.md
section 5.1), and the survey mandates building bandwidth accounting in from
day one ('bytes moved per SpMV vs HBM roof is literally the north-star
metric').  This module computes the LOGICAL traffic of each apply/clip from
matrix metadata, accumulates measured wall times, and reports achieved
vs roofline fractions.  ``jax.profiler`` traces can be layered on top
(``trace`` context) when a trace directory is given.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

__all__ = ["bdt_apply_bytes", "clip_pair_flops", "Roofline", "NOMINAL_HBM"]

NOMINAL_HBM = {  # GB/s per chip kind substring
    "v5lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6": 1640.0,
}


def bdt_apply_bytes(bm, nvar: int) -> int:
    """Logical bytes of one BDT apply: tile stream + field I/O + weights."""
    b = bm.tiles.size * bm.tiles.dtype.itemsize
    b += bm.row_start.size * 4
    if bm.scat_onehot is not None:
        b += bm.scat_onehot.size * bm.scat_onehot.dtype.itemsize
    nin = bm.nsmall if bm.transposed else bm.nice
    nout = bm.nice if bm.transposed else bm.nsmall
    b += nvar * (nin + nout) * 4
    b += (len(bm.wM)) * 4
    return b


def clip_pair_flops(v0: int = 8) -> int:
    """Rough VPU op count of one pair through the 4-pass clipper."""
    ops = 0
    v = v0
    for _ in range(4):
        ops += 14 * v          # pass arithmetic
        ops += 10 * 2 * v * 5  # ffill log-steps on the doubled ring
        v *= 2
    ops += 10 * v              # shoelace + centroid
    return ops


@dataclasses.dataclass
class _Entry:
    calls: int = 0
    seconds: float = 0.0
    bytes: int = 0
    flops: int = 0


class Roofline:
    """Accumulates measured times against logical traffic.

    with roof.measure('IvE_apply', bytes=bdt_apply_bytes(bm, 8)):
        out = apply_bdt(bm, f); jax.block_until_ready(out)
    print(roof.report())
    """

    def __init__(self, hbm_gbps: Optional[float] = None):
        self.entries: Dict[str, _Entry] = {}
        if hbm_gbps is None:
            try:
                import jax
                kind = jax.devices()[0].device_kind.lower().replace(" ", "")
                hbm_gbps = next((v for k, v in NOMINAL_HBM.items()
                                 if k in kind), 819.0)
            except Exception:
                hbm_gbps = 819.0
        self.hbm_gbps = hbm_gbps

    @contextlib.contextmanager
    def measure(self, name: str, bytes: int = 0, flops: int = 0):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        e = self.entries.setdefault(name, _Entry())
        e.calls += 1
        e.seconds += dt
        e.bytes += bytes
        e.flops += flops

    def report(self) -> str:
        lines = [f"roofline (HBM {self.hbm_gbps:.0f} GB/s nominal):"]
        for name, e in sorted(self.entries.items()):
            gbps = e.bytes / e.seconds / 1e9 if e.seconds > 0 else 0.0
            frac = gbps / self.hbm_gbps
            lines.append(
                f"  {name:24s} {e.calls:5d} calls {e.seconds*1e3:9.2f} ms "
                f"{e.bytes/1e6:9.1f} MB -> {gbps:7.1f} GB/s "
                f"({100*frac:5.1f}% of roof)")
        return "\n".join(lines)
