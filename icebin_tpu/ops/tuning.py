"""Per-device-kind kernel tunables (VERDICT r2 item #9: v5p readiness).

The fused BDT kernels (``ops.pallas_bdt``) have three load-bearing
tunables; the right values depend on the chip's VMEM size and HBM/MXU
balance, so they are selected by ``jax.devices()[0].device_kind`` from the
table below.  ``tools/autotune.py`` re-runs the sweep on any attached chip
and prints a table entry to add here.

Tunables and their VMEM budgets (f32 bytes; NV=8, TS=4 throughout):

  ps_chunk    pseudo-blocks per fused grid step.  Per-step working set =
              tiles (ps_chunk * 16 KB, double-buffered) + gathered field
              (ps_chunk * 4 KB) + chunk scratch (ps_chunk*TS * 256 B).
              ps_chunk=128: ~4.7 MB.  Larger chunks amortize grid-step
              overheads but narrow the W8 window-band less.
  sec_blocks  true-ice blocks per dest-ice accumulator section
              (sec_blocks * 4 KB resident: 1024 -> 4 MB).  The E3
              accumulator (NWpad * 512 B) and a winv section share VMEM
              with it; one global accumulator stops fitting past ~2k
              blocks.
  w8_cap      max window slots per chunk band (w8_cap * 512 B operand in
              the band matmul).  Caps pathological polar chunks; tiles
              beyond it demote to the COO overflow epilogue.

ROUND-5 NOTE: every sweep below predates the scoped-VMEM unlock
(``vmem_limit``; the chip runs 96 MB of live kernel buffers -- the 16 MB
default silently boxed rounds 2-4).  At the unlocked budget the r5
sweeps (tools/probe_nv.py, probe_chunk.py, probe_ant_nv.py, 2026-08)
re-earn ps_chunk=128 (256 widens the W8 band 192->280 at config #3, 512
-> 456; Antarctica flat across 64/96/128) and sec_blocks=1024 with FULL
sections now fitting at any NV (zero chunk padding at config #3); NV=16
is the coupler/bench default (76.7 us per-8-field round trip vs 144.2
at NV=8).

Historical (pre-unlock, 16 MB era) -- kept for the design record:
measured on v5e (819 GB/s HBM): ps_chunk sweep at config #3
{64: 205 us, 128: 185 us, 256: 227 us} round trip -> 128; Antarctica-scale
sec_blocks {512, 1024, 2048} flat within noise in the r3 sweep, and 512
measured WORSE than 1024 end-to-end once the r4 dest-small kernel began
streaming the field by section (more sections -> more per-section chunk
padding: config #3 rt 179 us at 512 vs 169 at 1024) -> 1024; the r4
field-section double buffer is paid for by the lower E3-section budget
(ops.pallas_bdt E_SEC).  RE-CONFIRMED on the r5 (E-sectioned) kernels
with two-point timing on the REAL config-#3 matrix (tools/tune_real.py,
2026-08): {128/1024: 169.9 us, 128/512: 177.5, 256/512: 206.5, 64/512:
182.1, 256/768: 184.4} -> 128/1024 stands.  tools/autotune.py now uses
the SAME bench-identical two-point round-trip chain (r4: its old chain
carried a full-array multiply per iteration and rode relay noise) and
REPRODUCES this ordering on v5e (`--real --configs ...`, 2026-08:
128/1024 165.5 < 128/512 175.3 < 64/512 179.5 < 256/768 187.5 <
256/512 207.0), so its first run on a new chip yields a trustworthy
table entry.  v5p (v5e-generation core, larger HBM
bandwidth 2765 GB/s, same 16 MB-class VMEM) starts from the v5e entry;
v4/v6e likewise until swept on real chips.
"""
from __future__ import annotations

from typing import Dict

__all__ = ["tunables_for", "apply_tunables"]

_VM100 = 100 * 1024 * 1024
_TABLE: Dict[str, dict] = {
    "default": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
                    vmem_limit=_VM100),
    # measured (tools/autotune.py + probe_nv/probe_chunk, 2026-08, single
    # chip via axon; vmem_limit: 96 MB of live kernel buffers measured OK
    # on the attached v5e -- the 16 MB scoped default was the r2-r4
    # bottleneck)
    "v5lite": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
                   vmem_limit=_VM100),
    "v5e": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
                vmem_limit=_VM100),
    # start points pending a real-chip sweep (v4's physical VMEM is the
    # 32 MB class: cap its scoped budget well below the v5e value)
    "v5p": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
                vmem_limit=_VM100),
    "v4": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
               vmem_limit=28 * 1024 * 1024),
    "v6e": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
                vmem_limit=_VM100),
    "v6": dict(ps_chunk=128, sec_blocks=1024, w8_cap=2048,
               vmem_limit=_VM100),
}


def tunables_for(device_kind: str = None) -> dict:
    """Tunables entry for a device kind (normalized substring match on
    the table keys; 'TPU v5 lite' -> 'v5lite')."""
    if device_kind is None:
        try:
            import jax
            device_kind = jax.devices()[0].device_kind
        except Exception:
            device_kind = ""
    kind = device_kind.lower().replace(" ", "")
    best = None
    for key in _TABLE:
        if key != "default" and key in kind:
            if best is None or len(key) > len(best):
                best = key
    return dict(_TABLE[best or "default"])


def apply_tunables(device_kind: str = None) -> dict:
    """Select the tunables for the ATTACHED chip and install them as the
    ``ops.pallas_bdt`` module globals (called lazily on the first matrix
    pack; the kernels read the globals late, so tools may also override
    them directly for sweeps)."""
    from icebin_tpu.ops import pallas_bdt as pb
    t = tunables_for(device_kind)
    pb.PS_CHUNK = t["ps_chunk"]
    pb.SEC_BLOCKS = t["sec_blocks"]
    pb.W8_CAP = t["w8_cap"]
    pb.VMEM_LIMIT = t.get("vmem_limit", pb.VMEM_LIMIT)
    return t
