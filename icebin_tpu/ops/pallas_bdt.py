"""Fused Pallas TPU kernels for the BDT regrid apply — the flagship SpMM.

The XLA BDT path (``icebin_tpu.ops.bdt``) already avoids ice-space gathers,
but at config-#3 scale (real Greenland 5 km) it loses ~10x to op overheads:
the banded one-hot scatter machinery materializes products, transposes, and
band intermediates as separate HBM round trips (measured 1.66 ms per EvI∘IvE
round trip vs a ~0.2 ms stream bound; tools/profile_cfg3.py; measured stream
roof ~740 GB/s r+w, tools/bench_roof.py).

Two design moves:

1. **Pseudo-blocks kill tile padding.** A fixed tiles-per-block cap T wastes
   HBM bandwidth on zero tiles (Greenland 5 km: mean 5.6 windows/block, max
   13 → 58% padding at T=max). Here each ice block is SPLIT into
   pseudo-blocks of at most TS windows, all mapping to the same 128-cell ice
   block through ``pseudo2blk``: the dest-small kernel reads each pseudo's
   field row from its section block in-kernel (round 4; the XLA row-gather
   into pseudo order it replaces cost ~40 us + 2x the field bytes per
   apply), and the dest-ice output lands straight in the section-indexed
   true-block accumulator. Padding drops to < 20% at TS=4 with no COO
   overflow.

2. **Each apply direction is ONE fused Pallas kernel** (round 3; round 2
   used two kernels glued by an HBM interchange buffer whose (…, TS*8, NV)
   shape XLA pads 16x to (8,128) tiles — at Antarctica scale that stall
   capped the round trip at ~0.43x Greenland GB/s).  Per grid step, one
   CHUNK of PS_CHUNK pseudo-blocks streams its tiles + gathered fields;
   the per-pseudo MXU contraction products never leave VMEM:

   dest-small (EvI/AvI), ``_fused_small_kernel``: per pseudo-block one MXU
     contraction of the R-MAJOR tiles (rows r*TS+t) against the field row
     of its true ice block — read IN-KERNEL from the scalar-prefetch-
     section-indexed field block (the XLA pseudo-order row-gather of
     rounds 1–3 cost ~40 us and 2x the field bytes per apply at config #3;
     chunks never straddle ice sections by construction, so the (SEC, NV,
     128) field section rides the same ``sec_idx`` indexing as the dest-ice
     accumulator) → (TS*8, NV) VMEM scratch, folded to E3 lane order
     (TS, 8*NV) by 8 sublane slices + one lane concat (Mosaic cannot
     shape-cast an 8-lane minor, and crashes slicing a dot RESULT —
     tools/probe_fold_ops.py; slicing the scratch is the proven form),
     landing in a (C2, 8*NV) chunk scratch; then ONE one-hot band matmul
     (iota compare on window offsets) accumulates the chunk into the
     VMEM-resident E3 accumulator: E3[w, r*NV+v] = E[v, w*8+r].

   dest-ice (IvE/IvA), ``_fused_ice_kernel``, is the exact reverse: the
     one-hot-transpose band matmul gathers E3 window rows into the chunk
     scratch, each pseudo-block's rows are UNfolded (8 lane slices →
     contiguous scratch rows, matching the r-major tiles) and contracted,
     landing straight in the section-indexed TRUE-block accumulator (the
     out BlockSpec rides a scalar-prefetched section index; one global
     accumulator stops fitting VMEM past ~2k blocks).

E stays in E3 layout and ice fields in blocked layout across a coupling
round trip, so the directions compose with minimal glue. Tiles whose
window falls outside their chunk's W8 band (pathological polar blocks) are
demoted at build time to a COO overflow handled by a small XLA epilogue,
keeping the kernels total and branch-free.

Reference parity: TPU replacement for Eigen SpMV in ``ibmisc
linear::Weighted_Eigen::apply_M`` [U] (SURVEY.md §2 'linear::Weighted',
§7 stage 4 flagship kernel).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icebin_tpu.ops.bdt import BDTMatrix, TILE_C, TILE_R

__all__ = ["PallasBDT", "PallasView", "pallas_from_bdt",
           "pallas_from_weighted", "pallas_view_pair", "apply_view",
           "apply_small", "apply_ice", "apply_small_blocked",
           "apply_ice_blocked"]

HIGH = jax.lax.Precision.HIGHEST
ONEHOT_SPLIT = True  # band matmuls: 3 exact bf16 passes instead of 6 (see
                     # _split3_dot; the one-hot side is exactly bf16)
PRODS_PASSES = 3     # A1 MXU passes: 3 = in-kernel bf16 split (~4e-6 raw,
                     # 1.5x faster); 6 = precision=HIGHEST (~1e-7 raw).
                     # The B-side contract keeps HIGHEST either way (its
                     # K=32 contraction is MXU-shape-bound, not pass-bound).
W8_CAP = 2048       # max window slots per chunk band (VMEM: W8*NV8*512 B)
TS = 4              # windows per pseudo-block (the padding granularity)
PS_CHUNK = 128      # pseudo-blocks per fused-kernel grid step (C2=PS_CHUNK*TS)
CH_GROUP = 16       # legacy two-kernel chunk grouping; kept only because
                    # the sharded builder pads w_off/w_offT to its multiple
                    # (harmless: the fused grid visits nchunk steps)
SEC_BLOCKS = 1024   # true-ice blocks per accumulator/field section (4 MB
                    # of VMEM at NV=8; one global accumulator stops fitting
                    # VMEM past ~2k blocks -- see _finish_pack).  Smaller
                    # sections measured WORSE end-to-end (more per-section
                    # chunk padding; ops.tuning docstring has the sweep).
E_SEC = 4096        # windows per E3 accumulator SECTION.  Each kernel call
                    # keeps ONE section VMEM-resident (E3 out + winvS_e3 =
                    # 2 x E_SEC x 256 B = 2 MB at NV=8; + double-buffered
                    # tile stream 4 MB + double-buffered field section
                    # 8 MB + chunk scratch ~= 14.3 MB of the 16 MB scoped
                    # VMEM -- 8192 measured OOM by 304 KB on v5e).  E
                    # spaces wider than a section (global-EC class:
                    # millions of realized E rows) split into PER-SECTION
                    # kernel calls: pseudo-blocks group esec-major at pack
                    # time, so chunks never straddle E sections, W8 <=
                    # E_SEC automatically, and each chunk's clamped band
                    # [base8, base8+W8) stays inside its section block.
                    # One section (every config whose E space fits, incl.
                    # all BASELINE sheets) reduces EXACTLY to the
                    # single-call r4 kernel.
NWPAD_MAX = E_SEC   # back-compat alias (the pre-r5 hard gate; E spaces of
                    # any width now stay on the Pallas path)
VMEM_LIMIT = 100 * 1024 * 1024
                    # Mosaic scoped-VMEM budget for the fused kernels
                    # (compiler_params.vmem_limit_bytes).  The DEFAULT
                    # scoped limit is 16 MB, but the attached v5e runs
                    # 96 MB of live kernel buffers (measured, round 5:
                    # tools/probe_vmem sweep 48+48 MB OK / 64+64 fails)
                    # -- every r2-r4 section-size tunable was boxed by the
                    # artificial 16 MB ceiling.  Raising the limit lets
                    # sections and field batches grow to their real
                    # bandwidth-optimal sizes; ops.tuning can lower it per
                    # device kind if a chip has less VMEM.
SMALL_SLOTS = 1     # dest-small product-scratch parity slots; >1 breaks
                    # the per-pseudo scratch reuse chain (bit-exact).  A/B
                    # on the real config-#3 chain measured NO gain
                    # (tools/probe_ab1.py: 172.6 us at 1 vs 175.4 at 2
                    # with the batched ice form), so the r3 form stays.
ICE_BATCHED = False  # dest-ice: ONE batched MXU contraction per chunk +
                    # chunk-level unfold (bit-exact alternative to the
                    # per-pseudo slice->dot chain; measured ~equal on
                    # v5e -- see tools/probe_ab1.py -- kept selectable
                    # for other device kinds)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _default_e_sec(nv: int) -> int:
    """NV-aware E-section default.  With the measured 96 MB VMEM headroom
    (``VMEM_LIMIT``) the full E_SEC fits through NV=64 (E3 + winvS twin =
    2 * e_sec * 8 * nv * 4 = 16 MB); beyond that it shrinks
    proportionally."""
    return max(TILE_R, (E_SEC * 64 // max(nv, 64)) // TILE_R * TILE_R)


def _default_sec_blocks(nv: int) -> int:
    """NV-aware ice-section default: the field/accumulator section block
    costs ``sec_blocks * nv * TILE_C * 4`` double-buffered -- 64 MB at
    NV=64/SEC=1024, inside the measured VMEM; halves beyond NV=64."""
    return max(TILE_R, SEC_BLOCKS * 64 // max(nv, 64))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PallasBDT:
    """Device arrays + static geometry for the fused BDT kernels.

    Canonical orientation is (small x ice); both directions are served by
    the same tile set (the unscaled A/E<->I matrices are exact transposes).
    """

    tiles2: jnp.ndarray       # (npspad, 8*TS, 128) f32 R-MAJOR pseudo-block
                              # tiles: rows r*TS+t (r = small row-in-window)
    pseudo2blk: jnp.ndarray   # (npspad,) int32 true ice block of each pseudo
    w_off: jnp.ndarray        # (nchunk*8, C2) int32 window - base8 (rows
                              # repeated 8x: Mosaic block-tiling rule)
    w_offT: jnp.ndarray       # (nchunk*C2, 1) int32 (sublane-major copy)
    base: jnp.ndarray         # (nchunk,) int32 8-aligned band starts
    winvS_e3: jnp.ndarray     # (NWpad, 8*NV) f32 1/wS in E3 layout (0 if w=0)
    winvI_blk: jnp.ndarray    # (nblkpad, 1, 128) f32 1/wI blocked (0 if w=0)
    wS: jnp.ndarray           # (nsmall,) f32
    wI: jnp.ndarray           # (nice,) f32
    # overflow COO (None if empty): small rows s, ice cols c, vals
    ov_s: Optional[jnp.ndarray]
    ov_c: Optional[jnp.ndarray]
    ov_v: Optional[jnp.ndarray]
    #: per-CHUNK (= grid step) accumulator section index / entry-exit flags
    #: (bit0 = first chunk of its section: zero-init; bit1 = last: scale)
    sec_idx: jnp.ndarray      # (npspad // PS_CHUNK,) int32
    sec_flags: jnp.ndarray    # (npspad // PS_CHUNK,) int32
    #: window-bucket COMPACTION maps (round 5), or None when every E
    #: section of the logical bucket space holds realized windows.  A
    #: sparse E space (config #3: realized Greenland windows fill ~1/4 of
    #: the nA*nhc bucket space) otherwise streams, scans, and zero-concats
    #: E3 rows that can never be nonzero; the pack relabels windows so
    #: only PRESENT buckets exist and NWpad shrinks to the realized span.
    w_fwd: Optional[jnp.ndarray]   # (nw_logical,) logical win -> compact
                                   # win (or -1: dead bucket/row)
    w_inv: Optional[jnp.ndarray]   # (NWpad,) compact win -> logical win
                                   # (or -1: pad row)
    # static geometry
    ts: int                   # windows per pseudo-block
    W8: int
    NV: int
    nchunk: int
    nchunkpad: int            # chunks padded to a CH_GROUP-multiple
    npspad: int               # padded pseudo-block count
    nblk: int                 # true ice blocks (unpadded)
    nblkpad: int              # true ice blocks padded to whole sections
    NWpad: int
    nsmall: int
    nice: int
    sec_blocks: int           # blocks per B2' accumulator section
    e_sec: int                # windows per E3 accumulator section
    nesec: int                # PRESENT E3 sections (1 = single fused call)
    nw_logical: int           # windows of the LOGICAL small space
                              # (= ceil(nsmall / 8); == NWpad span when
                              # no compaction)
    #: per-E-section kernel-call groups, esec-major chunk ranges:
    #: (chunk0, chunk1, esec, ice_sec_lo, ice_sec_hi); E sections with no
    #: chunks are absent (their E3 rows are exact zeros)
    egroups: tuple

    _STATIC = ("ts", "W8", "NV", "nchunk", "nchunkpad", "npspad", "nblk",
               "nblkpad", "NWpad", "nsmall", "nice", "sec_blocks",
               "e_sec", "nesec", "nw_logical", "egroups")
    _ARRAYS = ("tiles2", "pseudo2blk", "w_off", "w_offT", "base",
               "winvS_e3", "winvI_blk", "wS", "wI", "ov_s", "ov_c", "ov_v",
               "sec_idx", "sec_flags", "w_fwd", "w_inv")

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._ARRAYS),
                tuple(getattr(self, n) for n in self._STATIC))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, *aux)

    @property
    def bytes_small(self) -> int:
        """HBM bytes the dest-small (EvI) direction actually moves (the
        fused kernel keeps the per-pseudo products in VMEM and reads the
        field straight from its section blocks — no pseudo-order gather)."""
        return int(self.tiles2.size * 4                  # tile stream
                   + self.nblkpad * self.NV * TILE_C * 4      # field secs r
                   + self.NWpad * TILE_R * self.NV * 4)       # E3 w

    @property
    def bytes_ice(self) -> int:
        """HBM bytes the dest-ice (IvE) direction actually moves (fused:
        window rows stay in VMEM; output lands straight in true blocks)."""
        return int(self.tiles2.size * 4                  # tile stream
                   + self.NWpad * TILE_R * self.NV * 4   # E3 r
                   + self.nblkpad * self.NV * TILE_C * 4      # true field w
                   + self.nblkpad * TILE_C * 4)               # winv r

    @property
    def stream_bytes(self) -> int:
        """HBM bytes one EvI∘IvE round trip actually moves."""
        return self.bytes_small + self.bytes_ice

    # ---- layout conversions (XLA, used once per chain) ----

    def ice_to_blocked(self, f):
        """(NV, nice) → (nblkpad, NV, 128); non-finite → 0."""
        f = jnp.where(jnp.isfinite(f), f, 0.0).astype(jnp.float32)
        pad = self.nblkpad * TILE_C - self.nice
        return jnp.pad(f, ((0, 0), (0, pad))).reshape(
            self.NV, self.nblkpad, TILE_C).transpose(1, 0, 2)

    def blocked_to_ice(self, fb):
        """(nblkpad, NV, 128) → (NV, nice)."""
        return fb.transpose(1, 0, 2).reshape(self.NV, -1)[:, :self.nice]

    def small_to_e3(self, f):
        """(NV, nsmall) → (NWpad, 8*NV); non-finite → 0.  With a
        compacted bucket space the logical windows gather through
        ``w_inv`` (dead rows → 0)."""
        f = jnp.where(jnp.isfinite(f), f, 0.0).astype(jnp.float32)
        if self.w_fwd is None:
            pad = self.NWpad * TILE_R - self.nsmall
            f3 = jnp.pad(f, ((0, 0), (0, pad))).reshape(
                self.NV, self.NWpad, TILE_R)
            return f3.transpose(1, 2, 0).reshape(self.NWpad,
                                                 TILE_R * self.NV)
        pad = self.nw_logical * TILE_R - self.nsmall
        f3 = jnp.pad(f, ((0, 0), (0, pad))).reshape(
            self.NV, self.nw_logical, TILE_R)
        g = jnp.take(f3, jnp.maximum(self.w_inv, 0), axis=1)
        g = jnp.where((self.w_inv >= 0)[None, :, None], g, 0.0)
        return g.transpose(1, 2, 0).reshape(self.NWpad, TILE_R * self.NV)

    def e3_to_small(self, e3):
        """(NWpad, 8*NV) → (NV, nsmall) (compacted rows scatter back via
        ``w_fwd``; dead logical windows are exact zeros)."""
        f3 = e3.reshape(self.NWpad, TILE_R, self.NV).transpose(2, 0, 1)
        if self.w_fwd is None:
            return f3.reshape(self.NV, -1)[:, :self.nsmall]
        g = jnp.take(f3, jnp.maximum(self.w_fwd, 0), axis=1)
        g = jnp.where((self.w_fwd >= 0)[None, :, None], g, 0.0)
        return g.reshape(self.NV, -1)[:, :self.nsmall]


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def pallas_from_bdt(bm: BDTMatrix, nv: int = 8, ts: int = TS,
                    sec_blocks=None, e_sec=None) -> PallasBDT:
    """Re-pack an XLA BDTMatrix into the pseudo-block fused-kernel layout.

    ``bm`` should be built with ``max_tiles_per_block`` = the exact max so
    no windows were demoted to its COO overflow (``pallas_from_weighted``
    does this); any overflow it does carry is passed through.  The dense
    tiles are exploded back to COO and routed through the one true packer
    (``_pseudo_from_coo``) so the E-section split logic lives in one place
    (this is the test-hook path for the overflow epilogue — small inputs).
    """
    _ensure_tuned()
    if e_sec is None:
        e_sec = _default_e_sec(nv)
    tiles = np.asarray(bm.tiles, np.float32)          # (nblk, T, 8, 128)
    row_start = np.asarray(bm.row_start, np.int64)
    nsmall, nice = bm.nsmall, bm.nice

    # ONE vectorized explode (a per-tile Python loop here regressed to
    # minutes-scale for large matrices; non-real pad tiles are all-zero so
    # plain nonzero is the real-window filter)
    bb, tt, rr, cc = np.nonzero(tiles)
    if len(bb) == 0:
        s = np.zeros(1, np.int64)
        c = np.zeros(1, np.int64)
        v = np.zeros(1, np.float64)
    else:
        s = row_start[bb, tt] + rr
        c = bb * TILE_C + cc
        v = tiles[bb, tt, rr, cc].astype(np.float64)
    ovw = (None if bm.ov_rows is None
           else np.asarray(bm.ov_rows, np.int64) // TILE_R)
    (tiles_ps, w_ps, realp, pseudo2blk, haspid, first, nblk, nblkpad,
     npspad, esecp) = _pseudo_from_coo(s, c, v, nsmall, nice, ts,
                                       e_sec=e_sec, extra_wins=ovw)
    return _finish_pack(tiles_ps, w_ps, realp, pseudo2blk, haspid, first,
                        np.asarray(bm.wS, np.float64),
                        np.asarray(bm.wI, np.float64),
                        nsmall, nice, nblk, nblkpad, nv, ts,
                        bm.ov_rows, bm.ov_cols, bm.ov_vals,
                        sec_blocks=sec_blocks, e_sec=e_sec,
                        esec_present=esecp)


def _pseudo_from_coo(s, i, v, nsmall, nice, ts, e_sec=None,
                     extra_wins=None):
    """COO (small rows s, ice cols i, vals v) -> pseudo-block intermediates,
    WITHOUT materializing the dense (nblk, T, 8, 128) BDT tile array (which
    costs minutes and gigabytes at Antarctica-5km scale: 120 s profiled,
    77 s of it f64->f32 astype on the dense intermediate).

    Ordering contract: windows ascend within each (block, E-section) group;
    pseudo ids ascend with (block, E-section, window rank).  Splitting
    pseudo-blocks at E-section boundaries (windows of one pseudo never
    straddle ``e_sec``) is what lets ``_finish_pack`` group chunks
    esec-major for the per-section kernel calls.
    """
    if e_sec is None:
        e_sec = E_SEC
    s = np.asarray(s, np.int64)
    i = np.asarray(i, np.int64)
    v = np.asarray(v, np.float64)
    nblk = max(1, -(-nice // TILE_C))
    blk = i // TILE_C
    win = s // TILE_R
    # bucket compaction (round 5): relabel windows so only the E-section
    # buckets with realized windows exist -- slot k of the sorted present
    # list owns compact windows [k*e_sec, (k+1)*e_sec).  Identity when
    # every bucket is present (mesh shards pass a whole-space e_sec), so
    # legacy packs are bit-identical.  ``extra_wins`` (windows realized
    # only through a caller-supplied COO overflow -- the legacy dense-BDT
    # test-hook path) join the present set so the overflow epilogue's
    # w_fwd lookups always land in a live bucket (review r5: an
    # overflow-only bucket otherwise mapped to -1 and jnp.take's clip
    # silently redirected the contribution to compact window 0).
    buckets = win // e_sec
    if extra_wins is not None and len(extra_wins):
        buckets = np.concatenate(
            [buckets, np.asarray(extra_wins, np.int64) // e_sec])
    esec_present = np.unique(buckets)
    win = (np.searchsorted(esec_present, win // e_sec) * e_sec
           + win % e_sec)
    nw_tot = len(esec_present) * e_sec + 2
    key = blk * nw_tot + win
    uk, inv = np.unique(key, return_inverse=True)     # sorted (blk, win)
    ub = (uk // nw_tot).astype(np.int64)              # block of each window
    uw = (uk % nw_tot).astype(np.int64)               # window id
    nwin = len(uk)

    # group = (block, E-section); nondecreasing along uk since windows
    # ascend within each block
    grp = ub * (nw_tot // e_sec + 2) + uw // e_sec
    _, ginv, cnt_g = np.unique(grp, return_inverse=True,
                               return_counts=True)
    starts = np.concatenate([[0], np.cumsum(cnt_g)[:-1]])
    rank = np.arange(nwin) - starts[ginv]             # window rank in group
    nps_g = -(-cnt_g // ts)
    ps_off = np.concatenate([[0], np.cumsum(nps_g)[:-1]])
    nps = int(nps_g.sum())
    npspad = max(-(-nps // PS_CHUNK) * PS_CHUNK, PS_CHUNK)

    wpid = (ps_off[ginv] + rank // ts).astype(np.int64)  # pseudo of window
    wslot = (rank % ts).astype(np.int64)

    # scatter entries straight into the pseudo tile array via bincount
    flat = ((wpid[inv] * ts + wslot[inv]) * TILE_R + s % TILE_R) * TILE_C \
        + i % TILE_C
    tiles_flat = np.bincount(flat, weights=v,
                             minlength=npspad * ts * TILE_R * TILE_C)
    tiles_ps = tiles_flat.reshape(npspad, ts, TILE_R, TILE_C).astype(
        np.float32)

    w_ps = np.zeros((npspad, ts), np.int64)
    w_ps[wpid, wslot] = uw
    first = np.zeros(npspad, np.int64)
    first[wpid[wslot == 0]] = uw[wslot == 0]
    realp = np.zeros((npspad, ts), bool)
    realp[wpid, wslot] = True
    w_ps = np.where(realp, w_ps, first[:, None])
    pseudo2blk = np.zeros(npspad, np.int64)
    pseudo2blk[wpid] = ub

    nblkpad = -(-nblk // TILE_R) * TILE_R
    haspid = np.zeros(npspad, bool)
    haspid[wpid] = True
    pseudo2blk[~haspid] = nblkpad - 1
    return (tiles_ps, w_ps, realp, pseudo2blk, haspid, first, nblk, nblkpad,
            npspad, esec_present)


def _finish_pack(tiles_ps, w_ps, realp, pseudo2blk, haspid, first, wS, wI,
                 nsmall, nice, nblk, nblkpad, nv, ts,
                 ov_rows, ov_cols, ov_vals, sec_blocks=None,
                 e_sec=None, esec_present=None,
                 w8_quantile: float = 1.0) -> PallasBDT:
    """Shared packing tail: order pseudo-blocks E-SECTION-major, then
    ICE-SECTION-major, then WINDOW-sorted; chunk; band-cap; demote
    out-of-band tiles to COO; build weight layouts.

    Ice sections: the dest-ice kernel keeps its true-block accumulator
    VMEM-resident; one global accumulator stops fitting past ~2k blocks
    (Antarctica 5 km: 9800 blocks = 38 MB >> 16 MB VMEM, measured 3x
    slowdown as Mosaic spills it).  Blocks are cut into SEC_BLOCKS-sized
    sections; pseudo-blocks are grouped by section (padded per section to
    whole chunks so band chunks and B2' grid steps never straddle), and
    the kernel's out block rides a scalar-prefetched section index --
    zero-init on section entry, weight scale on section exit.

    E sections (r5): the dest-small kernel's E3 accumulator (and the
    dest-ice kernel's E3 input) likewise stop fitting VMEM for global-EC-
    class E spaces.  Pseudo-blocks are grouped E-SECTION-major (each
    pseudo's windows never straddle ``e_sec`` -- ``_pseudo_from_coo``
    splits there), each (esec, isec) pair pads to whole chunks, and each
    esec becomes ONE kernel call per direction (``egroups``) whose E3
    block is that section.  Chunk bands are clamped into their section:
    W8 <= e_sec holds automatically (chunks never straddle buckets), and
    base8 is pulled down to ``section_end - W8`` when a chunk sits near
    the section end (offsets stay in [0, W8)).  A single E section -- every
    pre-global-EC config -- reduces bit-exactly to the one-call layout.

    Within a section pair, pseudo-blocks sort by WINDOW: the pseudo2blk
    indirection makes the order free (A1's gather and B2''s RMW take any
    order) and window-sorted chunks have the narrowest W8 band for ANY
    geometry -- a pole-centered sheet otherwise spreads each chunk over a
    whole latitude ring (measured W8 1064 vs 192 for Greenland)."""
    NV = nv

    # -- (esec, isec)-major, window-sorted pseudo order with per-pair
    # padding (small matrices keep ONE ice section exactly their own size
    # -- no blocked-layout inflation; a mesh build passes a COMMON
    # sec_blocks so every shard's section scheme matches)
    if sec_blocks is None:
        sec_blocks = min(_default_sec_blocks(nv), nblkpad)
    if e_sec is None:
        e_sec = _default_e_sec(nv)
    assert e_sec % TILE_R == 0 and e_sec >= TILE_R
    ridx = np.nonzero(haspid)[0]
    nsec = max(1, -(-nblkpad // sec_blocks))
    nblkpad = nsec * sec_blocks
    NW = -(-nsmall // TILE_R)
    nesec_log = max(1, -(-NW // e_sec))
    if esec_present is None:
        esec_present = np.arange(nesec_log)
    # compaction active when some logical buckets hold no realized
    # windows (the packer relabeled windows onto the PRESENT buckets)
    compacted = len(esec_present) < nesec_log
    nesec = len(esec_present) if compacted else nesec_log
    sec_of = pseudo2blk[ridx] // sec_blocks
    esec_of = first[ridx] // e_sec
    order = np.lexsort((first[ridx], sec_of, esec_of))
    ridx = ridx[order]
    sec_of = sec_of[order]
    esec_of = esec_of[order]
    gkey = esec_of * nsec + sec_of
    cnt2 = np.bincount(gkey, minlength=nesec * nsec).reshape(nesec, nsec)

    # destination layout: per (esec, isec) segment padded to whole chunks.
    # Within each esec group, EVERY ice section in its touched range gets
    # at least one chunk of (zero-tile) pseudo-blocks: the dest-ice kernel
    # zero-inits an ice section only on its first visited step, so a gap
    # section would return uninitialized HBM in that group's partial
    # output.  (Single-esec case: the range is ALL sections -- the r4
    # global-coverage rule, bit-exact.)
    segs = []       # (esec, isec, dst_off, count, padded)
    egroups = []    # (chunk0, chunk1, esec, isec_lo, isec_hi)
    npspad = 0
    dst0 = np.zeros(nesec * nsec, np.int64)
    for e in range(nesec):
        if nesec > 1 and cnt2[e].sum() == 0:
            continue
        if nesec == 1:
            lo, hi = 0, nsec
        else:
            ks = np.nonzero(cnt2[e])[0]
            lo, hi = int(ks.min()), int(ks.max()) + 1
        c0 = npspad // PS_CHUNK
        for k in range(lo, hi):
            c = int(cnt2[e, k])
            pad = max(-(-c // PS_CHUNK) * PS_CHUNK, PS_CHUNK)
            segs.append((e, k, npspad, c, pad))
            dst0[e * nsec + k] = npspad
            npspad += pad
        egroups.append((c0, npspad // PS_CHUNK, e, lo, hi))
    if not egroups:          # nesec > 1 but zero real pseudos
        segs.append((0, 0, 0, 0, PS_CHUNK))
        egroups.append((0, 1, 0, 0, 1))
        npspad = PS_CHUNK

    csort = np.concatenate([[0], np.cumsum(np.bincount(
        gkey, minlength=nesec * nsec))])
    pos = dst0[gkey] + (np.arange(len(ridx)) - csort[gkey])
    t_new = np.zeros((npspad,) + tiles_ps.shape[1:], tiles_ps.dtype)
    t_new[pos] = tiles_ps[ridx]
    # trash pseudos: zero tiles, block = their ice section's last block,
    # window = the segment's last real window (keeps chunk bands narrow)
    # or the E section's first window for empty segments (stays in-bucket)
    p2_new = np.empty(npspad, np.int64)
    w_new = np.zeros((npspad, ts), np.int64)
    r_new = np.zeros((npspad, ts), bool)
    for (e, k, a, c, pad) in segs:
        b = a + pad
        p2_new[a:b] = min((k + 1) * sec_blocks, nblkpad) - 1
        if c:
            g = e * nsec + k
            w_new[a:b] = first[ridx[csort[g] + c - 1]]
        else:
            w_new[a:b] = e * e_sec
    p2_new[pos] = pseudo2blk[ridx]
    w_new[pos] = w_ps[ridx]
    r_new[pos] = realp[ridx]
    tiles_ps, w_ps, realp, pseudo2blk = t_new, w_new, r_new, p2_new

    # -- per-CHUNK section metadata (fused grid: one chunk per step;
    # sections pad to whole chunks so steps never straddle sections).
    # Group boundaries force first/last bits: an ice section revisited by
    # the NEXT esec group accumulates into a FRESH per-group partial.
    nstep_b2 = npspad // PS_CHUNK
    step_sec = (pseudo2blk[::PS_CHUNK] // sec_blocks).astype(np.int32)
    sec_flags = np.zeros(nstep_b2, np.int32)
    firsts = np.ones(nstep_b2, bool)
    firsts[1:] = step_sec[1:] != step_sec[:-1]
    lasts = np.ones(nstep_b2, bool)
    lasts[:-1] = step_sec[1:] != step_sec[:-1]
    for (c0, c1, e, lo, hi) in egroups:
        firsts[c0] = True
        lasts[c1 - 1] = True
    sec_flags[firsts] |= 1
    sec_flags[lasts] |= 2

    # chunking over pseudo rows for the scatter/gather band kernels
    C2 = PS_CHUNK * ts
    nchunk = npspad // PS_CHUNK
    ws = w_ps.reshape(nchunk, C2)
    rs = realp.reshape(nchunk, C2)
    base = np.zeros(nchunk, np.int64)
    for k in range(nchunk):
        if rs[k].any():
            base[k] = ws[k][rs[k]].min()
        else:
            base[k] = ws[k, 0]          # trash window (in its E section)
    base8 = (base // TILE_R) * TILE_R
    off = ws - base8[:, None]

    spread = np.where(rs, off, 0)
    W8 = int(spread.max(initial=0)) + 1
    if w8_quantile < 1.0 and nchunk > 1:
        # band-cost cap (round 5): W8 is otherwise set by the single
        # WORST chunk; a quantile cap demotes the tail's out-of-band
        # tiles to the COO epilogue and shrinks every chunk's band
        # matmul.  MEASURED COUNTERPRODUCTIVE on v5e for Antarctica 5 km
        # (tools/probe_w8_cap.py: q=0.95 demotes only 1159 entries yet
        # rt DOUBLES -- the XLA gather/scatter epilogue costs ~545 us
        # per apply even scale-folded, vs ~60-100 us of band savings;
        # TPU scatter is the same ~100x-byte-cost pathology recorded for
        # round 1).  Kept as an experimentation knob; default 1.0 = off.
        sp_chunk = spread.max(axis=1) + 1
        W8 = min(W8, max(int(np.quantile(sp_chunk, w8_quantile)), TILE_R))
    W8 = int(min(max(W8, TILE_R), W8_CAP))
    W8 = -(-W8 // TILE_R) * TILE_R
    # clamp each chunk's band start so [base8, base8+W8) stays inside its
    # E section block.  No-op only when max(base8) + W8 <= e_sec; a
    # single-section config whose band would cross the section end gets
    # its base pulled down and any now-out-of-band tiles demoted to the
    # COO overflow epilogue below (results identical, layout/perf differ).
    # Offsets stay in [0, W8) because a chunk's windows never straddle
    # its section.
    chunk_e = ws[:, 0] // e_sec
    base8 = np.minimum(base8, (chunk_e + 1) * e_sec - W8)
    base8 = np.maximum(base8, chunk_e * e_sec)
    off = ws - base8[:, None]

    oob = rs & (off >= W8)
    ex_s, ex_c, ex_v = [], [], []
    if oob.any():
        t_ps = tiles_ps.reshape(nchunk, C2, TILE_R, TILE_C)
        p2b = pseudo2blk.reshape(nchunk, PS_CHUNK)
        ok, oc = np.nonzero(oob)
        for k, c in zip(ok, oc):
            tv = t_ps[k, c]
            rr, cc = np.nonzero(tv)
            ex_s.append(ws[k, c] * TILE_R + rr)
            ex_c.append(p2b[k, c // ts] * TILE_C + cc)
            ex_v.append(tv[rr, cc])
            t_ps[k, c] = 0.0
    ov_s = [np.asarray(ov_rows)] if ov_rows is not None else []
    ov_c = [np.asarray(ov_cols)] if ov_cols is not None else []
    ov_v = [np.asarray(ov_vals)] if ov_vals is not None else []
    ov_s = np.concatenate(ov_s + ex_s) if (ov_s or ex_s) else None
    ov_c = np.concatenate(ov_c + ex_c) if (ov_c or ex_c) else None
    ov_v = np.concatenate(ov_v + ex_v) if (ov_v or ex_v) else None

    if nesec > 1 or compacted:
        NWpad = nesec * e_sec        # whole sections: per-esec out blocks
        # (compacted single-bucket packs keep the full e_sec row count:
        # a sub-section odd row count measured a Mosaic stack-VMEM
        # regression -- 3864 rows OOM'd where 4096 compiled)
    else:
        NWpad = max(NW, int(base8.max(initial=0)) + W8)
        NWpad = -(-NWpad // TILE_R) * TILE_R

    winvS = np.where(wS != 0, 1.0 / np.where(wS != 0, wS, 1.0), 0.0)
    winvI = np.where(wI != 0, 1.0 / np.where(wI != 0, wI, 1.0), 0.0)
    if compacted:
        npres = len(esec_present)
        w_fwd = np.full(NW, -1, np.int64)
        lw = np.arange(NW)
        lb = lw // e_sec
        sl = np.searchsorted(esec_present, lb)
        ok = ((sl < npres)
              & (esec_present[np.minimum(sl, npres - 1)] == lb))
        mapped = sl * e_sec + lw % e_sec
        ok &= mapped < NWpad
        w_fwd[ok] = mapped[ok]
        w_inv = np.full(NWpad, -1, np.int64)
        rw = np.arange(NWpad)
        orig = esec_present[rw // e_sec] * e_sec + rw % e_sec
        vv = orig < NW
        w_inv[vv] = orig[vv]
        wvs = np.zeros(NWpad * TILE_R)
        sidx = np.arange(nsmall)
        wf = w_fwd[sidx // TILE_R]
        oks = wf >= 0
        wvs[wf[oks] * TILE_R + sidx[oks] % TILE_R] = winvS[oks]
    else:
        w_fwd = w_inv = None
        wvs = np.zeros(NWpad * TILE_R)
        wvs[:nsmall] = winvS
    winvS_e3 = np.repeat(wvs.reshape(NWpad, TILE_R), NV,
                         axis=1).astype(np.float32)
    wvi = np.zeros(nblkpad * TILE_C)
    wvi[:nice] = winvI
    winvI_blk = wvi.reshape(nblkpad, 1, TILE_C).astype(np.float32)

    offc = np.clip(off, -2**30, 2**30).astype(np.int32)
    # pad chunk-level arrays to a CH_GROUP multiple so the band kernels can
    # loop over G chunks per grid step (padded chunks: off=0, base=0, p2=0)
    G = min(CH_GROUP, nchunk)
    nchunkpad = -(-nchunk // G) * G
    if nchunkpad > nchunk:
        offc = np.pad(offc, ((0, nchunkpad - nchunk), (0, 0)))
        base8 = np.pad(base8, (0, nchunkpad - nchunk))
    return PallasBDT(
        # R-MAJOR tile rows (r*ts + t): the fused kernels' fold/unfold
        # slices are per-r contiguous blocks of ts rows
        tiles2=jnp.asarray(np.ascontiguousarray(
            tiles_ps.transpose(0, 2, 1, 3)
            .reshape(npspad, ts * TILE_R, TILE_C))),
        pseudo2blk=jnp.asarray(pseudo2blk.astype(np.int32)),
        w_off=jnp.asarray(np.repeat(offc, TILE_R, axis=0)),
        w_offT=jnp.asarray(offc.reshape(nchunkpad * C2, 1)),
        base=jnp.asarray(base8.astype(np.int32)),
        winvS_e3=jnp.asarray(winvS_e3),
        winvI_blk=jnp.asarray(winvI_blk),
        wS=jnp.asarray(wS, jnp.float32), wI=jnp.asarray(wI, jnp.float32),
        ov_s=None if ov_s is None else jnp.asarray(ov_s, jnp.int32),
        ov_c=None if ov_c is None else jnp.asarray(ov_c, jnp.int32),
        ov_v=None if ov_v is None else jnp.asarray(ov_v, jnp.float32),
        sec_idx=jnp.asarray(step_sec),
        sec_flags=jnp.asarray(sec_flags),
        w_fwd=None if w_fwd is None else jnp.asarray(
            w_fwd.astype(np.int32)),
        w_inv=None if w_inv is None else jnp.asarray(
            w_inv.astype(np.int32)),
        ts=ts, W8=W8, NV=NV, nchunk=nchunk, nchunkpad=nchunkpad,
        npspad=npspad, nblk=nblk, nblkpad=nblkpad, NWpad=NWpad,
        nsmall=int(nsmall), nice=int(nice), sec_blocks=sec_blocks,
        e_sec=int(e_sec), nesec=int(nesec), nw_logical=int(NW),
        egroups=tuple((int(a), int(b), int(e), int(lo), int(hi))
                      for (a, b, e, lo, hi) in egroups))


_TUNED = False


def _ensure_tuned():
    """Install the attached chip's tunables table once (ops.tuning) --
    lazily, so importing this module never initializes a backend."""
    global _TUNED
    if not _TUNED:
        from icebin_tpu.ops.tuning import apply_tunables
        apply_tunables()
        _TUNED = True


def pallas_from_weighted(M, small_axis: str = "rows", nv: int = 8,
                         ts: int = TS, max_tiles_per_block=None,
                         sec_blocks=None, e_sec=None,
                         w8_quantile: float = 1.0) -> PallasBDT:
    """Build the fused-kernel form straight from a WeightedMatrix.

    Packs the pseudo-block tiles DIRECTLY from the COO entries
    (``_pseudo_from_coo``): every window gets a slot (pseudo-blocks absorb
    heavy blocks at TS granularity; the XLA scatter epilogue for overflow
    costs ~100x its byte count — measured 255 us for 765 entries), so the
    only COO demotion is the W8 band cap for pathological polar blocks.
    The dense (nblk, T, 8, 128) BDT intermediate of round 1 is gone: it
    cost 120 s host-side at Antarctica-5km scale vs ~2 s direct.

    An explicit ``max_tiles_per_block`` routes through the legacy dense-BDT
    path (its per-block cap demotes excess windows to COO -- kept as a test
    hook for the overflow epilogue); the default direct packer has no cap.
    """
    _ensure_tuned()
    if e_sec is None:
        e_sec = _default_e_sec(nv)
    if max_tiles_per_block is not None:
        from icebin_tpu.ops.bdt import bdt_from_weighted
        bm = bdt_from_weighted(M, small_axis=small_axis,
                               max_tiles_per_block=max_tiles_per_block,
                               to_device=False)
        return pallas_from_bdt(bm, nv=nv, ts=ts, sec_blocks=sec_blocks,
                               e_sec=e_sec)
    if small_axis == "rows":
        s, i, v = M.rows, M.cols, M.vals
        nsmall, nice = M.shape
        wS, wI = M.wM, M.Mw
    else:
        s, i, v = M.cols, M.rows, M.vals
        nice, nsmall = M.shape
        wS, wI = M.Mw, M.wM
    if len(s) == 0:                      # empty shard (masked-out range)
        s = np.zeros(1, np.int64)
        i = np.zeros(1, np.int64)
        v = np.zeros(1, np.float64)
    (tiles_ps, w_ps, realp, pseudo2blk, haspid, first, nblk, nblkpad,
     npspad, esecp) = _pseudo_from_coo(s, i, v, nsmall, nice, ts,
                                       e_sec=e_sec)
    return _finish_pack(tiles_ps, w_ps, realp, pseudo2blk, haspid, first,
                        np.asarray(wS, np.float64),
                        np.asarray(wI, np.float64),
                        nsmall, nice, nblk, nblkpad, nv, ts,
                        None, None, None, sec_blocks=sec_blocks,
                        e_sec=e_sec, esec_present=esecp,
                        w8_quantile=w8_quantile)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dims):
    """3-pass split-bf16 dot (hh + lh + hl): ~4e-6 raw relative accuracy at
    1.5x the speed of precision=HIGHEST's generic 6-pass emulation (the
    dropped ll term and 16-bit operand truncation; conservation is
    untouched -- the f64 repair runs on weighted sums downstream).
    PRODS_PASSES=6 restores HIGHEST for callers that want the 1e-7 path."""
    ahi, alo = _split2(a)
    bhi, blo = _split2(b)
    acc = jax.lax.dot_general(ahi, bhi, dims,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(alo, bhi, dims,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ahi, blo, dims,
                               preferred_element_type=jnp.float32)
    return acc


def _fused_small_kernel(PSC, ts, W8, SEC, c0, eoff, nstep, passes, scale,
                        unroll, base_ref, p2b_ref, si_ref, tiles_ref, f_ref,
                        woff_ref, winv_ref, out_ref, s_ref, p2_ref):
    """Fused dest-small: one chunk (PSC pseudo-blocks) per grid step.

    Per pseudo-block: MXU contraction of the r-major tiles (8*ts, 128)
    against its true block's field row — read from the (SEC, NV, 128)
    field SECTION block via the scalar-prefetched ``pseudo2blk`` (the
    in-kernel twin of the old XLA pseudo-order gather; legal because
    chunks never straddle sections) — into the (8*ts, NV) scratch, then
    the sublane-slice + lane-concat fold to E3 lane order lands rows
    [p*ts, (p+1)*ts) of the (C2, 8*NV) chunk scratch.  After the loop, ONE
    one-hot band matmul (window offsets vs iota) accumulates the chunk
    into the VMEM-resident E3 accumulator.  With ``scale`` the winvS
    multiply fuses onto the last grid step.

    One call covers ONE E-section group: chunks [c0, c0+nstep) of the pack
    order, E3 rows [eoff, eoff + out_rows) (``eoff`` = esec * e_sec; both
    0 for the common single-section case)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dims = (((1,), (1,)), ((), ()))

    def body(p, sl):
        t = tiles_ref[p]                        # (8*ts, 128) rows r*ts+t
        j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * SEC
        f = f_ref[pl.ds(j, 1), :, :][0]         # (NV, 128) section row
        if passes >= 6:
            s_ref[sl] = jax.lax.dot_general(
                t, f, dims, preferred_element_type=jnp.float32,
                precision=HIGH)
        else:
            s_ref[sl] = _dot3(t, f, dims)
        # (8*ts, NV) rows r*ts+t -> (ts, 8*NV) lanes r*NV+v
        fold = jnp.concatenate(
            [s_ref[sl, q * ts:(q + 1) * ts, :] for q in range(TILE_R)],
            axis=1)
        p2_ref[pl.ds(p * ts, ts), :] = fold

    # unrolled Python loop with PARITY-ALTERNATED product scratch: without
    # it, iteration p+1's dot must wait for p's fold to drain the single
    # buffer -- a 128-long serial VPU<->MXU chain Mosaic cannot pipeline
    # (r4 probe: tools/probe_slots.py).  Interpret mode keeps the rolled
    # fori_loop -- a 128x-unrolled jaxpr makes CPU tests crawl.
    if unroll:
        for p in range(PSC):
            body(p, p % SMALL_SLOTS)
    else:
        jax.lax.fori_loop(0, PSC,
                          lambda p, _: (body(p, 0), 0)[1], 0)

    C2 = PSC * ts
    woff = woff_ref[0:1, :]                     # (1, C2)
    u = jax.lax.broadcasted_iota(jnp.int32, (W8, C2), 0)
    band = _split3_dot(woff == u, p2_ref[:], (((1,), (0,)), ((), ())))
    b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
    out_ref[pl.ds(b8, W8), :] += band

    if scale:
        @pl.when(i == nstep - 1)
        def _():
            out_ref[:] = out_ref[:] * winv_ref[:]


def _split3_dot(oh_bool, x, dims):
    """dot(one-hot, x) with f32-equivalent accuracy in 3 MXU passes.

    A 0/1 matrix is EXACTLY representable in bf16, so only ``x`` needs
    splitting: x = hi + mid + lo (each bf16, together carrying x's full 24
    mantissa bits); each bf16xbf16 pass accumulates exactly in f32.  That
    is 2x fewer passes than Precision.HIGHEST's generic 6-pass f32
    emulation (which must split BOTH operands) at the same accuracy.
    """
    if not ONEHOT_SPLIT:
        oh = oh_bool.astype(jnp.float32)
        return jax.lax.dot_general(oh, x, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=HIGH)
    ohb = oh_bool.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(ohb, hi, dims,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ohb, mid, dims,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ohb, lo, dims,
                               preferred_element_type=jnp.float32)
    return acc


def _fused_ice_kernel(PSC, ts, W8, sec_blocks, c0, eoff, scale, unroll,
                      passes,
                      base_ref, p2b_ref, si_ref, fl_ref,
                      e3_ref, tiles_ref, woffT_ref, winv_ref,
                      out_ref, fwin_ref, fu_ref, *maybe_va):
    """Fused dest-ice: one chunk per grid step.

    The one-hot-transpose band matmul gathers E3 window rows into the
    (C2, 8*NV) chunk scratch; the unfold to r-major rows runs as 8
    CHUNK-level lane-slice + leading-dim-reshape ops into (PSC, 8*ts,
    NV); ONE BATCHED MXU contraction (batch dim = pseudo) produces every
    pseudo's (NV, 128) product at once (round 4: the per-pseudo
    slice->dot->RMW chain through one shared scratch serialized VPU
    against MXU ~128 deep -- tools/probe_batch.py; the batched form is
    bit-exact); the products then RMW into the section accumulator
    ((sec_blocks, NV, 128), VMEM-resident; the out BlockSpec rides the
    scalar-prefetched section index — zero-init on section entry (flag
    bit0), weight scale on exit (bit1)).

    One call covers ONE E-section group: chunks [c0, c0+nstep), E3 input
    block = that section (``eoff`` = esec * e_sec), output = the PARTIAL
    over the group's ice-section range (summed across groups by the
    caller when there is more than one).

    ``passes`` selects the A1 accuracy mode like the dest-small kernel's
    (6 = HIGHEST, the default 1e-7 forcing contract; 3 = in-kernel
    split-bf16, ~4e-6 raw at ~1.5x the A1 speed -- round 5: exposed for
    callers whose forcing fields tolerate it; conservation is untouched
    either way, the f64 repair acts on weighted sums downstream)."""
    va_ref = maybe_va[0] if maybe_va else None
    i = pl.program_id(0)

    @pl.when((fl_ref[c0 + i] & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    C2 = PSC * ts
    b8 = pl.multiple_of(base_ref[c0 + i] - eoff, TILE_R)
    band = e3_ref[pl.ds(b8, W8), :]             # (W8, 8*NV)
    woffT = woffT_ref[:]                        # (C2, 1)
    u = jax.lax.broadcasted_iota(jnp.int32, (C2, W8), 1)
    fwin_ref[:] = _split3_dot(woffT == u, band,
                              (((1,), (0,)), ((), ())))  # (C2, 8*NV)

    NV = fwin_ref.shape[1] // TILE_R

    if ICE_BATCHED:
        # chunk-level unfold: lanes r*NV+v of fwin -> rows r*ts+t of fu
        # ((C2, NV) lane slice reshaped (PSC, ts, NV): leading dims only --
        # Mosaic rejects 8-lane-minor shape casts, not these)
        for q in range(TILE_R):
            blk = fwin_ref[:, q * NV:(q + 1) * NV]
            fu_ref[:, q * ts:(q + 1) * ts, :] = blk.reshape(PSC, ts, NV)

        # one batched contraction for the whole chunk (K = 8*ts/pseudo)
        if passes >= 6:
            va_ref[:] = jax.lax.dot_general(
                fu_ref[:], tiles_ref[:], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=HIGH)
        else:
            va_ref[:] = _dot3(fu_ref[:], tiles_ref[:],
                              (((1,), (1,)), ((0,), (0,))))

        def body(p, _):
            j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * sec_blocks
            out_ref[pl.ds(j, 1), :, :] += va_ref[pl.ds(p, 1)]
            return 0
    else:
        def body(p, _):
            fw = fwin_ref[pl.ds(p * ts, ts), :]   # (ts, 8*NV) lanes r*NV+v
            for q in range(TILE_R):               # -> (8*ts, NV) rows
                fu_ref[0, q * ts:(q + 1) * ts, :] = \
                    fw[:, q * NV:(q + 1) * NV]
            if passes >= 6:
                val = jax.lax.dot_general(
                    fu_ref[0], tiles_ref[p], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HIGH)
            else:
                val = _dot3(fu_ref[0], tiles_ref[p],
                            (((0,), (0,)), ((), ())))
            j = p2b_ref[(c0 + i) * PSC + p] - si_ref[c0 + i] * sec_blocks
            out_ref[pl.ds(j, 1), :, :] += val[None]
            return 0

    # full unroll lets Mosaic software-pipeline the per-pseudo chain
    # (fori_loop supports only unroll in {1, num_steps}); interpret mode
    # keeps unroll=1 -- a 128x-unrolled jaxpr makes CPU tests crawl
    jax.lax.fori_loop(0, PSC, body, 0, unroll=PSC if unroll else 1)

    if scale:
        @pl.when((fl_ref[c0 + i] & 2) == 2)
        def _():
            out_ref[:] = out_ref[:] * winv_ref[:]


def _mk_fused_small(pm: PallasBDT, interpret: bool, scale: bool = False,
                    passes=None, group=None):
    """One dest-small kernel call for one E-section group.  ``group``
    defaults to the sole group of a single-section pack (the common case:
    the full E3 accumulator is VMEM-resident and one call covers every
    chunk)."""
    PSC, ts, NV, W8 = PS_CHUNK, pm.ts, pm.NV, pm.W8
    C2 = PSC * ts
    SEC = pm.sec_blocks
    c0, c1, esec, _lo, _hi = group if group is not None else pm.egroups[0]
    nstep = c1 - c0
    rows = pm.e_sec if pm.nesec > 1 else pm.NWpad
    eoff = esec * pm.e_sec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                         lambda i, b, p2, si: (c0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEC, NV, TILE_C),
                         lambda i, b, p2, si: (si[c0 + i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, C2), lambda i, b, p2, si: (c0 + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, TILE_R * NV),
                         lambda i, b, p2, si: (esec, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, TILE_R * NV),
                               lambda i, b, p2, si: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SMALL_SLOTS, TILE_R * ts, NV),
                                   jnp.float32),
                        pltpu.VMEM((C2, TILE_R * NV), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fused_small_kernel, PSC, ts, W8, SEC, c0, eoff,
                          nstep, passes or PRODS_PASSES, scale,
                          not interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, TILE_R * NV), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=(2 * nstep * PSC * TILE_R * ts * TILE_C * NV
                   + 2 * nstep * W8 * C2 * TILE_R * NV),
            bytes_accessed=nstep * PSC * TILE_R * ts * TILE_C * 4,
            transcendentals=0),
    )


def _mk_fused_ice(pm: PallasBDT, interpret: bool, scale: bool = False,
                  group=None, passes=None):
    """One dest-ice kernel call for one E-section group (see
    ``_mk_fused_small``); the output is the partial over the group's
    ice-section range [lo, hi)."""
    PSC, ts, NV, W8 = PS_CHUNK, pm.ts, pm.NV, pm.W8
    C2 = PSC * ts
    SEC = pm.sec_blocks
    c0, c1, esec, lo, hi = group if group is not None else pm.egroups[0]
    nstep = c1 - c0
    rows = pm.e_sec if pm.nesec > 1 else pm.NWpad
    eoff = esec * pm.e_sec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((rows, TILE_R * NV),
                         lambda i, b, p2, si, fl: (esec, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PSC, TILE_R * ts, TILE_C),
                         lambda i, b, p2, si, fl: (c0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, 1), lambda i, b, p2, si, fl: (c0 + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEC, 1, TILE_C),
                         lambda i, b, p2, si, fl: (si[c0 + i], 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SEC, NV, TILE_C),
                               lambda i, b, p2, si, fl: (si[c0 + i] - lo,
                                                         0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C2, TILE_R * NV), jnp.float32),
                        pltpu.VMEM((PSC, TILE_R * ts, NV), jnp.float32)]
        + ([pltpu.VMEM((PSC, NV, TILE_C), jnp.float32)]
           if ICE_BATCHED else []),
    )
    return pl.pallas_call(
        functools.partial(_fused_ice_kernel, PSC, ts, W8, SEC, c0, eoff,
                          scale, not interpret, passes or 6),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((hi - lo) * SEC, NV, TILE_C),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=(2 * nstep * PSC * TILE_R * ts * TILE_C * NV
                   + 2 * nstep * W8 * C2 * TILE_R * NV),
            bytes_accessed=nstep * PSC * TILE_R * ts * TILE_C * 4,
            transcendentals=0),
    )


# ---------------------------------------------------------------------------
# fused applies (kernels + tiny XLA epilogue for overflow/scale)
# ---------------------------------------------------------------------------

def _ov_e3_ids(pm: PallasBDT):
    """Flat E3 ids (NV, nov) of the overflow small rows (compacted
    window space: through ``w_fwd``; overflow rows are realized, so
    their buckets are always present)."""
    w = pm.ov_s // TILE_R
    if pm.w_fwd is not None:
        w = jnp.take(pm.w_fwd, w)
    fbase = w * (TILE_R * pm.NV) + (pm.ov_s % TILE_R) * pm.NV
    return fbase[None, :] + jnp.arange(pm.NV, dtype=jnp.int32)[:, None]


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "passes"))
def apply_small_blocked(pm: PallasBDT, fb, scale: bool = True,
                        interpret: Optional[bool] = None,
                        passes: Optional[int] = None):
    """dest-small (EvI/AvI): blocked ice (nblkpad, NV, 128) → E3 layout.

    The field rides straight into the kernel as section blocks (the
    pseudo-order row-gather that preceded rounds-1..3 kernels is fused
    in-kernel via the scalar-prefetched ``pseudo2blk``/``sec_idx``).
    Overflow entries and the weight scale ride a fused XLA epilogue on the
    E3 accumulator (both are linear, so kernel part + overflow part scale
    together).
    """
    if interpret is None:
        interpret = _interpret_default()
    # the winvS scale always fuses into the kernel's last step (per-esec
    # calls too: groups partition the E rows).  Overflow entries add
    # AFTER with the diagonal scale folded into the addend — (K + O)·D =
    # K·D + O·D — so demoting tiles to COO no longer costs a full
    # accumulator re-pass (round 5; the old unscaled-add-then-scale
    # epilogue re-streamed the whole E3 accumulator and unblocked the
    # entire ice field for a handful of entries)
    in_scale = scale
    # Mosaic rejects x64 grid indices; the kernels are all-f32/int32, so
    # trace them with x64 scoped off (callers may run a global-x64 ledger).
    with jax.enable_x64(False):
        if pm.nesec == 1:
            acc = _mk_fused_small(pm, interpret, in_scale, passes)(
                pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2, fb,
                pm.w_off, pm.winvS_e3)
        else:
            # compaction keeps only PRESENT buckets, but a bucket whose
            # rows are realized solely through the COO overflow has no
            # chunks/group -- its kernel part is exact zeros (the
            # epilogue adds the overflow)
            gmap = {g[2]: g for g in pm.egroups}
            parts = []
            for e_ in range(pm.nesec):
                if e_ in gmap:
                    parts.append(_mk_fused_small(
                        pm, interpret, in_scale, passes, gmap[e_])(
                        pm.base, pm.pseudo2blk, pm.sec_idx, pm.tiles2,
                        fb, pm.w_off, pm.winvS_e3))
                else:
                    parts.append(jnp.zeros((pm.e_sec, TILE_R * pm.NV),
                                           jnp.float32))
            acc = jnp.concatenate(parts, axis=0)
    if pm.ov_s is not None:
        # sources gathered straight from the BLOCKED field (flat index
        # (c//128)·NV·128 + v·128 + c%128) — no full-array unblock
        obase = ((pm.ov_c // TILE_C) * (pm.NV * TILE_C)
                 + pm.ov_c % TILE_C)
        sids = (obase[None, :]
                + (jnp.arange(pm.NV, dtype=jnp.int32) * TILE_C)[:, None])
        g = jnp.take(fb.reshape(-1), sids.reshape(-1)).reshape(pm.NV, -1)
        g = g * pm.ov_v[None, :]
        ids = _ov_e3_ids(pm)
        if scale:
            g = g * jnp.take(pm.winvS_e3.reshape(-1),
                             ids.reshape(-1)).reshape(pm.NV, -1)
        acc = acc.reshape(-1).at[ids.reshape(-1)].add(
            g.reshape(-1)).reshape(pm.NWpad, TILE_R * pm.NV)
    return acc


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "passes"))
def apply_ice_blocked(pm: PallasBDT, e3, scale: bool = True,
                      interpret: Optional[bool] = None,
                      passes: Optional[int] = None):
    """dest-ice (IvE/IvA): E3 layout → blocked ice (nblkpad, NV, 128).
    ``passes`` selects the A1 accuracy (None/6 = HIGHEST, the 1e-7
    forcing contract; 3 = split-bf16 ~4e-6)."""
    if interpret is None:
        interpret = _interpret_default()
    # the fused kernel folds in the pseudo→true segment-sum and (overflow-
    # free) the weight scale; with overflow the scale waits for the COO
    # add, and with MULTIPLE E-section groups it waits for the cross-group
    # partial sum (an ice section can receive mass from several E
    # sections).  Bucket compaction (round 5) makes ONE section the
    # common case for every real sheet config -- sparse E spaces that
    # formerly took the r4 "one-group fast path" now pack as genuinely
    # single-section (zeros for dead rows come from the w_fwd/w_inv maps,
    # not a zeros-concat epilogue).
    # (overflow no longer blocks the fused scale: the COO add folds the
    # diagonal winvI into its addend — round 5)
    in_scale = scale and pm.nesec == 1
    with jax.enable_x64(False):   # Mosaic rejects x64 grid indices
        if pm.nesec == 1:
            out = _mk_fused_ice(pm, interpret, in_scale, passes=passes)(
                pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                e3, pm.tiles2, pm.w_offT, pm.winvI_blk)
        else:
            SEC = pm.sec_blocks
            out = jnp.zeros((pm.nblkpad, pm.NV, TILE_C), jnp.float32)
            for g in pm.egroups:
                part = _mk_fused_ice(pm, interpret, False, g,
                                     passes=passes)(
                    pm.base, pm.pseudo2blk, pm.sec_idx, pm.sec_flags,
                    e3, pm.tiles2, pm.w_offT, pm.winvI_blk)
                _c0, _c1, _e, lo, hi = g
                out = out.at[lo * SEC:hi * SEC].add(part)
    if pm.ov_s is not None:
        ids = _ov_e3_ids(pm)
        g = jnp.take(e3.reshape(-1), ids.reshape(-1)).reshape(pm.NV, -1)
        g = g * pm.ov_v[None, :]                            # (NV, nov)
        if in_scale:       # kernel already scaled: fold winvI in here
            g = g * jnp.take(pm.winvI_blk.reshape(-1), pm.ov_c)[None, :]
        # scatter into flat blocked out: (c//128)*NV*128 + v*128 + c%128
        obase = ((pm.ov_c // TILE_C) * (pm.NV * TILE_C) + pm.ov_c % TILE_C)
        oids = (obase[None, :]
                + (jnp.arange(pm.NV, dtype=jnp.int32) * TILE_C)[:, None])
        out = out.reshape(-1).at[oids.reshape(-1)].add(
            g.reshape(-1)).reshape(pm.nblkpad, pm.NV, TILE_C)
    if scale and not in_scale:
        out = out * pm.winvI_blk
    return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PallasView:
    """A logical direction over a canonical PallasBDT tile set.

    ``transposed=False`` is the stored (small x ice) orientation (EvI/AvI);
    ``transposed=True`` is the reverse (IvE/IvA). One tile set serves both
    (the unscaled matrices are exact transposes), mirroring the XLA path's
    flipped-view sharing (``icebin_tpu.ops.bdt.apply_bdt_T``).
    """

    pm: PallasBDT
    transposed: bool

    def tree_flatten(self):
        return ((self.pm,), (self.transposed,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    @property
    def wM(self):
        return self.pm.wI if self.transposed else self.pm.wS

    @property
    def Mw(self):
        return self.pm.wS if self.transposed else self.pm.wI

    @property
    def logical_shape(self):
        return ((self.pm.nice, self.pm.nsmall) if self.transposed
                else (self.pm.nsmall, self.pm.nice))


def pallas_view_pair(M, small_axis: str = "rows", nv: int = 8, ts: int = TS):
    """(forward_view, reverse_view) sharing one tile set."""
    pm = pallas_from_weighted(M, small_axis=small_axis, nv=nv, ts=ts)
    fwd = PallasView(pm, transposed=(small_axis == "cols"))
    return fwd, PallasView(pm, transposed=not fwd.transposed)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "passes"))
def apply_view(vw: PallasView, f, scale: bool = True, var_factor=None,
               var_offset=None, fill=jnp.nan,
               interpret: Optional[bool] = None,
               passes: Optional[int] = None):
    """apply_bdt-compatible apply of a PallasView (drop-in for the coupler).

    ``fill`` lands on zero-weight destinations when scaling (the kernels
    produce 0 there); ``var_factor``/``var_offset`` are per-field affine
    unit conversions fused on the output.  ``passes`` selects the
    dest-small MXU accuracy (see ``_dot3``); dest-ice ALWAYS runs
    HIGHEST here -- the coupler's 1e-7 forcing contract (direct
    ``apply_ice(..., passes=3)`` callers can opt out).
    """
    single = f.ndim == 1
    fv = f[None, :] if single else f
    if vw.transposed:
        out = apply_ice(vw.pm, fv, scale=scale, interpret=interpret)
    else:
        out = apply_small(vw.pm, fv, scale=scale, interpret=interpret,
                          passes=passes)
    if scale:
        out = jnp.where(vw.wM[None, :] != 0, out, fill)
    if var_factor is not None:
        out = out * var_factor[:, None]
    if var_offset is not None:
        out = out + var_offset[:, None]
    return out[0] if single else out


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "passes"))
def apply_small(pm: PallasBDT, f, scale: bool = True,
                interpret: Optional[bool] = None,
                passes: Optional[int] = None):
    """(nv, nice) or (nice,) → (nv, nsmall): convenience wrapper.  Field
    counts beyond the pack's NV batch through the kernel in NV-sized
    groups (the richer round-4 contract tables exceed the default 8)."""
    single = f.ndim == 1
    fv = f[None, :] if single else f
    nv_in = fv.shape[0]
    if nv_in > pm.NV:
        parts = [apply_small(pm, fv[k:k + pm.NV], scale=scale,
                             interpret=interpret, passes=passes)
                 for k in range(0, nv_in, pm.NV)]
        return jnp.concatenate(parts, axis=0)
    if nv_in < pm.NV:
        fv = jnp.pad(fv, ((0, pm.NV - nv_in), (0, 0)))
    e3 = apply_small_blocked(pm, pm.ice_to_blocked(fv), scale=scale,
                             interpret=interpret, passes=passes)
    out = pm.e3_to_small(e3)[:nv_in]
    return out[0] if single else out


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "passes"))
def apply_ice(pm: PallasBDT, f, scale: bool = True,
              interpret: Optional[bool] = None,
              passes: Optional[int] = None):
    """(nv, nsmall) or (nsmall,) → (nv, nice): convenience wrapper.  Field
    counts beyond the pack's NV batch through in NV-sized groups."""
    single = f.ndim == 1
    fv = f[None, :] if single else f
    nv_in = fv.shape[0]
    if nv_in > pm.NV:
        parts = [apply_ice(pm, fv[k:k + pm.NV], scale=scale,
                           interpret=interpret, passes=passes)
                 for k in range(0, nv_in, pm.NV)]
        return jnp.concatenate(parts, axis=0)
    if nv_in < pm.NV:
        fv = jnp.pad(fv, ((0, pm.NV - nv_in), (0, 0)))
    out = apply_ice_blocked(pm, pm.small_to_e3(fv), scale=scale,
                            interpret=interpret, passes=passes)
    out = pm.blocked_to_ice(out)[:nv_in]
    return out[0] if single else out
