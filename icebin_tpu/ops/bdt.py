"""Block-dense-tile (BDT) sparse format: the TPU-native regrid-apply layout.

Why this exists: regrid matrices connect a HUGE ice space (10^5..10^7 cells)
to a SMALL atmosphere/elevation space (10^4..10^5), and TPU random gather is
catastrophically slow (~1.5 G elem/s measured on v5e -- 1% of HBM roof; see
tools/bench_spmv_explore.py).  The reference's Eigen SpMV (``linear::
Weighted_Eigen::apply_M`` [U]) has no such constraint on CPU; a TPU-native
apply must avoid per-element gathers entirely.

BDT exploits the exchange grid's *spatial locality*: 128 consecutive ice
cells (one lattice-row chunk) overlap only a handful of A cells, whose
elevation classes are adjacent in an a-major E layout.  So the matrix --
canonically oriented (small-space rows) x (ice cols) -- is stored as dense
f32 tiles of shape (8 small rows x 128 ice lanes):

  * tiles:      (nblk, T, 8, 128)  dense values; nblk = ice cols / 128,
                T = tiles per ice block (padded; overflow entries spill to a
                COO fallback)
  * row_start:  (nblk, T) int32    first small-space row of each tile window

Apply in either direction is then contiguous tile streaming plus small MXU
matmuls:
  dest-small (EvI, AvI):  acc[row_start:+8] += tile @ f_ice_block(128, nvar)
  dest-ice  (IvE, IvA):   out_block(128)  += f_small[row_start:+8] @ tile
with NO gather over the ice space at all; the only irregular access is
8-row windows of the small space (VMEM-resident, ~2 MB).

This module: host-side builder + XLA reference apply.  The Pallas
speed-of-light kernel lives in ``icebin_tpu.ops.pallas_spmv`` and shares this
layout.  (SURVEY.md section 7 stage 4: 'padded block-CSR ... flagship
kernel'.)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icebin_tpu.regrid.sparse import WeightedMatrix

__all__ = ["BDTMatrix", "bdt_from_weighted", "apply_bdt", "apply_bdt_T",
           "tiles_dest_small_unscaled", "tiles_dest_ice_unscaled"]

TILE_R = 8      # small-space rows per tile (sublane)
TILE_C = 128    # ice cols per tile (lane)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BDTMatrix:
    """Canonical (small x ice) block-dense-tile matrix on device.

    ``scat_onehot``/``scat_base`` (optional) replace the dest-small windowed
    scatter-add with a *banded one-hot matmul*: TPU scatter runs at ~1.5 G
    elem/s (83% of apply time, measured), but the scatter pattern is fixed
    at build time, so tiles are chunked along the block order (spatially
    local, so each chunk's windows span a narrow band of the small space)
    and a bf16 one-hot (nchunk, band, chunk) matrix turns the scatter into
    an MXU contraction plus a tiny per-chunk banded add.
    """

    tiles: jnp.ndarray       # (nblk, T, 8, 128) f32
    row_start: jnp.ndarray   # (nblk, T) int32 (0 where tile is empty/padding)
    ov_rows: Optional[jnp.ndarray]   # overflow COO (sorted by row) or None
    ov_cols: Optional[jnp.ndarray]
    ov_vals: Optional[jnp.ndarray]
    wS: jnp.ndarray          # (nsmall,) small-space sums (row sums of M_SI)
    wI: jnp.ndarray          # (nice,)  ice-space sums  (col sums of M_SI)
    scat_onehot: Optional[jnp.ndarray]  # (nchunk, band, chunk) f32 or None
    scat_base: Optional[jnp.ndarray]    # (nchunk,) int32 first small row
    #: tiles in WIDE chunks (e.g. polar blocks whose windows span too broad
    #: a band): flat tile indices + their row starts, handled by a small
    #: scatter-add instead of the band matmul
    scat_wide_idx: Optional[jnp.ndarray]
    scat_wide_rs: Optional[jnp.ndarray]
    nsmall: int
    nice: int                # true (unpadded) ice extent
    transposed: bool         # True if the logical matrix is (ice x small)

    def tree_flatten(self):
        return ((self.tiles, self.row_start, self.ov_rows, self.ov_cols,
                 self.ov_vals, self.wS, self.wI, self.scat_onehot,
                 self.scat_base, self.scat_wide_idx, self.scat_wide_rs),
                (self.nsmall, self.nice, self.transposed))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, *aux)

    @property
    def logical_shape(self):
        return ((self.nice, self.nsmall) if self.transposed
                else (self.nsmall, self.nice))

    @property
    def wM(self):
        """Dest weights of the LOGICAL matrix."""
        return self.wI if self.transposed else self.wS

    @property
    def Mw(self):
        return self.wS if self.transposed else self.wI


def bdt_from_weighted(M: WeightedMatrix, small_axis: str = "rows",
                      max_tiles_per_block: Optional[int] = None,
                      dtype=jnp.float32, to_device: bool = True) -> BDTMatrix:
    """Convert a WeightedMatrix to BDT.

    small_axis: which LOGICAL axis is the small space -- "rows" (EvI/AvI
    style) or "cols" (IvE/IvA style; stored transposed).
    to_device=False keeps every array host-side numpy -- essential when the
    result is only an intermediate for another packer (the relay transfer
    of a T=max dense tile array costs minutes for a polar sheet).
    """
    if small_axis == "rows":
        s, i, v = M.rows, M.cols, M.vals
        nsmall, nice = M.shape
        transposed = False
        wS, wI = M.wM, M.Mw
    else:
        s, i, v = M.cols, M.rows, M.vals
        nice, nsmall = M.shape
        transposed = True
        wS, wI = M.Mw, M.wM

    nblk = max(1, -(-nice // TILE_C))
    blk = i // TILE_C
    lane = i % TILE_C

    # Aligned 8-row windows: window = row // 8.  Alignment costs at most ~2x
    # the minimal (greedy) window count but makes assignment a pure key sort
    # and keeps every dynamic sublane slice 8-aligned for Mosaic.
    wrow = s // TILE_R
    key = blk * (nsmall // TILE_R + 2) + wrow
    order = np.argsort(key, kind="stable")
    blk_s, s_s, lane_s, v_s, key_s = (blk[order], s[order], lane[order],
                                      v[order], key[order])
    head = np.ones(len(key_s), dtype=bool)
    head[1:] = key_s[1:] != key_s[:-1]
    win_id = np.cumsum(head) - 1
    n_win = int(win_id[-1]) + 1 if len(win_id) else 0
    win_blk = blk_s[head]
    win_start = (s_s[head] // TILE_R) * TILE_R

    # tiles per block, capped at T; excess windows spill to COO overflow.
    tiles_in_blk = np.zeros(nblk, dtype=np.int64)
    np.add.at(tiles_in_blk, win_blk, 1)
    if max_tiles_per_block is None:
        # Smallest T covering ~97% of blocks: tile padding is pure bandwidth
        # waste, and near a projection pole a few ice blocks touch DOZENS of
        # tiny A cells (T would explode 10x); those blocks' excess windows
        # ride the COO overflow path instead.
        if n_win:
            nz = tiles_in_blk[tiles_in_blk > 0]
            # p97 for regular heavy-but-even distributions, capped at 3x the
            # mean for pole-centered grids whose polar blocks have heavy
            # tails (they would pad every block's tiles 10x otherwise)
            T = int(max(1, min(np.quantile(nz, 0.97),
                               np.ceil(3.0 * nz.mean()))))
        else:
            T = 1
    else:
        T = max_tiles_per_block
    slot_of_win = np.concatenate([[0], np.cumsum(tiles_in_blk)[:-1]])
    win_slot = np.arange(n_win) - slot_of_win[win_blk]
    keep_win = win_slot < T

    keep_entry = keep_win[win_id]
    tiles = np.zeros((nblk, T, TILE_R, TILE_C), dtype=np.float64)
    row_start = np.zeros((nblk, T), dtype=np.int32)
    real = np.zeros((nblk, T), dtype=bool)
    e = keep_entry
    tiles[blk_s[e], win_slot[win_id[e]], s_s[e] % TILE_R, lane_s[e]] += v_s[e]
    row_start[win_blk[keep_win], win_slot[keep_win]] = win_start[keep_win]
    real[win_blk[keep_win], win_slot[keep_win]] = True
    # Empty tile slots are all-zero, so their window placement is arbitrary;
    # fill them from the nearest real neighbor so chunk BANDS (see
    # _build_scatter_band) stay narrow instead of stretching to row 0.
    flat_rs = row_start.reshape(-1)
    flat_real = real.reshape(-1)
    if flat_real.any() and not flat_real.all():
        idx = np.where(flat_real, np.arange(flat_rs.size), -1)
        idx = np.maximum.accumulate(idx)
        first = np.argmax(flat_real)
        idx = np.where(idx < 0, first, idx)
        flat_rs = flat_rs[idx]
        row_start = flat_rs.reshape(nblk, T).astype(np.int32)

    ovr = ovc = ovv = None
    if (~keep_entry).any():
        o = ~keep_entry
        rr, cc, vv = s_s[o], blk_s[o] * TILE_C + lane_s[o], v_s[o]
        oo = np.argsort(rr, kind="stable")
        xpi = jnp if to_device else np
        ovr = xpi.asarray(rr[oo], np.int32)
        ovc = xpi.asarray(cc[oo], np.int32)
        ovv = xpi.asarray(vv[oo], np.dtype(jnp.dtype(dtype).name))

    # The banded one-hot serves both directions: dest-small turns the window
    # SCATTER into a matmul, dest-ice its transpose turns the window GATHER
    # into a matmul (same fixed pattern either way).
    if to_device:
        onehot, base, wide_idx, wide_rs = _build_scatter_band(row_start,
                                                              int(nsmall))
        return BDTMatrix(
            tiles=jnp.asarray(tiles, dtype),
            row_start=jnp.asarray(row_start),
            ov_rows=ovr, ov_cols=ovc, ov_vals=ovv,
            wS=jnp.asarray(wS, dtype), wI=jnp.asarray(wI, dtype),
            scat_onehot=onehot, scat_base=base,
            scat_wide_idx=wide_idx, scat_wide_rs=wide_rs,
            nsmall=int(nsmall), nice=int(nice), transposed=transposed)
    npdtype = np.dtype(jnp.dtype(dtype).name)
    return BDTMatrix(
        tiles=tiles.astype(npdtype),
        row_start=row_start.astype(np.int32),
        ov_rows=ovr, ov_cols=ovc, ov_vals=ovv,
        wS=np.asarray(wS, npdtype), wI=np.asarray(wI, npdtype),
        scat_onehot=None, scat_base=None,
        scat_wide_idx=None, scat_wide_rs=None,
        nsmall=int(nsmall), nice=int(nice), transposed=transposed)


SCAT_CHUNK = 512        # tiles per scatter chunk
SCAT_MAX_BAND = 1024    # max window slots per chunk band (else scatter path)


def _build_scatter_band(row_start: np.ndarray, nsmall: int):
    """Banded one-hot replacing the dest-small scatter (see class docstring).

    Returns (onehot, base, wide_idx, wide_rs): the f32 band one-hot and
    chunk bases, plus the flat tile indices / row starts of tiles in WIDE
    chunks (scattered directly at apply time).  All-None when the band
    would not fit memory (apply falls back to the plain scatter-add).
    """
    rs = row_start.reshape(-1).astype(np.int64)
    N = rs.size
    C = SCAT_CHUNK
    nch = -(-N // C)
    rs_p = np.concatenate([rs, np.full(nch * C - N, rs[-1] if N else 0)])
    sl = (rs_p // TILE_R).reshape(nch, C)
    smin = sl.min(axis=1)
    spread = sl.max(axis=1) - smin + 1
    # Band width from the TYPICAL chunk; chunks wider than that (polar ice
    # blocks whose windows span many tiny A cells) fall back to a direct
    # scatter of just their tiles.
    W8 = int(-(-int(np.quantile(spread, 0.95)) // 8) * 8)
    W8 = min(max(W8, 8), SCAT_MAX_BAND)
    wide_ch = spread > W8
    if W8 * nch * C * 4 > 256 << 20:
        return None, None, None, None
    narrow = ~wide_ch
    onehot = np.zeros((nch, W8, C), dtype=np.float32)
    ch = np.repeat(np.arange(nch), C)
    off = (sl - smin[:, None]).reshape(-1)
    ok = narrow[ch] & (np.arange(nch * C) % C + ch * C < max(N, 1))         & (off < W8)
    onehot[ch[ok], off[ok], (np.arange(nch * C) % C)[ok]] = 1.0
    wide_idx = wide_rs = None
    if wide_ch.any():
        tid = np.nonzero(wide_ch[ch] & (np.arange(nch * C) < N))[0]
        wide_idx = jnp.asarray(tid.astype(np.int32))
        wide_rs = jnp.asarray(rs[tid].astype(np.int32))
    return (jnp.asarray(onehot),
            jnp.asarray((smin * TILE_R).astype(np.int32)),
            wide_idx, wide_rs)


def tiles_dest_small_unscaled(tiles, row_start, fi_blocks, nsmall: int,
                              scat_onehot=None, scat_base=None,
                              scat_wide_idx=None, scat_wide_rs=None):
    """Core dest-small contraction on raw arrays (shard_map-friendly: works
    on a LOCAL slice of the block axis; caller psums partials).

    tiles: (nblk, T, 8, 128); row_start: (nblk, T);
    fi_blocks: (nvar, nblk, 128) ice values (NaN-free).
    Returns (nvar, nsmall) unscaled integral sums.  With
    ``scat_onehot``/``scat_base`` the window scatter runs as a banded MXU
    contraction (measured 83% of apply time as a plain scatter).
    """
    nvar = fi_blocks.shape[0]
    prods = jnp.einsum("btrc,vbc->vbtr", tiles, fi_blocks,
                       preferred_element_type=tiles.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    if scat_onehot is None:
        win = row_start[:, :, None] + jnp.arange(TILE_R)[None, None, :]
        out = jnp.zeros((nvar, nsmall), tiles.dtype)
        return out.at[:, win.reshape(-1)].add(prods.reshape(nvar, -1),
                                              mode="drop")
    nch, W8, C = scat_onehot.shape
    N = prods.shape[1] * prods.shape[2]
    p2 = prods.transpose(1, 2, 3, 0).reshape(N, TILE_R * nvar)
    p2p = jnp.pad(p2, ((0, nch * C - N), (0, 0)))
    band = jnp.einsum("nwc,ncd->nwd", scat_onehot.astype(tiles.dtype),
                      p2p.reshape(nch, C, TILE_R * nvar),
                      preferred_element_type=tiles.dtype,
                      precision=jax.lax.Precision.HIGHEST)
    band = band.reshape(nch, W8, TILE_R, nvar)
    ids = (scat_base[:, None] + jnp.arange(W8 * TILE_R)[None, :]
           ).reshape(-1)                      # (nch*W8*8,) absolute rows
    vals = band.reshape(nch, W8 * TILE_R, nvar).reshape(-1, nvar).T
    out = jnp.zeros((nvar, nsmall), tiles.dtype)
    out = out.at[:, ids].add(vals, mode="drop")
    if scat_wide_idx is not None:
        # polar/wide chunks: direct scatter of just their tiles
        pw = jnp.take(p2, scat_wide_idx, axis=0)        # (K, 8*nvar)
        wid = (scat_wide_rs[:, None] + jnp.arange(TILE_R)[None, :]
               ).reshape(-1)
        wvals = pw.reshape(-1, TILE_R, nvar).reshape(-1, nvar).T
        out = out.at[:, wid].add(wvals, mode="drop")
    return out


def tiles_dest_ice_unscaled(tiles, row_start, fsmall,
                            scat_onehot=None, scat_base=None,
                            scat_wide_idx=None, scat_wide_rs=None):
    """Core dest-ice contraction on raw arrays.

    fsmall: (nvar, nsmall) small-space values (NaN-free, replicated in the
    sharded case).  Returns (nvar, nblk*128) unscaled sums.  With
    ``scat_onehot``/``scat_base`` the per-tile window gather becomes a
    banded matmul against contiguous small-space slices (TPU gather is the
    bottleneck otherwise).
    """
    nvar = fsmall.shape[0]
    nblk, T = row_start.shape
    if scat_onehot is None:
        win = row_start[:, :, None] + jnp.arange(TILE_R)[None, None, :]
        fwin = jnp.take(fsmall, win.reshape(-1), axis=1).reshape(
            nvar, nblk, T, TILE_R)
    else:
        nch, W8, C = scat_onehot.shape
        N = nblk * T
        nsmall = fsmall.shape[1]
        # contiguous per-chunk bands of the small space: (nch, W8*8, nvar)
        pad = jnp.pad(fsmall, ((0, 0), (0, W8 * TILE_R)))
        idx = (scat_base[:, None] + jnp.arange(W8 * TILE_R)[None, :])
        # nch is small (tiles/512): this gather is nch*W8*8*nvar elems, 100x
        # fewer than the per-tile windows
        band = jnp.take(pad, idx.reshape(-1), axis=1).reshape(
            nvar, nch, W8, TILE_R)
        fwin = jnp.einsum("nwc,vnwr->vncr", scat_onehot.astype(fsmall.dtype),
                          band, preferred_element_type=fsmall.dtype,
                          precision=jax.lax.Precision.HIGHEST)
        fwin = fwin.reshape(nvar, nch * C, TILE_R)[:, :N, :]
        if scat_wide_idx is not None:
            # wide chunks got zero from the band; gather their windows
            wwin = (scat_wide_rs[:, None]
                    + jnp.arange(TILE_R)[None, :]).reshape(-1)
            got = jnp.take(fsmall, jnp.clip(wwin, 0, nsmall - 1),
                           axis=1).reshape(nvar, -1, TILE_R)
            fwin = fwin.at[:, scat_wide_idx, :].set(got)
        fwin = fwin.reshape(nvar, nblk, T, TILE_R)
    out = jnp.einsum("btrc,vbtr->vbc", tiles, fwin,
                     preferred_element_type=tiles.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(nvar, nblk * TILE_C)


@functools.partial(jax.jit, static_argnames=("scale",))
def apply_bdt_T(bm: BDTMatrix, f, scale: bool = True,
                var_factor=None, var_offset=None, fill=jnp.nan):
    """Apply the TRANSPOSE of bm's logical matrix.

    The unscaled A/E<->I matrices are exact transposes of each other (both
    store the overlap-area integral entries o_x*h_x), so ONE BDT tile set
    serves both directions: ``apply_bdt`` for the stored orientation,
    ``apply_bdt_T`` for the reverse -- halving matrix memory and stream
    bytes in the coupling round trip.  Weights swap roles: the transpose's
    dest weights are ``Mw`` of the stored matrix.
    """
    flipped = dataclasses.replace(bm, transposed=not bm.transposed)
    return apply_bdt(flipped, f, scale=scale, var_factor=var_factor,
                     var_offset=var_offset, fill=fill)


@functools.partial(jax.jit, static_argnames=("scale",))
def apply_bdt(bm: BDTMatrix, f, scale: bool = True,
              var_factor: Optional[jnp.ndarray] = None,
              var_offset: Optional[jnp.ndarray] = None,
              fill=jnp.nan):
    """Apply the LOGICAL matrix to f ((ncol,) or (nvar, ncol)); XLA path.

    dest-small: tile matmuls against contiguous ice blocks, then a small
    windowed scatter-add into the small space.  dest-ice: small windowed
    gather, tile matmuls, contiguous ice-block writes.  Either way the ice
    space is touched only in 128-lane streams.
    """
    single = f.ndim == 1
    fv = (f[None, :] if single else f).astype(bm.tiles.dtype)
    # Dense tiles multiply explicit zeros against arbitrary source entries,
    # so non-finite source values (masked cells) must be zeroed first --
    # 0 * NaN would otherwise contaminate neighbors.  Same convention as the
    # coupler: NaN source means 'no contribution'.
    fv = jnp.where(jnp.isfinite(fv), fv, 0.0)
    nvar = fv.shape[0]
    nblk, T = bm.row_start.shape
    npad = nblk * TILE_C

    if not bm.transposed:
        # dest = small, src = ice
        fi = jnp.pad(fv, ((0, 0), (0, npad - bm.nice))).reshape(nvar, nblk,
                                                                TILE_C)
        out = tiles_dest_small_unscaled(bm.tiles, bm.row_start, fi,
                                        bm.nsmall, bm.scat_onehot,
                                        bm.scat_base, bm.scat_wide_idx,
                                        bm.scat_wide_rs)
        if bm.ov_rows is not None:
            g = jnp.take(fv, bm.ov_cols, axis=1) * bm.ov_vals[None, :]
            out = out + jax.vmap(lambda c: jax.ops.segment_sum(
                c, bm.ov_rows, num_segments=bm.nsmall,
                indices_are_sorted=True))(g)
    else:
        # dest = ice, src = small
        out = tiles_dest_ice_unscaled(bm.tiles, bm.row_start, fv,
                                      bm.scat_onehot, bm.scat_base,
                                      bm.scat_wide_idx,
                                      bm.scat_wide_rs)[:, :bm.nice]
        if bm.ov_rows is not None:
            # overflow stored as (small row, ice col): here dest is ice col.
            g = jnp.take(fv, bm.ov_rows, axis=1) * bm.ov_vals[None, :]
            out = out + jax.vmap(lambda c: jax.ops.segment_sum(
                c, bm.ov_cols, num_segments=bm.nice))(g)

    if scale:
        w = bm.wM
        safe = jnp.where(w != 0, w, 1.0)
        out = jnp.where(w[None, :] != 0, out / safe, fill)
    if var_factor is not None:
        out = out * var_factor[:, None]
    if var_offset is not None:
        out = out + var_offset[:, None]
    return out[0] if single else out