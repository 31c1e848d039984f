"""Distributed BDT SpMM on the device mesh with the fused Pallas kernels.

The ice axis (columns of the canonical small x ice matrix) is partitioned
into contiguous block ranges, one per device; the small (A/E) space is
replicated. Each device owns an independent ``PallasBDT`` over its column
range, padded to COMMON static geometry so the shard_map body is a single
program:

* dest-small (EvI): every device runs its local tile stream + band scatter
  to produce a PARTIAL E3; ONE ``psum`` over the mesh reduces the partials
  (the reference's gather-to-root replaced by a reduction -- SURVEY.md
  §2.11, §5.8); scaling by the GLOBAL dest weights happens after the psum.
* dest-ice (IvE): E3 is replicated, so the gather + contraction is purely
  LOCAL -- zero communication.

Weights: wS (small-space sums) must be GLOBAL row sums, not per-shard
partials, so the builder overrides each shard's ``winvS_e3``/``wS`` with
the full-matrix values; wI is exact per shard (ice columns partition).

Reference parity: the root-gathered serial matrix algebra of
``GCMCoupler::couple`` [U] becomes a mesh-wide reduction; see
``parallel.coupled`` for the full coupled step (XLA engine) and
SURVEY.md §7 stage 6.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from icebin_tpu.ops.bdt import TILE_C, TILE_R
from icebin_tpu.ops.pallas_bdt import (PallasBDT, apply_ice_blocked,
                                       apply_small_blocked,
                                       pallas_from_weighted)
from icebin_tpu.parallel.mesh import ICE_AXIS
from icebin_tpu.regrid.sparse import WeightedMatrix

__all__ = ["ShardedPallasBDT", "sharded_pallas_from_weighted",
           "make_sharded_apply_small", "make_sharded_apply_ice",
           "ShardedPallasView", "sharded_view_pair"]


@dataclasses.dataclass
class ShardedPallasBDT:
    """Per-device PallasBDT arrays stacked on a leading shard axis.

    ``template`` carries the COMMON static geometry (every shard padded to
    the max npspad/nchunk/W8 and the global NWpad); ``stacked`` maps each
    PallasBDT array field to its (n_shards, ...) stack, device-put with the
    shard axis on the mesh's ice axis.
    """

    stacked: dict
    template: PallasBDT          # statics + global weights (arrays unused)
    n_shards: int
    blk_ranges: list             # [(blk0, blk1)) true-block range per shard
    #: ice cells per shard (= blk-range width * 128 for block-aligned
    #: partitions; an arbitrary value for RAGGED lattice-row partitions,
    #: where each shard's cells pad LOCALLY to whole 128-blocks)
    cells_per_shard: int = 0

    def __post_init__(self):
        if not self.cells_per_shard:
            self.cells_per_shard = (self.blk_ranges[0][1]
                                    - self.blk_ranges[0][0]) * TILE_C

    def local(self, arrs: dict) -> PallasBDT:
        """Rebuild the local PallasBDT inside a shard_map body."""
        t = self.template
        kw = {name: (arrs[name][0] if arrs.get(name) is not None else None)
              for name in PallasBDT._ARRAYS}
        return dataclasses.replace(t, **kw)

    def ice_to_blocked_global(self, f, nice: int):
        """(NV, nice) global ice field → (n*nblkpad, NV, 128) shard-blocked.

        Each shard's rows are its local blocked field (contiguous
        equal-width cell ranges, padded per shard to nblkpad blocks).
        """
        t = self.template
        cps = self.cells_per_shard
        f = jnp.where(jnp.isfinite(f), f, 0.0).astype(jnp.float32)
        full = self.n_shards * cps
        f = jnp.pad(f, ((0, 0), (0, full - nice)))
        f3 = f.reshape(t.NV, self.n_shards, cps)
        f3 = jnp.pad(f3, ((0, 0), (0, 0), (0, t.nblkpad * TILE_C - cps)))
        f4 = f3.reshape(t.NV, self.n_shards, t.nblkpad, TILE_C)
        return f4.transpose(1, 2, 0, 3).reshape(-1, t.NV, TILE_C)

    def ice_to_blocked_host(self, f: np.ndarray, nice: int) -> np.ndarray:
        """Numpy twin of ``ice_to_blocked_global`` (multi-host path: each
        process slices rows [d0*nblkpad, d1*nblkpad) of the result for its
        addressable devices and wraps them via ``distributed.global_field``).
        """
        t = self.template
        cps = self.cells_per_shard
        f = np.where(np.isfinite(f), f, 0.0).astype(np.float32)
        full = self.n_shards * cps
        f = np.pad(f, ((0, 0), (0, full - nice)))
        f3 = f.reshape(t.NV, self.n_shards, cps)
        f3 = np.pad(f3, ((0, 0), (0, 0), (0, t.nblkpad * TILE_C - cps)))
        f4 = f3.reshape(t.NV, self.n_shards, t.nblkpad, TILE_C)
        return np.ascontiguousarray(
            f4.transpose(1, 2, 0, 3).reshape(-1, t.NV, TILE_C))

    def blocked_global_to_ice(self, fb, nice: int):
        """(n*nblkpad, NV, 128) shard-blocked → (NV, nice) global field."""
        t = self.template
        cps = self.cells_per_shard
        f4 = fb.reshape(self.n_shards, t.nblkpad, t.NV, TILE_C)
        f4 = f4.transpose(0, 2, 1, 3).reshape(self.n_shards, t.NV, -1)
        f4 = f4[:, :, :cps].transpose(1, 0, 2)
        return f4.reshape(t.NV, -1)[:, :nice]


def _pad_to(a, n, axis=0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(np.asarray(a), pad)


def sharded_pallas_from_weighted(mesh, M: WeightedMatrix,
                                 small_axis: str = "rows", nv: int = 8,
                                 ts: Optional[int] = None,
                                 cells_per_shard: Optional[int] = None
                                 ) -> ShardedPallasBDT:
    """Partition the ice axis into per-device column ranges and build one
    padded PallasBDT per device.

    ``cells_per_shard`` overrides the default block-aligned equal split
    with an ARBITRARY contiguous cell range per device (the RAGGED lattice
    decomposition: shard d owns cells [d*cps, (d+1)*cps) of the -- possibly
    row-padded -- lattice flat space; each shard's local column space pads
    independently to whole 128-blocks, so no global alignment is needed).
    Reference: PETSc DA handles ragged decompositions transparently [U];
    SURVEY.md section 5.7.
    """
    from icebin_tpu.ops.pallas_bdt import _ensure_tuned
    _ensure_tuned()   # install device tunables BEFORE reading them below
    from icebin_tpu.ops.pallas_bdt import E_SEC, SEC_BLOCKS, TS
    ts = ts or TS
    n = int(mesh.devices.size)
    if small_axis == "rows":
        s, i, v = M.rows, M.cols, M.vals
        nsmall, nice = M.shape
    else:
        s, i, v = M.cols, M.rows, M.vals
        nice, nsmall = M.shape
    if cells_per_shard is None:
        # pad the block count to a device multiple (trailing shards may own
        # fewer — or zero — true columns; their tiles are all-zero padding)
        nblk = -(-(-(-nice // TILE_C)) // n) * n
        cells_per_shard = (nblk // n) * TILE_C
    cps = int(cells_per_shard)
    bpd = -(-cps // TILE_C)

    # the shard_map body is ONE program over COMMON statics, so every shard
    # must pack as a single E-section call: widen e_sec to cover the whole
    # E space.  The per-call VMEM bound depends on the shard's (small)
    # field-section size, so mesh shards afford MUCH wider single sections
    # than the single-device default -- budget it explicitly (the per-esec
    # call machinery would need per-shard group tables, which the
    # common-statics stacking cannot express).
    from icebin_tpu.ops.pallas_bdt import PS_CHUNK
    NW = -(-int(nsmall) // TILE_R)
    # rows the kernels actually keep VMEM-resident (NWpad derives from NW;
    # the inflated bucket size max(E_SEC, ...) below is only the packer's
    # section width and must NOT drive the budget check)
    nw_width = -(-NW // TILE_R) * TILE_R
    e_sec = max(E_SEC, nw_width)
    sec_cap = min(SEC_BLOCKS, -(-bpd // 8) * 8)
    from icebin_tpu.ops.pallas_bdt import VMEM_LIMIT
    budget = VMEM_LIMIT - 2**20                  # scoped VMEM, margin
    tiles_db = 2 * PS_CHUNK * (ts or TS) * TILE_R * TILE_C * 4
    field_db = 2 * sec_cap * nv * TILE_C * 4
    from icebin_tpu.ops.pallas_bdt import ICE_BATCHED
    scratch = PS_CHUNK * (ts or TS) * TILE_R * nv * 4 + 2**18
    if ICE_BATCHED:     # the batched-product scratch (PSC, NV, TILE_C)
        scratch += PS_CHUNK * nv * TILE_C * 4
    e_sec_max = (budget - tiles_db - field_db - scratch) \
        // (2 * TILE_R * nv * 4)                 # E3 out + winvS_e3 rows
    if nw_width > e_sec_max:
        raise NotImplementedError(
            f"mesh E space of {nsmall} rows ({NW} windows) exceeds the "
            f"single-call VMEM budget ({e_sec_max} windows at this shard "
            "geometry); split the small space across sheets for mesh runs")

    # global small-space weights (per-shard builds see only partial sums)
    wS_glob = np.bincount(s, weights=v, minlength=nsmall)

    shards = []
    blk_ranges = []
    for d in range(n):
        c0 = min(d * cps, nice)
        c1 = min((d + 1) * cps, nice)
        blk_ranges.append((d * bpd, (d + 1) * bpd))
        sel = (i >= c0) & (i < c1)
        Msub = WeightedMatrix(rows=s[sel], cols=i[sel] - c0, vals=v[sel],
                              shape=(nsmall, cps))
        # COMMON section scheme across shards (equal cell ranges), so the
        # stacked sec_idx/sec_flags agree with the template statics
        shards.append(pallas_from_weighted(
            Msub, small_axis="rows", nv=nv, ts=ts,
            sec_blocks=min(SEC_BLOCKS, -(-bpd // 8) * 8), e_sec=e_sec))

    # pad every shard to common statics
    from icebin_tpu.ops.pallas_bdt import CH_GROUP
    npspad = max(p.npspad for p in shards)
    npspad = -(-npspad // 128) * 128
    nchunk = npspad // 128
    G = min(CH_GROUP, nchunk)
    nchunkpad = -(-nchunk // G) * G
    W8 = max(p.W8 for p in shards)
    # every shard's bands must fit the COMMON W8 under the common NWpad
    NWpad = max(max(p.NWpad for p in shards),
                max(int(np.asarray(p.base).max(initial=0)) + W8
                    for p in shards))
    NWpad = -(-NWpad // TILE_R) * TILE_R
    nblkpad = max(p.nblkpad for p in shards)
    C2 = 128 * ts

    wvs = np.zeros(NWpad * TILE_R)
    winvS = np.where(wS_glob != 0,
                     1.0 / np.where(wS_glob != 0, wS_glob, 1.0), 0.0)
    wvs[:nsmall] = winvS
    winvS_e3 = np.repeat(wvs.reshape(NWpad, TILE_R), nv,
                         axis=1).astype(np.float32)

    from icebin_tpu.ops.pallas_bdt import PS_CHUNK
    stacks = {name: [] for name in PallasBDT._ARRAYS}
    for p in shards:
        stacks["tiles2"].append(_pad_to(p.tiles2, npspad))
        p2b = _pad_to(p.pseudo2blk, npspad)
        p2b[p.npspad:] = nblkpad - 1
        stacks["pseudo2blk"].append(p2b)
        # per-CHUNK section metadata, REBUILT at the COMMON npspad from the
        # padded p2b (a shard padded into extra trash sections needs fresh
        # step boundaries; section starts are PS_CHUNK-aligned so common
        # chunks never straddle).  Semantics match the pack: zero-init on
        # first chunk of each section, scale on its last (trash chunks add
        # exact zeros).
        si = (p2b[::PS_CHUNK] // p.sec_blocks).astype(np.int32)
        fl = np.zeros(len(si), np.int32)
        edge = si[1:] != si[:-1]
        firsts = np.ones(len(si), bool)
        firsts[1:] = edge
        lasts = np.ones(len(si), bool)
        lasts[:-1] = edge
        fl[firsts] |= 1
        fl[lasts] |= 2
        stacks["sec_idx"].append(si)
        stacks["sec_flags"].append(fl)
        w_off = np.full((nchunkpad * TILE_R, C2), -1, np.int32)
        w_off[:p.nchunk * TILE_R] = np.asarray(p.w_off)[:p.nchunk * TILE_R]
        stacks["w_off"].append(w_off)
        w_offT = np.full((nchunkpad * C2, 1), -1, np.int32)
        w_offT[:p.nchunk * C2] = np.asarray(p.w_offT)[:p.nchunk * C2]
        stacks["w_offT"].append(w_offT)
        stacks["base"].append(_pad_to(np.asarray(p.base)[:p.nchunk],
                                      nchunkpad))
        stacks["winvS_e3"].append(winvS_e3)        # GLOBAL weights
        stacks["winvI_blk"].append(_pad_to(p.winvI_blk, nblkpad))
        wvs_g = np.zeros(nsmall, np.float32)
        wvs_g[:] = wS_glob
        stacks["wS"].append(wvs_g)
        stacks["wI"].append(_pad_to(p.wI, nblkpad * TILE_C))
        # per-shard COO overflow (pole-centered sheets where windows exceed
        # the W8 band cap): pad to a COMMON length across shards -- padding
        # entries have value 0 at (row 0, col 0), exact no-ops in both apply
        # directions (VERDICT r1 item #6: no polar hard-raise)
        novmax = max((0 if q.ov_s is None else len(q.ov_s)) for q in shards)
        if novmax:
            nov = 0 if p.ov_s is None else len(p.ov_s)
            z32 = np.zeros(novmax - nov, np.int32)
            stacks["ov_s"].append(np.concatenate(
                [np.asarray(p.ov_s, np.int32) if nov else z32[:0], z32]))
            stacks["ov_c"].append(np.concatenate(
                [np.asarray(p.ov_c, np.int32) if nov else z32[:0], z32]))
            stacks["ov_v"].append(np.concatenate(
                [np.asarray(p.ov_v, np.float32) if nov else z32[:0],
                 np.zeros(novmax - nov, np.float32)]))
        else:
            for name in ("ov_s", "ov_c", "ov_v"):
                stacks[name].append(None)

    assert all(p.nesec == 1 for p in shards)     # e_sec covers NW above
    assert all(p.w_fwd is None for p in shards)  # no bucket compaction
    template = dataclasses.replace(
        shards[0],
        **{name: None for name in PallasBDT._ARRAYS},
        npspad=npspad, nchunk=nchunk, nchunkpad=nchunkpad, W8=W8,
        NWpad=NWpad, nblkpad=nblkpad, nice=nblkpad * TILE_C,
        # common single-group table at the COMMON chunk count / section
        # range (each shard's own egroups described its pre-pad layout)
        nesec=1,
        egroups=((0, nchunk, 0, 0, nblkpad // shards[0].sec_blocks),))
    sh = NamedSharding(mesh, P(ICE_AXIS))
    stacked = {}
    for name, parts in stacks.items():
        if not parts or parts[0] is None:
            stacked[name] = None
        else:
            # make_array_from_callback materializes only the shards THIS
            # process addresses — the multi-host-safe device_put (every
            # process builds the same full host stack deterministically,
            # replacing an MPI broadcast; SURVEY.md §5.8)
            stack = np.stack(parts)
            stacked[name] = jax.make_array_from_callback(
                stack.shape, sh, lambda idx, a=stack: a[idx])
    return ShardedPallasBDT(stacked=stacked, template=template,
                            cells_per_shard=cps,
                            n_shards=n, blk_ranges=blk_ranges)


def _arr_specs(spm: ShardedPallasBDT):
    return {name: (P(ICE_AXIS) if spm.stacked[name] is not None else None)
            for name in PallasBDT._ARRAYS}


def _statics_of(t: PallasBDT) -> tuple:
    return tuple(getattr(t, n) for n in PallasBDT._STATIC)


def _template_from_statics(statics: tuple) -> PallasBDT:
    return PallasBDT(*([None] * len(PallasBDT._ARRAYS)), *statics)


# Compiled shard_map cores cached on (mesh, static geometry): matrix
# REGENERATION swaps array values but usually keeps the padded geometry, so
# the coupling loop's regen cadence must not retrace/recompile (VERDICT
# round-1 weakness #4: regen cost).
@functools.lru_cache(maxsize=None)
def _core_apply_small(mesh, statics, arr_names, interpret, passes=None):
    t = _template_from_statics(statics)

    def body(fb, *arrs):
        pm = dataclasses.replace(
            t, **{n: a[0] for n, a in zip(arr_names, arrs)})
        part = apply_small_blocked(pm, fb, scale=False, interpret=interpret,
                                   passes=passes)
        e3 = jax.lax.psum(part, ICE_AXIS)
        return e3 * pm.winvS_e3

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(ICE_AXIS),) * (1 + len(arr_names)),
                   out_specs=P(),
                   check_vma=False)
    return jax.jit(sm)


@functools.lru_cache(maxsize=None)
def _core_apply_ice(mesh, statics, arr_names, interpret):
    t = _template_from_statics(statics)

    def body(e3, *arrs):
        pm = dataclasses.replace(
            t, **{n: a[0] for n, a in zip(arr_names, arrs)})
        return apply_ice_blocked(pm, e3, scale=True, interpret=interpret)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(),) + (P(ICE_AXIS),) * len(arr_names),
                   out_specs=P(ICE_AXIS),
                   check_vma=False)
    return jax.jit(sm)


def make_sharded_apply_small(mesh, spm: ShardedPallasBDT,
                             interpret: Optional[bool] = None,
                             passes: Optional[int] = None):
    """fn(fb_sharded (n*nblkpad, NV, 128)) → scaled E3 (replicated).

    Local Pallas tile stream + band scatter per device, ONE psum of the E3
    partials over the mesh, then the GLOBAL weight scale.
    """
    arr_names = tuple(n for n in PallasBDT._ARRAYS
                      if spm.stacked[n] is not None)
    jitted = _core_apply_small(mesh, _statics_of(spm.template), arr_names,
                               interpret, passes)
    # matrix arrays ride as ARGUMENTS, not closure constants: multi-host
    # jit forbids closing over arrays that span non-addressable devices
    return lambda fb: jitted(fb, *[spm.stacked[n] for n in arr_names])


def make_sharded_apply_ice(mesh, spm: ShardedPallasBDT,
                           interpret: Optional[bool] = None):
    """fn(e3 replicated) → blocked ice (n*nblkpad, NV, 128) sharded.

    Purely local per device (E replicated): zero communication.
    """
    arr_names = tuple(n for n in PallasBDT._ARRAYS
                      if spm.stacked[n] is not None)
    jitted = _core_apply_ice(mesh, _statics_of(spm.template), arr_names,
                             interpret)
    return lambda e3: jitted(e3, *[spm.stacked[n] for n in arr_names])


class ShardedPallasView:
    """A logical matrix direction over a ShardedPallasBDT -- the mesh twin
    of ``ops.pallas_bdt.PallasView``, drop-in for the coupler's apply
    dispatch (``coupler.coupler._apply_any``): same ``wM``/``Mw``/``apply``
    surface, but the tile streams run per-device inside shard_map with ONE
    psum of E3 partials (dest-small) or zero communication (dest-ice).
    """

    def __init__(self, mesh, spm: ShardedPallasBDT, transposed: bool,
                 nice: int, wS64: np.ndarray, wI64: np.ndarray,
                 interpret: Optional[bool] = None,
                 passes: Optional[int] = None):
        self.mesh = mesh
        self.spm = spm
        self.transposed = transposed
        self.nice = nice
        self._wS64 = wS64
        self._wI64 = wI64
        self._passes = passes
        self._fn_small = make_sharded_apply_small(mesh, spm, interpret,
                                                  passes)
        self._fn_ice = make_sharded_apply_ice(mesh, spm, interpret)

    @property
    def wM(self):
        return self._wI64 if self.transposed else self._wS64

    @property
    def Mw(self):
        return self._wS64 if self.transposed else self._wI64

    @property
    def logical_shape(self):
        t = self.spm.template
        return ((self.nice, t.nsmall) if self.transposed
                else (t.nsmall, self.nice))

    def apply_coupler(self, f, scale: bool = True, var_factor=None,
                      var_offset=None, fill=jnp.nan,
                      passes: Optional[int] = None):
        """apply_bdt/apply_view-compatible apply over the mesh.

        ``passes`` must match the view's construction-time accuracy mode
        (the mesh engine bakes it into the cached shard_map core; the
        coupler passes one cfg-constant value, so this only guards against
        mixed use)."""
        if not scale:
            raise NotImplementedError("sharded coupler applies are scaled")
        if passes is not None and passes != self._passes:
            raise ValueError(
                f"mesh view built with passes={self._passes}; per-call "
                f"passes={passes} not supported — set CouplerConfig."
                "prods_passes before construction")
        t = self.spm.template
        single = f.ndim == 1
        fv = f[None, :] if single else f
        nv_in = fv.shape[0]
        if nv_in > t.NV:
            # contract tables beyond the pack's NV batch through the mesh
            # kernels in NV-sized groups (round-4 output contract = 10)
            parts = [self.apply_coupler(fv[k:k + t.NV], scale=scale,
                                        var_factor=None if var_factor is None
                                        else var_factor[k:k + t.NV],
                                        var_offset=None if var_offset is None
                                        else var_offset[k:k + t.NV],
                                        fill=fill, passes=passes)
                     for k in range(0, nv_in, t.NV)]
            return jnp.concatenate(parts, axis=0)
        if nv_in < t.NV:
            fv = jnp.pad(fv, ((0, t.NV - nv_in), (0, 0)))
        if self.transposed:                      # dest-ice (IvE/IvA)
            e3 = t.small_to_e3(fv)
            fb = self._fn_ice(e3)
            out = self.spm.blocked_global_to_ice(fb, self.nice)
        else:                                    # dest-small (EvI/AvI)
            fb = self.spm.ice_to_blocked_global(fv, self.nice)
            e3 = self._fn_small(fb)
            out = t.e3_to_small(e3)
        out = out[:nv_in]
        out = jnp.where(jnp.asarray(self.wM != 0)[None, :], out, fill)
        if var_factor is not None:
            out = out * var_factor[:, None]
        if var_offset is not None:
            out = out + var_offset[:, None]
        return out[0] if single else out


class ArgShardedView(ShardedPallasView):
    """A ShardedPallasView whose matrix arrays ride as TRACED ARGUMENTS
    instead of closure constants -- the building block for jitting a whole
    coupling window over the mesh (``coupler.sharded.MeshIceSheetCoupler.
    couple_window``): regeneration swaps array VALUES under an unchanged
    trace, and the jitted window never bakes stale weights.

    ``spm_lite`` carries only statics/blk_ranges (helpers need no arrays);
    ``arrs`` are the stacked matrix arrays in ``arr_names`` order.
    """

    def __init__(self, mesh, spm_lite: ShardedPallasBDT, arr_names, arrs,
                 transposed: bool, nice: int, wS, wI,
                 interpret: Optional[bool] = None,
                 passes: Optional[int] = None):
        self.mesh = mesh
        self.spm = spm_lite
        self.transposed = transposed
        self.nice = nice
        self._wS64 = wS
        self._wI64 = wI
        self._passes = passes
        statics = _statics_of(spm_lite.template)
        fs = _core_apply_small(mesh, statics, arr_names, interpret, passes)
        fi = _core_apply_ice(mesh, statics, arr_names, interpret)
        self._fn_small = lambda fb: fs(fb, *arrs)
        self._fn_ice = lambda e3: fi(e3, *arrs)


def sharded_view_pair(mesh, M: WeightedMatrix, small_axis: str = "rows",
                      nv: int = 8, ts: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      passes: Optional[int] = None,
                      cells_per_shard: Optional[int] = None,
                      nice_pad: Optional[int] = None):
    """(forward_view, reverse_view) sharing one sharded tile set -- the
    mesh twin of ``ops.pallas_bdt.pallas_view_pair``.  Weights are exact
    f64 host sums (the coupler's ledger/repair measure).

    ``cells_per_shard``/``nice_pad`` select a RAGGED lattice decomposition:
    views then speak the row-PADDED lattice flat space (nice_pad cells;
    weights zero on pad cells, so they never carry mass)."""
    spm = sharded_pallas_from_weighted(mesh, M, small_axis=small_axis,
                                       nv=nv, ts=ts,
                                       cells_per_shard=cells_per_shard)
    if small_axis == "rows":
        s, i = M.rows, M.cols
        nsmall, nice = M.shape
    else:
        s, i = M.cols, M.rows
        nice, nsmall = M.shape
    nice_out = nice_pad or nice
    wS64 = np.bincount(s, weights=M.vals, minlength=nsmall)
    wI64 = np.bincount(i, weights=M.vals, minlength=nice_out)
    fwd = ShardedPallasView(mesh, spm, transposed=(small_axis == "cols"),
                            nice=nice_out, wS64=wS64, wI64=wI64,
                            interpret=interpret, passes=passes)
    rev = ShardedPallasView(mesh, spm, transposed=not fwd.transposed,
                            nice=nice_out, wS64=wS64, wI64=wI64,
                            interpret=interpret, passes=passes)
    return fwd, rev
