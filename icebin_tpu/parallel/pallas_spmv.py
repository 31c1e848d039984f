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
           "make_sharded_apply_small", "make_sharded_apply_ice"]


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

    def local(self, arrs: dict) -> PallasBDT:
        """Rebuild the local PallasBDT inside a shard_map body."""
        t = self.template
        kw = {name: (arrs[name][0] if arrs.get(name) is not None else None)
              for name in PallasBDT._ARRAYS}
        return dataclasses.replace(t, **kw)

    def ice_to_blocked_global(self, f, nice: int):
        """(NV, nice) global ice field → (n*nblkpad, NV, 128) shard-blocked.

        Each shard's rows are its local blocked field (contiguous
        equal-width column ranges, padded per shard to nblkpad blocks).
        """
        t = self.template
        f = jnp.where(jnp.isfinite(f), f, 0.0).astype(jnp.float32)
        bpd = self.blk_ranges[0][1] - self.blk_ranges[0][0]
        full = self.n_shards * bpd * TILE_C
        f = jnp.pad(f, ((0, 0), (0, full - nice)))
        f4 = f.reshape(t.NV, self.n_shards, bpd, TILE_C)
        pad = t.nblkpad - bpd
        f4 = jnp.pad(f4, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return f4.transpose(1, 2, 0, 3).reshape(-1, t.NV, TILE_C)

    def ice_to_blocked_host(self, f: np.ndarray, nice: int) -> np.ndarray:
        """Numpy twin of ``ice_to_blocked_global`` (multi-host path: each
        process slices rows [d0*nblkpad, d1*nblkpad) of the result for its
        addressable devices and wraps them via ``distributed.global_field``).
        """
        t = self.template
        f = np.where(np.isfinite(f), f, 0.0).astype(np.float32)
        bpd = self.blk_ranges[0][1] - self.blk_ranges[0][0]
        full = self.n_shards * bpd * TILE_C
        f = np.pad(f, ((0, 0), (0, full - nice)))
        f4 = f.reshape(t.NV, self.n_shards, bpd, TILE_C)
        f4 = np.pad(f4, ((0, 0), (0, 0), (0, t.nblkpad - bpd), (0, 0)))
        return np.ascontiguousarray(
            f4.transpose(1, 2, 0, 3).reshape(-1, t.NV, TILE_C))

    def blocked_global_to_ice(self, fb, nice: int):
        """(n*nblkpad, NV, 128) shard-blocked → (NV, nice) global field."""
        t = self.template
        bpd = self.blk_ranges[0][1] - self.blk_ranges[0][0]
        f4 = fb.reshape(self.n_shards, t.nblkpad, t.NV, TILE_C)
        f4 = f4[:, :bpd].transpose(2, 0, 1, 3)
        return f4.reshape(t.NV, -1)[:, :nice]


def _pad_to(a, n, axis=0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(np.asarray(a), pad)


def sharded_pallas_from_weighted(mesh, M: WeightedMatrix,
                                 small_axis: str = "rows", nv: int = 8,
                                 ts: Optional[int] = None
                                 ) -> ShardedPallasBDT:
    """Partition the ice axis into per-device column ranges and build one
    padded PallasBDT per device."""
    from icebin_tpu.ops.pallas_bdt import TS
    ts = ts or TS
    n = int(mesh.devices.size)
    if small_axis == "rows":
        s, i, v = M.rows, M.cols, M.vals
        nsmall, nice = M.shape
    else:
        s, i, v = M.cols, M.rows, M.vals
        nice, nsmall = M.shape
    # pad the block count to a device multiple (trailing shards may own
    # fewer — or zero — true columns; their tiles are all-zero padding)
    nblk = -(-(-(-nice // TILE_C)) // n) * n
    bpd = nblk // n

    # global small-space weights (per-shard builds see only partial sums)
    wS_glob = np.bincount(s, weights=v, minlength=nsmall)

    shards = []
    blk_ranges = []
    for d in range(n):
        c0 = min(d * bpd * TILE_C, nice)
        c1 = min((d + 1) * bpd * TILE_C, nice)
        blk_ranges.append((d * bpd, (d + 1) * bpd))
        sel = (i >= c0) & (i < c1)
        Msub = WeightedMatrix(rows=s[sel], cols=i[sel] - c0, vals=v[sel],
                              shape=(nsmall, c1 - c0))
        shards.append(pallas_from_weighted(Msub, small_axis="rows", nv=nv,
                                           ts=ts))

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

    stacks = {name: [] for name in PallasBDT._ARRAYS}
    for p in shards:
        stacks["tiles2"].append(_pad_to(p.tiles2, npspad))
        p2b = _pad_to(p.pseudo2blk, npspad)
        p2b[p.npspad:] = nblkpad - 1
        stacks["pseudo2blk"].append(p2b)
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
        for name in ("ov_s", "ov_c", "ov_v"):
            if getattr(p, name) is not None:
                raise NotImplementedError(
                    "per-shard COO overflow not supported in the sharded "
                    "apply; raise W8_CAP or use the XLA engine")
            stacks[name].append(None)

    template = dataclasses.replace(
        shards[0],
        **{name: None for name in PallasBDT._ARRAYS},
        npspad=npspad, nchunk=nchunk, nchunkpad=nchunkpad, W8=W8,
        NWpad=NWpad, nblkpad=nblkpad, nice=nblkpad * TILE_C)
    sh = NamedSharding(mesh, P(ICE_AXIS))
    stacked = {}
    for name, parts in stacks.items():
        if parts and parts[0] is None:
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
                            n_shards=n, blk_ranges=blk_ranges)


def _arr_specs(spm: ShardedPallasBDT):
    return {name: (P(ICE_AXIS) if spm.stacked[name] is not None else None)
            for name in PallasBDT._ARRAYS}


def make_sharded_apply_small(mesh, spm: ShardedPallasBDT,
                             interpret: Optional[bool] = None):
    """fn(stacked, fb_sharded (n*nblkpad, NV, 128)) → scaled E3 (replicated).

    Local Pallas tile stream + band scatter per device, ONE psum of the E3
    partials over the mesh, then the GLOBAL weight scale.
    """
    t = spm.template
    arr_names = [n for n in PallasBDT._ARRAYS if spm.stacked[n] is not None]

    def body(fb, *arrs):
        pm = spm.local(dict(zip(arr_names, arrs)))
        part = apply_small_blocked(pm, fb, scale=False, interpret=interpret)
        e3 = jax.lax.psum(part, ICE_AXIS)
        return e3 * pm.winvS_e3

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(ICE_AXIS),) + tuple(P(ICE_AXIS)
                                                   for _ in arr_names),
                   out_specs=P(),
                   check_vma=False)
    jitted = jax.jit(sm)
    # matrix arrays ride as ARGUMENTS, not closure constants: multi-host
    # jit forbids closing over arrays that span non-addressable devices
    return lambda fb: jitted(fb, *[spm.stacked[n] for n in arr_names])


def make_sharded_apply_ice(mesh, spm: ShardedPallasBDT,
                           interpret: Optional[bool] = None):
    """fn(e3 replicated) → blocked ice (n*nblkpad, NV, 128) sharded.

    Purely local per device (E replicated): zero communication.
    """
    arr_names = [n for n in PallasBDT._ARRAYS if spm.stacked[n] is not None]

    def body(e3, *arrs):
        pm = spm.local(dict(zip(arr_names, arrs)))
        return apply_ice_blocked(pm, e3, scale=True, interpret=interpret)

    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(),) + tuple(P(ICE_AXIS) for _ in arr_names),
                   out_specs=P(ICE_AXIS),
                   check_vma=False)
    jitted = jax.jit(sm)
    return lambda e3: jitted(e3, *[spm.stacked[n] for n in arr_names])
