"""Mesh-decomposed production coupler (VERDICT round-1 item #2).

Round 1 had two disjoint paths: the production ``GCMCoupler`` (f64 ledger,
mass repair, regen cadence, E1vE0, writer, checkpoints) ran single-device,
while the sharded demo steps (``parallel.coupled``) had none of that
machinery.  This module closes the gap with ONE coupler:

``MeshIceSheetCoupler`` is an ``IceSheetCoupler`` whose

* matrix applies are the flagship Pallas SpMM kernels running per-device
  inside shard_map (``parallel.pallas_spmv.ShardedPallasView``: local tile
  streams, one psum of E3 partials, zero-comm dest-ice direction), and
* ice dynamics is the halo-ring shard_map SIA step
  (``parallel.coupled.make_sharded_ice_step``),

while every host-side feature -- f64 conservation ledger, per-apply mass
repair, regeneration cadence, E1vE0 remap of GCM-held EC state, writer
dumps, checkpoint/resume -- is INHERITED unchanged from the base class:
the ledger's jnp reductions run on sharded arrays transparently (XLA
inserts the collectives), so conservation accounting is identical.

Reference: ``GCMCoupler::couple`` gathers all fields to the MPI root and
does matrix algebra serially there (reference: ``slib/icebin/GCMCoupler.*``
[U]; SURVEY.md sections 2.11, 5.8) -- the design this class replaces with
mesh-resident state and reductions.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from icebin_tpu.coupler.coupler import CouplerConfig, IceSheetCoupler
from icebin_tpu.ops.bdt import TILE_C
from icebin_tpu.parallel.coupled import make_sharded_ice_step
from icebin_tpu.parallel.mesh import ICE_AXIS
from icebin_tpu.parallel.pallas_spmv import sharded_view_pair

__all__ = ["MeshIceSheetCoupler"]


class MeshIceSheetCoupler(IceSheetCoupler):
    """One ice sheet's coupling state, decomposed over a 1-D device mesh.

    Layout contract: the ice lattice's y axis shards over ``mesh`` (the
    long axis, SURVEY.md section 5.7), so ``ny % n_devices == 0`` and each
    shard's flat cell range must tile the 128-wide Pallas blocks:
    ``(ny // n) * nx % 128 == 0``.  A/E-space fields are replicated.
    """

    def __init__(self, gr, sheet: str, cfg: CouplerConfig, mesh,
                 nv: int = 8, interpret: Optional[bool] = None, **kw):
        n = int(mesh.devices.size)
        specI = gr.sheets[sheet].specI
        if specI.ny % n:
            raise ValueError(
                f"ny={specI.ny} not divisible by {n} devices")
        if (specI.ny // n) * specI.nx % TILE_C:
            raise ValueError(
                f"per-shard cells ({specI.ny // n}x{specI.nx}) must be a "
                f"multiple of {TILE_C} for block-aligned sharding")
        self.mesh = mesh
        self.nv = nv
        self.interpret = interpret
        super().__init__(gr, sheet, cfg, **kw)
        self.ice_step = make_sharded_ice_step(mesh)
        self.place_state()

    @property
    def local_domains(self):
        """Per-device owned (y, x) lattice blocks -- the reference's
        per-rank ``ibmisc::Domain`` bookkeeping [U], here describing the
        1-D y decomposition the matrices and ice state are sharded on."""
        from icebin_tpu.utils.indexing import Domain
        n = int(self.mesh.devices.size)
        ny, nx = self.ice_cfg.ny, self.ice_cfg.nx
        ny_l = ny // n
        return [Domain(low=(d * ny_l, 0), high=((d + 1) * ny_l, nx))
                for d in range(n)]

    def elevmask(self) -> np.ndarray:
        """Host elevmask for matrix regeneration.  The ice state is sharded
        over the GLOBAL mesh; in a multi-controller run each process holds
        only its shards, so the full mask is assembled with ONE
        process_allgather (the reference's per-rank restart gather analog
        [U]) instead of a direct fetch (which raises)."""
        em = self.state.elevmask(self.cfg.min_thickness)
        if (isinstance(em, jax.Array) and not em.is_fully_addressable):
            from jax.experimental import multihost_utils
            em = multihost_utils.process_allgather(em, tiled=True)
        return np.asarray(em)

    def place_state(self) -> None:
        """Shard H/bed over the ice (y) axis; scalars replicated."""
        import dataclasses
        sh = NamedSharding(self.mesh, P(ICE_AXIS))
        self.state = dataclasses.replace(
            self.state,
            H=jax.device_put(self.state.H, sh),
            bed=jax.device_put(self.state.bed, sh))

    def _build_mats(self) -> None:
        """EvI/IvE and AvI/IvA as sharded Pallas view pairs: one sharded
        tile set per pair, compiled apply cores cached on the padded
        geometry so regeneration usually costs no recompilation."""
        share = self.cfg.params.sigma is None   # see IceSheetCoupler note
        for name in ("EvI", "AvI"):
            M = self.rm.matrix(name, self.cfg.params)
            fwd, rev = sharded_view_pair(self.mesh, M, small_axis="rows",
                                         nv=self.nv, interpret=self.interpret,
                                         passes=self.cfg.prods_passes)
            self._mats[name] = fwd
            if share:
                self._mats["Iv" + name[0]] = rev
            else:
                Mr = self.rm.matrix("Iv" + name[0], self.cfg.params)
                self._mats["Iv" + name[0]] = sharded_view_pair(
                    self.mesh, Mr, small_axis="cols", nv=self.nv,
                    interpret=self.interpret,
                    passes=self.cfg.prods_passes)[0]

    def _window_fusible(self) -> bool:
        mats = (self.mat("IvE"), self.mat("EvI"), self.mat("AvI"))
        return (all(hasattr(m, "spm") for m in mats)
                and getattr(self.ice_step, "jittable", False))

    def couple_window(self, fE_seq):
        """Fused transient window over the MESH: one jitted lax.scan per
        regeneration window, with the sharded Pallas applies and the
        halo-ring SIA step inlined (the shard_map cores compose under the
        outer jit).  Matrix arrays and f64 weights ride as ARGUMENTS
        (``parallel.pallas_spmv.ArgShardedView``), so regeneration swaps
        values under an unchanged trace -- no per-regen recompile, no
        stale weights.  Semantics identical to the base class.
        """
        import jax
        import jax.numpy as jnp
        from icebin_tpu.ops.pallas_bdt import PallasBDT
        from icebin_tpu.parallel.pallas_spmv import (ArgShardedView,
                                                     ShardedPallasBDT,
                                                     _statics_of)

        mats = (self.mat("IvE"), self.mat("EvI"), self.mat("AvI"))
        names_k = tuple(tuple(n for n in PallasBDT._ARRAYS
                              if m.spm.stacked[n] is not None)
                        for m in mats)
        key = (self.ice_step, self.cfg.prods_passes,
               tuple((_statics_of(m.spm.template), nk, m.transposed)
                     for m, nk in zip(mats, names_k)))
        if getattr(self, "_mesh_window_key", None) != key:
            core = self._couple_core
            mesh, interp = self.mesh, self.interpret
            psx = self.cfg.prods_passes
            nice = mats[0].nice
            lites = tuple(ShardedPallasBDT(
                stacked={}, template=m.spm.template,
                n_shards=m.spm.n_shards, blk_ranges=m.spm.blk_ranges)
                for m in mats)
            transposed = tuple(m.transposed for m in mats)
            counts = tuple(len(nk) for nk in names_k)

            @jax.jit
            def window(state0, fE_seq, ws, *arrs):
                views = []
                off = 0
                for lite, nk, tp, cnt, (wS, wI) in zip(
                        lites, names_k, transposed, counts, ws):
                    views.append(ArgShardedView(
                        mesh, lite, nk, arrs[off:off + cnt], tp, nice,
                        wS, wI, interp, passes=psx))
                    off += cnt
                ive_v, evi_v, avi_v = views
                sh = jax.eval_shape(lambda st, f: core(ive_v, evi_v, avi_v,
                                                       st, f)[:3],
                                    state0, fE_seq[0])
                init = (state0,) + tuple(jnp.zeros(s.shape, s.dtype)
                                         for s in sh)

                def body(carry, fE):
                    st = carry[0]
                    fI, fE_out, fA_out, new_st, stats = core(
                        ive_v, evi_v, avi_v, st, fE)
                    return (new_st, fI, fE_out, fA_out), stats

                carry, stats = jax.lax.scan(body, init, fE_seq)
                return carry, stats

            self._mesh_window = window
            self._mesh_window_key = key
        # raw numpy weights: jit replicates them across processes (a local
        # jnp.asarray would commit to this process's devices and clash
        # with the global-mesh arrays in multi-controller runs)
        ws = tuple((np.asarray(m._wS64), np.asarray(m._wI64))
                   for m in mats)
        arrs = [m.spm.stacked[n] for m, nk in zip(mats, names_k)
                for n in nk]
        (new_state, fI, fE_out, fA_out), stats = self._mesh_window(
            self.state, fE_seq, ws, *arrs)
        self.state = new_state
        K = int(fE_seq.shape[0])
        self.steps_since_regen += K
        import numpy as _np
        return _np.asarray(stats), {"fI": fI, "fE_out": fE_out,
                                    "fA_out": fA_out}
