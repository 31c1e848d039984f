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
        for name in ("EvI", "AvI"):
            M = self.rm.matrix(name, self.cfg.params)
            fwd, rev = sharded_view_pair(self.mesh, M, small_axis="rows",
                                         nv=self.nv, interpret=self.interpret)
            self._mats[name] = fwd
            self._mats["Iv" + name[0]] = rev
