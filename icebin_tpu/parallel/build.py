"""Mesh-distributed exchange-grid construction (the north-star mandate).

Reference: ``GridGen_Exchange`` runs the polygon-intersection hot loop
serially on one host (reference: ``slib/icebin/gridgen/GridGen_Exchange.*``
[U]; SURVEY.md section 3.1).  TPU-native redesign (SURVEY.md section 2.11
'Domain decomposition', section 7 stage 6):

* The ice lattice's y axis is partitioned over the device mesh -- every
  candidate pair is OWNED by the shard owning its ice cell's row, so each
  ice cell's overlaps (and therefore the f64 conservation repair) are
  shard-local by construction.
* Every A-cell polygon lives in exactly one HOME block: the shard of the
  first ice row its bounding box touches.  A-cell polygons are the big
  geometry payload, and boundary cells spill into later shards, so the home
  blocks are ring-rotated over the mesh with ``lax.ppermute`` -- the
  ring-attention communication skeleton applied to geometry halo exchange.
* At ring step s, shard d holds home block (d - s) mod n and clips the
  candidate pairs whose A cell lives there against its local ice rows.  The
  NEXT block's permute is issued before the clip of the current step, so
  XLA's async collectives overlap the ICI transfer with the clip compute.
* No gather-to-root anywhere; the host only does index arithmetic
  (candidate windows), final f64 repair, and deterministic re-assembly --
  both builds share ``assemble_exchange_grid``, so the sharded build is
  bit-identical to the host build (tests/test_sharded_build.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from icebin_tpu.grid.exchange import (ExchangeGrid, assemble_exchange_grid,
                                      candidate_pairs,
                                      prepare_subject_polygons)
from icebin_tpu.grid.spec import Grid, GridSpecXY
from icebin_tpu.parallel.mesh import ICE_AXIS

__all__ = ["sharded_exchange_grid"]


def _clip_body_engine(engine: str):
    if engine == "pallas":
        from icebin_tpu.ops.pallas_clip import clip_areas_centroids_pallas
        return clip_areas_centroids_pallas
    from icebin_tpu.ops.clip import clip_polys_rects, polygon_areas, \
        polygon_centroids

    def fn(subj, rect):
        rings = clip_polys_rects(subj, rect)
        return polygon_areas(rings), polygon_centroids(rings)
    return fn


def sharded_exchange_grid(mesh, gridA, gridI, subdiv: int = 2,
                          engine: str = "auto", repair: bool = True,
                          min_area_frac: float = 1e-13,
                          coverage_tol: float = 1e-3) -> ExchangeGrid:
    """Distributed twin of ``grid.exchange.make_exchange_grid``.

    Same inputs and same result (bit-identical to the host build with the
    matching engine); the clip hot loop runs sharded over ``mesh`` with the
    A-polygon home blocks ring-rotated between clip steps.
    """
    specA = gridA.spec if isinstance(gridA, Grid) else gridA
    specI = gridI.spec if isinstance(gridI, Grid) else gridI
    maskI = gridI.mask if isinstance(gridI, Grid) else None
    maskA = gridA.mask if isinstance(gridA, Grid) else None
    if not isinstance(specI, GridSpecXY):
        raise TypeError("gridI must be an XY (projected Cartesian) grid")
    n = int(mesh.devices.size)
    if engine == "auto":
        engine = ("pallas" if jax.default_backend() == "tpu" else "jax")
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    # -- host index arithmetic (identical to the host build's head) --------
    polysA, keepA = prepare_subject_polygons(specA, specI, subdiv=subdiv)
    if maskA is not None:
        keepA = keepA & maskA
    pairA, pairI = candidate_pairs(specA, specI, polysA, keepA, maskI=maskI)
    rectsI = specI.cell_rects()
    areasI = specI.cell_areas()
    npairs = len(pairA)
    if npairs == 0:
        z = np.zeros(0)
        return assemble_exchange_grid(pairA, pairI, z, np.zeros((0, 2)),
                                      specA, specI, areasI, repair=repair,
                                      min_area_frac=min_area_frac,
                                      coverage_tol=coverage_tol)

    if engine == "pallas":
        from icebin_tpu.ops.pallas_clip import V0 as KV0
        if polysA.shape[1] > KV0:
            raise ValueError(f"pallas engine supports <= {KV0} subject "
                             f"vertices (got {polysA.shape[1]})")
        if polysA.shape[1] < KV0:
            pad = np.repeat(polysA[:, -1:, :], KV0 - polysA.shape[1], axis=1)
            polysA = np.concatenate([polysA, pad], axis=1)
    V0 = polysA.shape[1]

    # pair ownership: shard of the pair's ice row (every ice cell's overlaps
    # land on ONE shard -> repair is shard-local)
    ny_l = -(-specI.ny // n)
    owner = (pairI // specI.nx) // ny_l
    # A-cell home shard: first shard its candidate window touches
    home = np.full(specA.ncells, n, dtype=np.int64)
    np.minimum.at(home, pairA, owner)
    shift = owner - home[pairA]                 # ring distance, in [0, n)
    n_shift = int(shift.max()) + 1

    # home blocks: (n, maxA, V0, 2); loc[a] = slot of cell a in its block
    haspair = home < n
    order_cells = np.argsort(home, kind="stable")
    order_cells = order_cells[haspair[order_cells]]
    counts_h = np.bincount(home[haspair], minlength=n)
    maxA = max(int(counts_h.max(initial=1)), 1)
    starts_h = np.concatenate([[0], np.cumsum(counts_h)[:-1]])
    loc = np.zeros(specA.ncells, dtype=np.int64)
    loc[order_cells] = (np.arange(len(order_cells))
                        - np.repeat(starts_h, counts_h))
    blocks = np.zeros((n, maxA, V0, 2), dtype=dtype)
    blocks[home[order_cells], loc[order_cells]] = polysA[order_cells]

    # (shard, ring-step) pair groups, padded to a common static size
    key = owner * n_shift + shift
    order_p = np.argsort(key, kind="stable")
    counts_g = np.bincount(key[order_p], minlength=n * n_shift)
    P_max = max(int(counts_g.max(initial=1)), 1)
    if engine == "pallas":
        P_max = max(128, -(-P_max // 128) * 128)
    starts_g = np.concatenate([[0], np.cumsum(counts_g)[:-1]])
    within = np.arange(npairs) - np.repeat(starts_g, counts_g)
    slot = np.repeat(np.arange(n * n_shift) * P_max, counts_g) + within
    idx = np.zeros(n * n_shift * P_max, dtype=np.int32)
    rects = np.tile(np.array([0.0, 0.0, 1.0, 1.0], dtype=dtype),
                    (n * n_shift * P_max, 1))
    valid = np.zeros(n * n_shift * P_max, dtype=bool)
    pos = np.full(n * n_shift * P_max, -1, dtype=np.int64)   # host-only
    idx[slot] = loc[pairA[order_p]]
    rects[slot] = rectsI[pairI[order_p]]
    valid[slot] = True
    pos[slot] = order_p
    idx = idx.reshape(n, n_shift, P_max)
    rects = rects.reshape(n, n_shift, P_max, 4)
    valid = valid.reshape(n, n_shift, P_max)

    clip_fn = _clip_body_engine(engine)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def body(block, idx_l, rects_l, valid_l):
        cur = block[0]
        idx_l, rects_l, valid_l = idx_l[0], rects_l[0], valid_l[0]
        areas, cents = [], []
        for s in range(n_shift):
            # issue the NEXT block's ring permute BEFORE this step's clip so
            # the ICI transfer overlaps the clip compute
            nxt = (jax.lax.ppermute(cur, ICE_AXIS, fwd)
                   if s + 1 < n_shift else None)
            subj = jnp.take(cur, idx_l[s], axis=0)
            r = rects_l[s]
            c = 0.5 * (r[:, 0:2] + r[:, 2:4])
            a, ctr = clip_fn(subj - c[:, None, :],
                             r - jnp.concatenate([c, c], axis=1))
            areas.append(jnp.where(valid_l[s], jnp.abs(a), 0.0))
            cents.append(ctr + c)
            if nxt is not None:
                cur = nxt
        return jnp.stack(areas)[None], jnp.stack(cents)[None]

    sh = NamedSharding(mesh, P(ICE_AXIS))
    put = lambda a: jax.make_array_from_callback(
        a.shape, sh, lambda i, a=a: a[i])
    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(ICE_AXIS),) * 4,
                   out_specs=(P(ICE_AXIS), P(ICE_AXIS)),
                   check_vma=False)
    a_dev, c_dev = jax.jit(sm)(put(blocks), put(idx),
                               put(rects.astype(dtype)), put(valid))

    # re-assemble in the ORIGINAL candidate-pair order, then run the shared
    # f64 repair + deterministic sort (bit-identical to the host build)
    a_host = np.asarray(a_dev, dtype=np.float64).reshape(-1)
    c_host = np.asarray(c_dev, dtype=np.float64).reshape(-1, 2)
    sel = pos >= 0
    areas = np.empty(npairs, dtype=np.float64)
    cents = np.empty((npairs, 2), dtype=np.float64)
    areas[pos[sel]] = a_host[sel]
    cents[pos[sel]] = c_host[sel]
    return assemble_exchange_grid(pairA, pairI, areas, cents, specA, specI,
                                  areasI, repair=repair,
                                  min_area_frac=min_area_frac,
                                  coverage_tol=coverage_tol)
