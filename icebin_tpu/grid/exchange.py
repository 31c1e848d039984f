"""Exchange-grid construction: overlap areas of GCM cells x ice cells.

Reference: ``GridGen_Exchange`` / the ``overlap`` CLI build the exchange grid
by exact CGAL polygon intersection, serially, on the host (reference:
``slib/icebin/gridgen/GridGen_Exchange.*``, ``overlap.cpp`` [U]; SURVEY.md
section 3.1).  TPU-native re-design:

1. **Candidate pairs** (host, vectorized numpy): project every GCM (A) cell
   polygon into the ice projection plane once; each A-cell bounding box maps
   to a rectangular index window of the regular ice (I) lattice by binary
   search on the ice border arrays.  No spatial tree -- the ice grid *is* the
   spatial index.
2. **Clipping** (batched): every candidate pair is one fixed-size
   polygon-vs-rectangle Sutherland--Hodgman clip, batched over pairs:
   f64 numpy oracle engine, a jit/vmapped XLA engine, or the Pallas TPU
   kernel (``icebin_tpu.ops.clip``), all running the identical scatter-free
   algorithm (see ``icebin_tpu.oracle.clip``).
3. **Conservation repair** (host, f64): CGAL exactness is replaced by
   normalizing each fully-covered ice cell's overlap areas to sum *exactly*
   (in f64) to the ice cell area.  Column-sum identities -- and therefore
   regrid conservation -- then hold to f64 round-off regardless of kernel
   precision (SURVEY.md section 7 "hard parts" (a)).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from icebin_tpu.grid.spec import Grid, GridSpecXY

__all__ = ["ExchangeGrid", "make_exchange_grid", "candidate_pairs",
           "prepare_subject_polygons", "assemble_exchange_grid"]


@dataclasses.dataclass
class ExchangeGrid:
    """Sparse overlap list: exchange cell k = A cell iA[k] x I cell iI[k].

    Areas are in the ice projection plane ('projected' areas in reference
    terms).  Reference equivalent: ``ExchangeGrid`` / ``AbbrGrid`` [U].
    """

    iA: np.ndarray        # (nX,) int32/int64 flat A-cell index
    iI: np.ndarray        # (nX,) flat I-cell index
    area: np.ndarray      # (nX,) f64 overlap area in projection plane
    centroid: np.ndarray  # (nX, 2) f64 overlap centroid in plane (or None)
    nA: int
    nI: int

    @property
    def ncells(self) -> int:
        return len(self.area)

    def area_sums_A(self) -> np.ndarray:
        """Per-A-cell projected area covered by ice cells."""
        return np.bincount(self.iA, weights=self.area, minlength=self.nA)

    def area_sums_I(self) -> np.ndarray:
        """Per-I-cell area covered by A cells (== cell area if A covers it)."""
        return np.bincount(self.iI, weights=self.area, minlength=self.nI)

    def sort_by(self, key: str) -> "ExchangeGrid":
        """Stable sort of exchange cells by parent index ('A' or 'I').
        Deterministic ordering is what makes scatter-adds bit-reproducible
        (SURVEY.md section 5.2)."""
        k = self.iA if key == "A" else self.iI
        order = np.argsort(k, kind="stable")
        return ExchangeGrid(
            iA=self.iA[order], iI=self.iI[order], area=self.area[order],
            centroid=None if self.centroid is None else self.centroid[order],
            nA=self.nA, nI=self.nI)


def prepare_subject_polygons(specA, specI: GridSpecXY, subdiv: int = 2):
    """Project A-cell polygons into the ice plane; return (polys, keep).

    polys: (nA, 4*subdiv, 2) f64 plane coordinates, CCW-oriented.
    keep:  (nA,) bool -- cells with finite projection whose bbox can
           intersect the ice domain (others, e.g. the far hemisphere under a
           polar stereographic projection, are dropped before pairing).
    """
    polys_ll = specA.cell_polygons(subdiv=subdiv)      # (nA, V0, 2) lon/lat
    x, y = specI.projection.ll2xy(polys_ll[:, :, 0], polys_ll[:, :, 1])
    polys = np.stack([np.asarray(x), np.asarray(y)], axis=-1)

    finite = np.isfinite(polys).all(axis=(1, 2))
    polys = np.where(finite[:, None, None], polys, 0.0)

    # Enforce CCW orientation in the plane (projection may flip handedness).
    x_ = polys[:, :, 0]
    y_ = polys[:, :, 1]
    sgn = np.sum(x_ * np.roll(y_, -1, axis=1) - np.roll(x_, -1, axis=1) * y_,
                 axis=1)
    polys = np.where((sgn < 0)[:, None, None], polys[:, ::-1, :], polys)

    # Sanity radius: anything projecting absurdly far from the ice domain is
    # a near-antipodal cell whose polygon approximation is meaningless.
    diag = float(np.hypot(specI.xb[-1] - specI.xb[0], specI.yb[-1] - specI.yb[0]))
    cx = 0.5 * float(specI.xb[0] + specI.xb[-1])
    cy = 0.5 * float(specI.yb[0] + specI.yb[-1])
    r = np.hypot(polys[:, :, 0] - cx, polys[:, :, 1] - cy).max(axis=1)
    sane = finite & (r < 50.0 * max(diag, 1e-30))

    bx0 = polys[:, :, 0].min(axis=1)
    bx1 = polys[:, :, 0].max(axis=1)
    by0 = polys[:, :, 1].min(axis=1)
    by1 = polys[:, :, 1].max(axis=1)
    keep = (sane & (bx1 > specI.xb[0]) & (bx0 < specI.xb[-1])
            & (by1 > specI.yb[0]) & (by0 < specI.yb[-1]))
    return polys, keep


def candidate_pairs(specA, specI: GridSpecXY, polysA: np.ndarray,
                    keepA: np.ndarray, maskI: Optional[np.ndarray] = None):
    """All (iA, iI) pairs whose bounding boxes overlap.

    Returns (pairA, pairI) int64 arrays.  Vectorized: each surviving A cell's
    bbox becomes an (ix0:ix1) x (iy0:iy1) window on the ice lattice
    (searchsorted on the border arrays), then the windows are flattened with
    repeat/arange arithmetic -- the whole pairing is O(npairs) numpy, no tree.
    """
    nxI = specI.nx
    idxA = np.nonzero(keepA)[0]
    if len(idxA) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    P = polysA[idxA]
    bx0 = P[:, :, 0].min(axis=1)
    bx1 = P[:, :, 0].max(axis=1)
    by0 = P[:, :, 1].min(axis=1)
    by1 = P[:, :, 1].max(axis=1)
    ix0 = np.clip(np.searchsorted(specI.xb, bx0, side="right") - 1, 0, nxI - 1)
    ix1 = np.clip(np.searchsorted(specI.xb, bx1, side="left"), 1, nxI)
    iy0 = np.clip(np.searchsorted(specI.yb, by0, side="right") - 1, 0,
                  specI.ny - 1)
    iy1 = np.clip(np.searchsorted(specI.yb, by1, side="left"), 1, specI.ny)
    nx = ix1 - ix0
    ny = iy1 - iy0
    counts = nx * ny
    total = int(counts.sum())
    pairA = np.repeat(idxA, counts)
    # Within each A window enumerate (dy, dx) row-major.
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    dx = local % nx_r
    dy = local // nx_r
    pairI = ((np.repeat(iy0, counts) + dy) * nxI
             + np.repeat(ix0, counts) + dx)
    if maskI is not None:
        m = np.asarray(maskI, dtype=bool).reshape(-1)
        sel = m[pairI]
        pairA, pairI = pairA[sel], pairI[sel]
    return pairA, pairI


def _clip_areas_numpy(polys, rects):
    from icebin_tpu.oracle.clip import (clip_polys_rects, polygon_areas,
                                        polygon_centroids)
    rings = clip_polys_rects(polys, rects)
    return polygon_areas(rings), polygon_centroids(rings)


def make_exchange_grid(gridA, gridI, subdiv: int = 2, engine: str = "auto",
                       repair: bool = True, chunk: int = 1 << 18,
                       min_area_frac: float = 1e-13,
                       coverage_tol: float = 1e-3) -> ExchangeGrid:
    """Build the exchange grid between a lat-lon GCM grid and an XY ice grid.

    engine: 'auto' (native C++ if built, else numpy), 'numpy' (f64 oracle),
    'native' (C++ OpenMP host engine), 'jax' (XLA, vmapped), or 'pallas'
    (TPU kernel); all run the same clipping data flow.  ``repair`` rescales each
    ice cell's overlaps so they sum exactly to the cell area whenever the raw
    sum is already within ``coverage_tol`` of full coverage (cells at an open
    A-domain boundary are left as measured).
    """
    specA = gridA.spec if isinstance(gridA, Grid) else gridA
    specI = gridI.spec if isinstance(gridI, Grid) else gridI
    maskI = gridI.mask if isinstance(gridI, Grid) else None
    maskA = gridA.mask if isinstance(gridA, Grid) else None
    if not isinstance(specI, GridSpecXY):
        raise TypeError("gridI must be an XY (projected Cartesian) grid")

    polysA, keepA = prepare_subject_polygons(specA, specI, subdiv=subdiv)
    if maskA is not None:
        keepA = keepA & maskA
    pairA, pairI = candidate_pairs(specA, specI, polysA, keepA, maskI=maskI)

    rectsI = specI.cell_rects()                         # (nI, 4) f64
    areasI = specI.cell_areas()

    if engine == "auto":
        # On TPU the Pallas clip kernel is the north-star geometric engine
        # (~86 M pairs/s); host fallbacks: C++ OpenMP, then the f64 oracle.
        import jax
        from icebin_tpu.ops import native
        from icebin_tpu.ops.pallas_clip import V0 as _KV0
        n_vert = polysA.shape[1]
        if jax.default_backend() == "tpu" and n_vert <= _KV0:
            engine = "pallas"
        elif native.available() and 16 * n_vert <= 1024:
            engine = "native"
        else:
            engine = "numpy"
    if engine == "numpy":
        clip_fn = _clip_areas_numpy
    elif engine == "native":
        from icebin_tpu.ops.native import clip_areas_centroids_native
        clip_fn = clip_areas_centroids_native
    elif engine in ("jax", "pallas"):
        from icebin_tpu.ops.clip import make_clip_engine
        clip_fn = make_clip_engine(engine)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    areas = np.empty(len(pairA), dtype=np.float64)
    cents = np.empty((len(pairA), 2), dtype=np.float64)
    # pipelined dispatch: run a few chunks AHEAD of the fetches (device
    # engines return async arrays; forcing a fetch per chunk costs one
    # relay round trip each, which dominated large polar builds), bounded
    # so device buffers don't grow with the total pair count
    DEPTH = 8
    pending = []

    def drain(n):
        while len(pending) > n:
            s, e, a, ctr, c = pending.pop(0)
            areas[s:e] = np.abs(np.asarray(a, dtype=np.float64))
            cents[s:e] = np.asarray(ctr, dtype=np.float64) + c

    for s in range(0, len(pairA), chunk):
        e = min(s + chunk, len(pairA))
        subj = polysA[pairA[s:e]]
        rect = rectsI[pairI[s:e]]
        # Recenter on the rect so in-kernel coordinates are O(cell size) --
        # this is what lets the f32 TPU kernel hold ~1e-7 relative accuracy
        # on metre-scale global grids (SURVEY.md section 7 hard part (c)).
        c = 0.5 * (rect[:, 0:2] + rect[:, 2:4])
        a, ctr = clip_fn(subj - c[:, None, :],
                         rect - np.concatenate([c, c], axis=1))
        pending.append((s, e, a, ctr, c))
        drain(DEPTH)
    drain(0)

    return assemble_exchange_grid(pairA, pairI, areas, cents, specA, specI,
                                  areasI, repair=repair,
                                  min_area_frac=min_area_frac,
                                  coverage_tol=coverage_tol)


def assemble_exchange_grid(pairA, pairI, areas, cents, specA, specI, areasI,
                           repair: bool = True, min_area_frac: float = 1e-13,
                           coverage_tol: float = 1e-3) -> ExchangeGrid:
    """Shared tail of the host and mesh-sharded builds: degenerate-overlap
    filtering, f64 conservation repair, deterministic A-ordering.  Feeding
    both builds through the same f64 assembly is what makes the sharded
    build bit-identical to the host build (tests/test_sharded_build.py)."""
    # Drop degenerate overlaps (relative to their ice cell's area).
    keep = areas > min_area_frac * areasI[pairI]
    pairA, pairI, areas, cents = pairA[keep], pairI[keep], areas[keep], cents[keep]

    xg = ExchangeGrid(iA=pairA, iI=pairI, area=areas, centroid=cents,
                      nA=specA.ncells, nI=specI.ncells)

    if repair:
        colsum = xg.area_sums_I()
        with np.errstate(invalid="ignore", divide="ignore"):
            rel = np.abs(colsum - areasI) / areasI
        scale = np.where((colsum > 0) & (rel < coverage_tol),
                         areasI / np.where(colsum > 0, colsum, 1.0), 1.0)
        xg.area = xg.area * scale[xg.iI]

    return xg.sort_by("A")
