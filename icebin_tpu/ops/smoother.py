"""Conservative Gaussian smoothing matrix over an ice grid.

Reference: ``smoother.cpp`` builds a sigma-truncated Gaussian matrix over ice
cells that is composed into regrid matrices so smoothed fields remain mass
conservative (reference: ``slib/icebin/smoother.*`` [U]; SURVEY.md section 2
"Smoother").  TPU-native re-design: on a regular ice lattice the Gaussian
support is a fixed stencil window, so the matrix is assembled from per-offset
diagonals in vectorized numpy -- O(window * ncells), no neighbor search.

Conservation construction: with cell areas a and raw kernel weights
g_ij = exp(-0.5 * (dx/sx)^2 - 0.5 * (dy/sy)^2) over icy cells,

    S[i, j] = g_ij * a_j / n_j,    n_j = sum_i a_i g_ij

so that sum_i a_i (S f)_i == sum_j a_j f_j for every field f (mass exactly
preserved, column-by-column).
"""
from __future__ import annotations

import numpy as np
from scipy import sparse

from icebin_tpu.grid.spec import GridSpecXY

__all__ = ["smoothing_matrix"]


def smoothing_matrix(specI: GridSpecXY, mask, sigma, truncate: float = 3.0):
    """Build the (nI, nI) conservative Gaussian smoother as scipy CSR.

    specI: uniform-spacing XY ice grid.  mask: (nI,) bool, True = icy cell
    (others get identity rows so composition leaves them untouched).
    sigma: (sigma_x, sigma_y) in plane units (metres).
    """
    dx = np.diff(specI.xb)
    dy = np.diff(specI.yb)
    if not (np.allclose(dx, dx[0]) and np.allclose(dy, dy[0])):
        raise NotImplementedError("smoother requires a uniform ice lattice")
    dx, dy = float(dx[0]), float(dy[0])
    sx, sy = float(sigma[0]), float(sigma[1])
    nx, ny = specI.nx, specI.ny
    n = specI.ncells
    mask = np.asarray(mask, dtype=bool).reshape(-1)
    areas = specI.cell_areas()

    rx = int(np.ceil(truncate * sx / dx)) if sx > 0 else 0
    ry = int(np.ceil(truncate * sy / dy)) if sy > 0 else 0

    ii = np.arange(n, dtype=np.int64)
    gx = ii % nx
    gy = ii // nx

    rows_all, cols_all, g_all = [], [], []
    for oy in range(-ry, ry + 1):
        for ox in range(-rx, rx + 1):
            w = np.exp(-0.5 * ((ox * dx / sx) ** 2 if sx > 0 else 0.0)
                       - 0.5 * ((oy * dy / sy) ** 2 if sy > 0 else 0.0))
            if w < np.exp(-0.5 * truncate ** 2) * 1e-3:
                continue
            nxg = gx + ox
            nyg = gy + oy
            ok = (nxg >= 0) & (nxg < nx) & (nyg >= 0) & (nyg < ny)
            j = ii[ok]                      # source cell
            i = nyg[ok] * nx + nxg[ok]      # dest cell
            both = mask[i] & mask[j]
            rows_all.append(i[both])
            cols_all.append(j[both])
            g_all.append(np.full(both.sum(), w))
    rows = np.concatenate(rows_all)
    cols = np.concatenate(cols_all)
    g = np.concatenate(g_all)

    # Column normalization with area weights: S[i,j] = g a_j / n_j.
    nj = np.zeros(n)
    np.add.at(nj, cols, areas[rows] * g)
    vals = g * areas[cols] / nj[cols]

    # Identity rows for non-icy cells (composition pass-through).
    off = ii[~mask]
    rows = np.concatenate([rows, off])
    cols = np.concatenate([cols, off])
    vals = np.concatenate([vals, np.ones(len(off))])
    return sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))
