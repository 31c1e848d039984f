"""Pole-centered (Antarctica-style) sheets on the Pallas fast path
(VERDICT round-1 item #6).

A stereographic sheet centered on the pole is the adversarial geometry for
banded layouts: ice rows through the pole cross EVERY longitude, so each
128-cell block touches A cells scattered across the whole index space.
The window-sorted pseudo-block layout keeps W8 bounded, and anything past
the band cap demotes to COO overflow -- which the SHARDED apply must accept
too (round 1 hard-raised there).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icebin_tpu.grid.exchange import make_exchange_grid
from icebin_tpu.grid.spec import Grid, GridSpecXY, modele_lonlat_grid
from icebin_tpu.ops.pallas_bdt import apply_small, apply_ice, \
    pallas_from_weighted
from icebin_tpu.parallel.mesh import make_mesh
from icebin_tpu.parallel.pallas_spmv import (make_sharded_apply_ice,
                                             make_sharded_apply_small,
                                             sharded_pallas_from_weighted)
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.matrices import RegridParams
from icebin_tpu.regrid.sparse import WeightedMatrix

EPSG3031 = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"


def antarctica_patch(res_km=100.0, nA=(72, 46)):
    """South-polar stereographic window centered ON the pole vs ModelE 4x5."""
    specA = modele_lonlat_grid(*nA)
    R = 2800e3
    n = int(2 * R / (res_km * 1e3))
    specI = GridSpecXY(xb=np.linspace(-R, R, n + 1),
                       yb=np.linspace(-R, R, n + 1),
                       projection=EPSG3031, name=f"antarctica_{res_km:g}km")
    return specA, specI


def polar_matrices(res_km=100.0):
    specA, specI = antarctica_patch(res_km)
    xg = make_exchange_grid(specA, specI, subdiv=2)
    gr = GCMRegridder(specA, hcdefs=[0.0, 1000.0, 2000.0, 3000.0, 4500.0])
    gr.add_sheet("aa", Grid(specI), exchange=xg)
    c = specI.cell_centers()
    r2 = (c[:, 0] ** 2 + c[:, 1] ** 2) / (2500e3) ** 2
    elev = np.where(r2 < 1.0, 4000.0 * (1.0 - r2), np.nan)
    rm = gr.regrid_matrices("aa", elev)
    return rm, specI


def test_polar_exchange_conservation():
    specA, specI = antarctica_patch(200.0)
    xg = make_exchange_grid(specA, specI, subdiv=2)
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-13)


def test_polar_pallas_single_device():
    """Pole-centered EvI through the Pallas kernels == WeightedMatrix oracle
    (f32), including the pole-crossing rows."""
    rm, specI = polar_matrices(100.0)
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    pm = pallas_from_weighted(Me, small_axis="rows", nv=8)
    f = np.random.default_rng(0).uniform(0.5, 1.5, (8, Me.shape[1]))
    dev = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = np.stack([Me.apply(f[k], scale=True, fill=0.0) for k in range(8)])
    got = np.where(np.isfinite(dev), dev, 0.0)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4 * ref.max())


def test_polar_sharded_apply():
    """The SHARDED builder + applies accept the pole-centered sheet (round 1
    raised NotImplementedError on per-shard overflow) and match the oracle."""
    rm, specI = polar_matrices(100.0)
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    mesh = make_mesh(8)
    spm = sharded_pallas_from_weighted(mesh, Me, small_axis="rows", nv=8)
    f = np.random.default_rng(1).uniform(0.5, 1.5, (8, Me.shape[1]))
    fb = spm.ice_to_blocked_global(jnp.asarray(f, jnp.float32), Me.shape[1])
    e3 = make_sharded_apply_small(mesh, spm)(fb)
    out = spm.template.e3_to_small(e3)
    ref = np.stack([Me.apply(f[k], scale=True, fill=0.0) for k in range(8)])
    got = np.where(np.asarray(Me.wM)[None, :] != 0, np.asarray(out), 0.0)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4 * ref.max())
    # reverse direction (IvE twin): finite everywhere ice has weight
    ice = make_sharded_apply_ice(mesh, spm)(e3)
    assert np.isfinite(np.asarray(ice)).all()


def test_sharded_overflow_coo_exact():
    """Adversarial scatter (random small rows spanning >> W8_CAP bands per
    chunk) forces COO overflow; the sharded apply must still be exact."""
    rng = np.random.default_rng(42)
    nsmall, nice = 40_000, 2048
    # few-but-FAR windows per ice block: each 128-col block gets 4 entries
    # whose small rows span the whole index space, so one pseudo-block's
    # internal spread exceeds the W8 band cap and demotes to COO
    nblk = nice // 128
    rows = rng.integers(0, nsmall, (nblk, 4)).reshape(-1)
    cols = np.repeat(np.arange(nblk) * 128, 4) + rng.integers(0, 128,
                                                              4 * nblk)
    vals = rng.uniform(0.5, 1.5, rows.size)
    key = rows * nice + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols, vals = rows[idx], cols[idx], vals[idx]
    M = WeightedMatrix(rows=rows, cols=cols, vals=vals, shape=(nsmall, nice))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    assert pm.ov_s is not None and len(pm.ov_s) > 0   # overflow exercised
    mesh = make_mesh(8)
    spm = sharded_pallas_from_weighted(mesh, M, small_axis="rows", nv=8)
    assert any(spm.stacked[n] is not None for n in ("ov_s", "ov_c", "ov_v"))
    f = rng.uniform(0.5, 1.5, (8, nice))
    fb = spm.ice_to_blocked_global(jnp.asarray(f, jnp.float32), nice)
    e3 = make_sharded_apply_small(mesh, spm)(fb)
    out = np.asarray(spm.template.e3_to_small(e3))
    # oracle: scaled-by-row-sum SpMM in f64
    from scipy import sparse
    S = sparse.coo_matrix((vals, (rows, cols)), shape=(nsmall, nice)).tocsr()
    wS = np.asarray(S.sum(axis=1)).reshape(-1)
    ref = (S @ f.T).T / np.where(wS != 0, wS, 1.0)[None, :]
    got = np.where(wS[None, :] != 0, out, 0.0)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-5)
