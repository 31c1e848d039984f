"""Fused Pallas BDT kernels vs the COO oracle (interpret mode off-TPU).

Covers both apply directions, scaling, masked (NaN) sources, overflow
demotion via a tiny T cap, and the conservation identity.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icebin_tpu.regrid.sparse import WeightedMatrix
from icebin_tpu.ops.pallas_bdt import (pallas_from_weighted, apply_small,
                                       apply_ice)


def synth(nx=256, ny=24, ratio=16, nhc=3, seed=0):
    rng = np.random.default_rng(seed)
    nI = nx * ny
    ii = np.arange(nI)
    ix, iy = ii % nx, ii // nx
    nxa = -(-nx // ratio)
    a = (iy // ratio) * nxa + ix // ratio
    nA = nxa * (-(-ny // ratio))
    elev = rng.uniform(0, 3400, nI)
    hc = np.linspace(0, 3500, nhc)
    k = np.clip(np.searchsorted(hc, elev) - 1, 0, nhc - 2)
    t = (elev - hc[k]) / np.diff(hc)[0]
    area = rng.uniform(20e6, 30e6, nI)
    rows = np.concatenate([a * nhc + k, a * nhc + k + 1])
    cols = np.concatenate([ii, ii])
    vals = np.concatenate([area * (1 - t), area * t])
    keep = rng.uniform(size=len(rows)) > 0.1
    return WeightedMatrix(rows=rows[keep], cols=cols[keep], vals=vals[keep],
                          shape=(nA * nhc, nI))


def oracle_small(M, f):
    f0 = np.where(np.isfinite(f), f, 0.0)
    ref = np.zeros((f.shape[0], M.shape[0]))
    np.add.at(ref.T, M.rows, (M.vals[None, :] * f0[:, M.cols]).T)
    return np.where(M.wM != 0, ref / np.where(M.wM == 0, 1, M.wM), 0.0)


def oracle_ice(M, g):
    ref = np.zeros((g.shape[0], M.shape[1]))
    np.add.at(ref.T, M.cols, (M.vals[None, :] * g[:, M.rows]).T)
    return np.where(M.Mw != 0, ref / np.where(M.Mw == 0, 1, M.Mw), 0.0)


@pytest.mark.parametrize("cap", [None, 2])
def test_pallas_bdt_both_directions(cap):
    M = synth()
    pm = pallas_from_weighted(M, small_axis="rows", nv=8,
                              max_tiles_per_block=cap)
    if cap is not None:
        assert pm.ov_s is not None and pm.ov_s.size > 0
    else:
        assert pm.ov_s is None
    rng = np.random.default_rng(1)
    f = rng.uniform(0.5, 1.5, (8, M.shape[1]))
    f[0, ::7] = np.nan
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5

    g = rng.uniform(0.5, 1.5, (8, M.shape[0]))
    gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
    refI = oracle_ice(M, g)
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5


def test_pallas_bdt_conservation():
    M = synth(seed=3)
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    rng = np.random.default_rng(2)
    f = rng.uniform(1.0, 2.0, (8, M.shape[1]))
    out = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32),
                                 scale=False), np.float64)
    lhs = out.sum(axis=1)
    rhs = (f * M.Mw[None, :]).sum(axis=1)
    assert np.max(np.abs(lhs - rhs) / np.abs(rhs)) < 1e-5


def test_pallas_bdt_single_vector_and_layouts():
    M = synth(seed=5)
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    rng = np.random.default_rng(4)
    f = rng.uniform(0.5, 1.5, M.shape[1])
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f[None, :])[0]
    assert got.shape == (M.shape[0],)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5
    # layout round trips
    fb = pm.ice_to_blocked(jnp.asarray(np.tile(f, (8, 1)), jnp.float32))
    back = np.asarray(pm.blocked_to_ice(fb))
    assert np.allclose(back[0], np.where(np.isfinite(f), f, 0.0), atol=1e-6)
    e = rng.uniform(0.5, 1.5, (8, M.shape[0]))
    e3 = pm.small_to_e3(jnp.asarray(e, jnp.float32))
    asm = np.asarray(pm.e3_to_small(e3))
    assert np.allclose(asm, e, atol=1e-6)


def test_multi_section_accumulator():
    """A matrix spanning > SEC_BLOCKS ice blocks packs into multiple B2'
    accumulator sections (the Antarctica-5km VMEM fix); both directions
    must still match the oracle exactly across section boundaries."""
    from icebin_tpu.ops.pallas_bdt import SEC_BLOCKS, pallas_from_weighted
    rng = np.random.default_rng(5)
    n_i = (SEC_BLOCKS + 300) * 128          # forces 2 sections
    n_s = 3000
    cols = rng.integers(0, n_i, 40000)
    rows = np.clip((cols * n_s // n_i) + rng.integers(-25, 25, cols.size),
                   0, n_s - 1)
    vals = rng.uniform(0.1, 2.0, cols.size)
    key = rows.astype(np.int64) * n_i + cols
    _, idx = np.unique(key, return_index=True)
    M = WeightedMatrix(rows=rows[idx], cols=cols[idx], vals=vals[idx],
                       shape=(n_s, n_i))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    assert pm.nblkpad > pm.sec_blocks          # really multi-section
    assert int(np.asarray(pm.sec_idx).max()) >= 1
    f = rng.uniform(0.5, 1.5, (8, n_i))
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 4e-5
    got6 = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32),
                                  passes=6))
    assert np.max(np.abs(got6 - ref) / (np.abs(ref) + 1e-9)) < 2e-6
    g = rng.uniform(0.5, 1.5, (8, n_s))
    gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
    refI = oracle_ice(M, g)
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5


def test_prods_passes_six_knob():
    """passes=6 (the documented precision=HIGHEST escape hatch for the
    3-pass default) is a per-call STATIC arg: tighter raw accuracy on the
    same tile set."""
    M = synth()
    rng = np.random.default_rng(3)
    f = rng.uniform(0.5, 1.5, (8, M.shape[1]))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    got3 = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32),
                                  passes=3))
    got6 = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32),
                                  passes=6))
    ref = oracle_small(M, f)
    # 6-pass is the tighter contract; both meet the suite gate
    assert np.max(np.abs(got6 - ref) / (np.abs(ref) + 1e-9)) < 2e-6
    assert np.max(np.abs(got3 - ref) / (np.abs(ref) + 1e-9)) < 2e-5


def test_empty_section_returns_zeros():
    """An all-masked contiguous ice span wider than one accumulator section
    must come back as ZEROS from the dest-ice apply, even unscaled -- an
    unvisited section previously returned uninitialized memory (review
    finding)."""
    from icebin_tpu.ops.pallas_bdt import (SEC_BLOCKS, apply_ice_blocked,
                                           pallas_from_weighted)
    rng = np.random.default_rng(9)
    nsec_span = SEC_BLOCKS * 128                # one full empty section
    n_i = 3 * nsec_span                         # [data, EMPTY, data]
    n_s = 2000
    cols = np.concatenate([rng.integers(0, nsec_span, 6000),
                           rng.integers(2 * nsec_span, n_i, 6000)])
    rows = np.clip((cols * n_s // n_i) + rng.integers(-20, 20, cols.size),
                   0, n_s - 1)
    vals = rng.uniform(0.1, 2.0, cols.size)
    key = rows.astype(np.int64) * n_i + cols
    _, idx = np.unique(key, return_index=True)
    M = WeightedMatrix(rows=rows[idx], cols=cols[idx], vals=vals[idx],
                       shape=(n_s, n_i))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8)
    assert pm.nblkpad >= 3 * SEC_BLOCKS
    f = rng.uniform(0.5, 1.5, (8, n_s))
    e3 = pm.small_to_e3(jnp.asarray(f, jnp.float32))
    out = np.asarray(apply_ice_blocked(pm, e3, scale=False))
    # the middle section's blocks: all zeros (no matrix entries there)
    mid = out[SEC_BLOCKS:2 * SEC_BLOCKS]
    assert np.all(mid == 0.0), np.abs(mid).max()
    # and the data sections still match the oracle
    gotI = np.asarray(apply_ice(pm, jnp.asarray(f, jnp.float32)))
    refI = oracle_ice(M, f)
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5


def test_bucket_compaction_sparse_e_space():
    """Round 5: realized windows clustered in FEW buckets of a wide E
    space compact onto present-bucket sections (w_fwd/w_inv maps); both
    apply directions, scaling, and the overflow epilogue still match the
    COO oracle, and NWpad shrinks to the realized span."""
    rng = np.random.default_rng(4)
    n_i = 2048
    n_s = 40000                       # wide logical E space
    e_sec = 512                       # -> 10 logical buckets
    # realized rows in buckets 3 and 7 only
    rows = np.concatenate([rng.integers(3 * 512 * 8, 3 * 512 * 8 + 3000,
                                        4000),
                           rng.integers(7 * 512 * 8, 7 * 512 * 8 + 3000,
                                        4000)])
    cols = rng.integers(0, n_i, rows.size)
    vals = rng.uniform(0.1, 2.0, rows.size)
    key = rows.astype(np.int64) * n_i + cols
    _, idx = np.unique(key, return_index=True)
    M = WeightedMatrix(rows=rows[idx], cols=cols[idx], vals=vals[idx],
                       shape=(n_s, n_i))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8, e_sec=e_sec)
    assert pm.w_fwd is not None and pm.nesec == 2
    assert pm.NWpad <= 2 * e_sec < -(-n_s // 8)
    f = rng.uniform(0.5, 1.5, (8, n_i))
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 4e-5
    got6 = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32),
                                  passes=6))
    assert np.max(np.abs(got6 - ref) / (np.abs(ref) + 1e-9)) < 2e-6
    g = rng.uniform(0.5, 1.5, (8, n_s))
    gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
    refI = oracle_ice(M, g)
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5
    # round trip through the layouts is lossless for realized rows
    e3 = pm.small_to_e3(jnp.asarray(g, jnp.float32))
    back = np.asarray(pm.e3_to_small(e3))
    live = np.zeros(n_s, bool)
    live[M.rows] = True
    np.testing.assert_array_equal(back[:, live],
                                  np.float32(g)[:, live])


def test_overflow_only_bucket_compaction():
    """Review r5 regression: rows realized ONLY through the COO overflow
    (legacy dense-BDT cap path) must keep their E-section bucket PRESENT
    under compaction -- w_fwd==-1 previously clip-redirected the
    contribution to compact window 0."""
    rng = np.random.default_rng(11)
    n_i = 512
    e_sec = 64                         # buckets of 512 small rows
    n_s = 4 * e_sec * 8                # 4 logical buckets
    # dense rows in bucket 0; ONE heavy row in bucket 2 whose windows all
    # demote via a tiny per-block tile cap
    rows = np.concatenate([rng.integers(0, 256, 3000),
                           np.full(200, 2 * e_sec * 8 + 40)])
    cols = np.concatenate([rng.integers(0, n_i, 3000),
                           rng.integers(0, 200, 200)])
    vals = rng.uniform(0.5, 1.5, rows.size)
    key = rows.astype(np.int64) * n_i + cols
    _, idx = np.unique(key, return_index=True)
    M = WeightedMatrix(rows=rows[idx], cols=cols[idx], vals=vals[idx],
                       shape=(n_s, n_i))
    pm = pallas_from_weighted(M, small_axis="rows", nv=8, e_sec=e_sec,
                              max_tiles_per_block=2)
    assert pm.ov_s is not None         # the cap demoted something
    f = rng.uniform(0.5, 1.5, (2, n_i))
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 4e-5
    g = rng.uniform(0.5, 1.5, (2, n_s))
    gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
    refI = oracle_ice(M, g)
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 4e-5


@pytest.mark.parametrize("nv,nvar,ts",
                         [(16, 16, 4), (16, 10, 4), (64, 64, 4),
                          (64, 64, 8)])
def test_pallas_bdt_wide_nv(nv, nvar, ts):
    """Production (nv=16, incl. the coupler's padded 10-field harvest)
    and throughput-mode (nv=64) packs vs the oracle.  The NV-wide kernel
    layouts (fold/unfold lanes, band one-hot, batched A1 contraction)
    are nv-generic but only nv=8 had suite coverage before round 5;
    nv=64 is the measured-best per-field config for wide-field
    (many-tracer / ensemble) Antarctica-scale applies
    (tools/probe_ant_nv.py)."""
    M = synth(seed=7)
    pm = pallas_from_weighted(M, small_axis="rows", nv=nv, ts=ts)
    assert pm.NV == nv and pm.ts == ts
    rng = np.random.default_rng(6)
    f = rng.uniform(0.5, 1.5, (nvar, M.shape[1]))
    f[0, ::7] = np.nan
    got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
    ref = oracle_small(M, f)
    assert got.shape == (nvar, M.shape[0])
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5

    g = rng.uniform(0.5, 1.5, (nvar, M.shape[0]))
    gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
    refI = oracle_ice(M, g)
    assert gotI.shape == (nvar, M.shape[1])
    assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5


def test_pallas_bdt_w8_quantile_cap():
    """Band-cost cap: ``w8_quantile`` shrinks the global W8 band to a
    quantile of the per-chunk window spread, demoting the tail's tiles
    to the COO epilogue (pole-centered sheets otherwise pay the WORST
    chunk's band in every chunk's one-hot matmul).  One rogue block
    spread over the whole small space widens the uncapped band; results
    must match the oracle exactly either way, and the fused scale stays
    on (the epilogue folds the diagonal in)."""
    rng = np.random.default_rng(9)
    n_blk, n_s = 256, 512
    n_i = 128 * n_blk
    ii = np.arange(n_i)
    rows = ((ii // 128) * 4 + rng.integers(0, 4, n_i)) % n_s
    # every 4th block also touches a window half the small space away (a
    # pseudo then holds both, like a pole-adjacent cell's wrap windows) --
    # intra-pseudo spread is what a first-window sort cannot narrow
    far = ((ii // 128) % 4 == 2) & (ii % 128 < 8)
    rows[far] = (rows[far] + n_s // 2) % n_s
    vals = rng.uniform(0.5, 1.5, n_i)
    M = WeightedMatrix(rows=rows, cols=ii, vals=vals, shape=(n_s, n_i))

    pm_full = pallas_from_weighted(M, small_axis="rows", nv=8)
    pm_cap = pallas_from_weighted(M, small_axis="rows", nv=8,
                                  w8_quantile=0.5)
    assert pm_cap.nchunk > 1
    assert pm_cap.W8 < pm_full.W8, (pm_cap.W8, pm_full.W8)
    assert pm_cap.ov_s is not None and pm_cap.ov_s.size > 0

    f = rng.uniform(0.5, 1.5, (8, n_i))
    ref = oracle_small(M, f)
    for pm in (pm_full, pm_cap):
        got = np.asarray(apply_small(pm, jnp.asarray(f, jnp.float32)))
        assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5

    g = rng.uniform(0.5, 1.5, (8, n_s))
    refI = oracle_ice(M, g)
    for pm in (pm_full, pm_cap):
        gotI = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32)))
        assert np.max(np.abs(gotI - refI) / (np.abs(refI) + 1e-9)) < 2e-5
