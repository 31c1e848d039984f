"""E-section-split fused kernels: global-EC-class E spaces on the Pallas
path (r5; through r4 these raised at pack time and fell back to XLA).

The pack groups pseudo-blocks E-section-major and each section becomes one
kernel call per direction (``ops.pallas_bdt`` ``E_SEC``/``egroups``).  The
tests force tiny sections (``e_sec`` override) so multi-group layouts are
exercised on the CPU-interpret path, and pin:

* both apply directions against a dense f64 reference, scaled and raw;
* chunk bands clamped inside their section (the near-section-end case);
* E sections with no entries returning exact zeros;
* round-trip conservation through the weighted sums (the ledger measure);
* single-section packs reducing to one group (the unchanged r4 layout).

Reference parity: ``ibmisc linear::Weighted_Eigen::apply_M`` [U] at
``global_ec``-class matrix widths (SURVEY.md §2 'linear::Weighted',
'TOPO pipeline' global EC matrices).
"""
import numpy as np
import pytest

from icebin_tpu.ops.pallas_bdt import (apply_ice, apply_small,
                                       pallas_from_weighted)
from icebin_tpu.regrid.sparse import WeightedMatrix


def _random_matrix(rng, nsmall, nice, nnz, banded=False):
    if banded:
        # geographically local: each ice col hits small rows near a
        # moving diagonal (the shape regrid matrices actually have)
        cols = rng.integers(0, nice, nnz)
        center = (cols * nsmall) // nice
        rows = np.clip(center + rng.integers(-40, 41, nnz), 0, nsmall - 1)
    else:
        rows = rng.integers(0, nsmall, nnz)
        cols = rng.integers(0, nice, nnz)
    vals = rng.uniform(0.1, 2.0, nnz)
    # dedup (rows, cols) the way the accumulators do
    key = rows.astype(np.int64) * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    v = np.bincount(inv, weights=vals)
    return WeightedMatrix(rows=(uk // nice).astype(np.int64),
                          cols=(uk % nice).astype(np.int64),
                          vals=v, shape=(nsmall, nice))


def _dense(M):
    d = np.zeros(M.shape)
    d[M.rows, M.cols] = M.vals
    return d


def _check_both(pm, M, rng, atol=1e-4):
    dense = _dense(M)
    nsmall, nice = M.shape
    wS, wI = dense.sum(1), dense.sum(0)

    f = rng.uniform(-1.0, 1.0, (3, nice)).astype(np.float32)
    ref_raw = (dense @ f.T).T
    out_raw = np.asarray(apply_small(pm, f, scale=False))
    assert np.allclose(out_raw, ref_raw, atol=atol)
    ref = ref_raw / np.where(wS == 0, 1.0, wS)[None, :]
    out = np.asarray(apply_small(pm, f, scale=True))
    assert np.allclose(out, ref, atol=atol)

    g = rng.uniform(-1.0, 1.0, (3, nsmall)).astype(np.float32)
    refi_raw = (dense.T @ g.T).T
    outi_raw = np.asarray(apply_ice(pm, g, scale=False))
    assert np.allclose(outi_raw, refi_raw, atol=atol)
    refi = refi_raw / np.where(wI == 0, 1.0, wI)[None, :]
    outi = np.asarray(apply_ice(pm, g, scale=True))
    assert np.allclose(outi, refi, atol=atol)


def test_multi_esec_random():
    """Many E sections x several ice sections, dense random sparsity."""
    rng = np.random.default_rng(0)
    nsmall, nice = 2000, 1500                      # NW = 250 windows
    M = _random_matrix(rng, nsmall, nice, 6000)
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=64,
                              sec_blocks=4)        # 250/64 -> 4 E sections
    assert pm.nesec == 4
    assert len(pm.egroups) >= 2
    # groups are disjoint ascending chunk ranges covering every chunk
    c = 0
    for (c0, c1, e, lo, hi) in pm.egroups:
        assert c0 == c and c1 > c0
        c = c1
    assert c == pm.nchunk
    _check_both(pm, M, rng)


def test_multi_esec_banded_conservation():
    """Banded (regrid-shaped) sparsity; round-trip conservation through
    the weighted sums holds to f32 resolution across the section split."""
    rng = np.random.default_rng(1)
    nsmall, nice = 4096, 2048
    M = _random_matrix(rng, nsmall, nice, 12000, banded=True)
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=128,
                              sec_blocks=8)
    assert pm.nesec == 4
    _check_both(pm, M, rng)
    # conservation: sum_s wS*apply_small(f) == sum_i wI*f for any field
    dense = _dense(M)
    wS, wI = dense.sum(1), dense.sum(0)
    f = rng.uniform(0.5, 1.5, (1, nice)).astype(np.float32)
    out = np.asarray(apply_small(pm, f, scale=True), np.float64)
    lhs = float((out[0] * wS).sum())
    rhs = float((f[0].astype(np.float64) * wI).sum())
    assert abs(lhs - rhs) / abs(rhs) < 1e-5

    # the f64 repair the coupler applies on weighted sums stays exact:
    # the raw kernel error is in the unweighted values only
    out_raw = np.asarray(apply_small(pm, f, scale=False), np.float64)
    assert abs(out_raw.sum() - (dense @ f[0]).sum()) \
        / abs(out_raw.sum()) < 1e-5


def test_empty_esec_rows_are_zero():
    """E sections with no matrix entries return exact zeros (the apply
    substitutes a zeros block for absent groups)."""
    rng = np.random.default_rng(2)
    nsmall, nice = 3072, 512                       # NW=384 -> 6 sections
    # entries only in sections 0 and 4 (windows [0,64) and [256,320))
    rows = np.concatenate([rng.integers(0, 512, 800),
                           rng.integers(2048, 2560, 800)]).astype(np.int64)
    cols = rng.integers(0, nice, 1600).astype(np.int64)
    key = rows * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    M = WeightedMatrix(rows=(uk // nice), cols=(uk % nice),
                       vals=np.bincount(inv, weights=np.ones(1600)),
                       shape=(nsmall, nice))
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=64)
    # round 5: the two PRESENT buckets (logical sections 0 and 4) COMPACT
    # onto slots 0 and 1 (w_fwd/w_inv maps); dead sections don't exist in
    # the pack at all, so their rows are zeros by construction
    assert pm.nesec == 2 and pm.w_fwd is not None
    assert sorted(g[2] for g in pm.egroups) == [0, 1]
    f = rng.uniform(0.5, 1.5, (2, nice)).astype(np.float32)
    out = np.asarray(apply_small(pm, f, scale=False))
    assert np.all(out[:, 512:2048] == 0.0)
    assert np.all(out[:, 2560:] == 0.0)
    _check_both(pm, M, rng)


def test_band_clamp_near_section_end():
    """A chunk whose natural band would cross its section end gets its
    base pulled down; results are unchanged."""
    rng = np.random.default_rng(3)
    nsmall, nice = 1024, 256                       # NW=128; e_sec=64
    # all entries in windows [56, 64): the last window-8 of section 0
    rows = rng.integers(56 * 8, 64 * 8, 500).astype(np.int64)
    cols = rng.integers(0, nice, 500).astype(np.int64)
    key = rows * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    M = WeightedMatrix(rows=(uk // nice), cols=(uk % nice),
                       vals=np.bincount(inv, weights=np.ones(500)),
                       shape=(nsmall, nice))
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=64)
    # round 5: only logical section 0 is present -> compacted single call
    assert pm.nesec == 1 and pm.w_fwd is not None
    b = np.asarray(pm.base)[:pm.nchunk]
    assert int(b.max()) + pm.W8 <= 64              # clamped inside section
    _check_both(pm, M, rng)


def test_single_section_unchanged():
    """Small E spaces keep the one-call layout: one group covering every
    chunk and the full ice-section range."""
    rng = np.random.default_rng(4)
    M = _random_matrix(rng, 640, 640, 3000)
    pm = pallas_from_weighted(M, small_axis="rows")
    assert pm.nesec == 1
    assert pm.egroups == ((0, pm.nchunk, 0, 0,
                           pm.nblkpad // pm.sec_blocks),)
    _check_both(pm, M, rng)


def test_coupler_auto_engine_no_gate():
    """The coupler's auto engine no longer falls back to XLA for wide E
    spaces (it only routes by backend now)."""
    import inspect
    from icebin_tpu.coupler import coupler as C
    src = inspect.getsource(C.IceSheetCoupler._engine)
    assert "NWPAD_MAX" not in src


def test_coupler_wide_E_pallas_end_to_end():
    """A global-EC-class E space (wider than one E3 section) runs the
    PRODUCTION coupler on the Pallas engine end-to-end: packs multi-
    section, transports correctly (IvE matches the canonical oracle),
    and the ledger conservation holds."""
    import jax.numpy as jnp
    from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
    from icebin_tpu.ops.pallas_bdt import E_SEC
    from icebin_tpu.regrid.gcmregridder import GCMRegridder

    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 97),
                           latb=np.linspace(30.0, 80.0, 97))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 33),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 33),
                       projection=PlateCarree(scale=scale))
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    gr.add_sheet("s", specI, subdiv=1)
    assert gr.nE > E_SEC * 8                   # wider than one section
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=10, engine="pallas")
    cp = GCMCoupler(gr, cfg)
    sc = cp.sheets["s"]
    vw = sc.mat("IvE")
    assert vw.pm.nesec >= 2                    # multi-section pack engaged

    # transport parity vs the canonical matrix oracle
    rng = np.random.default_rng(5)
    fE = rng.uniform(1.0, 2.0, gr.nE)
    got = np.asarray(sc.apply("IvE", jnp.asarray(fE)), np.float64)
    ref = sc.rm.matrix("IvE", cfg.params).apply(fE, scale=True,
                                                fill=np.nan)
    m = np.isfinite(ref)
    np.testing.assert_allclose(np.where(m, got, 0.0),
                               np.where(m, ref, 0.0),
                               rtol=2e-5, atol=1e-7 * np.abs(ref[m]).max())

    # one production step: books must balance
    f = np.zeros((8, gr.nE), np.float32)
    f[0] = 1e-5 * rng.uniform(0.5, 1.0, gr.nE)
    f[4] = -10.0
    cp.couple({"s": jnp.asarray(f)})
    row = cp.ledger.to_rows()[-1]
    rel = abs(row["s.mass_in_E"] - row["s.mass_delivered_I"]) \
        / abs(row["s.mass_in_E"])
    assert rel < 1e-10


def test_one_group_fast_path_config3_shape():
    """The round-4 one-group fast path (config #3's shape: nesec > 1 but
    every realized window in ONE section): dest-ice returns the kernel's
    scaled partial padded with exact zeros -- no cross-group sum -- and
    both directions match the dense reference."""
    rng = np.random.default_rng(7)
    nsmall, nice = 2048, 1024                     # NW=256 -> 4 sections
    # entries ONLY in section 2 (windows [128, 192) = rows [1024, 1536))
    n = 1200
    rows = rng.integers(1024, 1536, n).astype(np.int64)
    cols = rng.integers(0, nice, n).astype(np.int64)
    key = rows * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    M = WeightedMatrix(rows=(uk // nice), cols=(uk % nice),
                       vals=np.bincount(inv, weights=np.ones(n)),
                       shape=(nsmall, nice))
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=64, sec_blocks=4)
    # round 5: the single present bucket (logical section 2) COMPACTS to
    # slot 0 -- the one-group fast path became a genuinely single-section
    # pack; zeros outside the section come from the e3<->small maps
    assert pm.nesec == 1 and pm.w_fwd is not None
    assert len(pm.egroups) == 1 and pm.egroups[0][2] == 0
    _check_both(pm, M, rng)
    # dest-small: rows outside the group's section are exact zeros
    f = rng.uniform(0.5, 1.5, (2, nice)).astype(np.float32)
    out = np.asarray(apply_small(pm, f, scale=False))
    assert np.all(out[:, :1024] == 0.0)
    assert np.all(out[:, 1536:] == 0.0)


def test_one_group_partial_ice_coverage():
    """Per-group partial ice coverage (lo > 0): two present buckets whose
    groups each touch only ONE ice section; the untouched ice blocks come
    back as exact zeros through the cross-group partial sum, and values
    match the dense reference."""
    rng = np.random.default_rng(8)
    nsmall, nice = 2048, 1024
    n = 900
    # bucket 1 -> isec 0; bucket 3 -> isec 1 (two present buckets)
    rows = np.concatenate([rng.integers(512, 1024, n),
                           rng.integers(1536, 2048, n)]).astype(np.int64)
    cols = np.concatenate([rng.integers(0, 512, n),
                           rng.integers(512, 1024, n)]).astype(np.int64)
    key = rows * nice + cols
    uk, inv = np.unique(key, return_inverse=True)
    M = WeightedMatrix(rows=(uk // nice), cols=(uk % nice),
                       vals=np.bincount(inv, weights=np.ones(2 * n)),
                       shape=(nsmall, nice))
    pm = pallas_from_weighted(M, small_axis="rows", e_sec=64, sec_blocks=4)
    assert pm.nesec == 2 and len(pm.egroups) == 2
    (_, _, e0, lo0, hi0), (_, _, e1, lo1, hi1) = pm.egroups
    assert (e0, e1) == (0, 1)
    assert lo0 == 0 and hi0 == 1 and lo1 == 1 and hi1 == 2
    _check_both(pm, M, rng)
    # a field alive ONLY in bucket 3's rows reaches ONLY isec 1 cells
    g = np.zeros((2, nsmall), np.float32)
    g[:, 1536:] = rng.uniform(0.5, 1.5, (2, 512)).astype(np.float32)
    outi = np.asarray(apply_ice(pm, g, scale=False))
    assert np.all(outi[:, :512] == 0.0)
    assert np.any(outi[:, 512:] != 0.0)
