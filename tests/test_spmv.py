"""Device apply (COO segment-sum and ELL) vs the host f64 oracle."""
import numpy as np
import jax.numpy as jnp

from icebin_tpu.ops.spmv import DeviceCOO, DeviceELL, apply_ell, apply_matrix
from icebin_tpu.regrid.matrices import RegridParams

from helpers import toy_elevmask, toy_regridder

P = RegridParams(scale=True, correctA=True)


def setup(name):
    gr = toy_regridder(nI=(50, 50), nA=(5, 5))
    elev = toy_elevmask(gr.sheets["toy"].specI)
    rm = gr.regrid_matrices("toy", elev)
    return rm.matrix(name, P)


def test_coo_apply_matches_host():
    M = setup("EvI")
    dm = DeviceCOO.from_weighted(M, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    f = rng.uniform(1, 2, (3, M.shape[1]))
    got = np.asarray(apply_matrix(dm, jnp.asarray(f), scale=True))
    want = M.apply(f, scale=True)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-13)
    assert np.isnan(got[~ok]).all()


def test_coo_apply_single_field_and_units():
    M = setup("IvA")
    dm = DeviceCOO.from_weighted(M, dtype=jnp.float64)
    f = np.linspace(0, 1, M.shape[1])
    got = np.asarray(apply_matrix(dm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-13)
    # fused affine unit conversion
    got2 = np.asarray(apply_matrix(dm, jnp.asarray(f[None, :]),
                                   var_factor=jnp.asarray([2.0]),
                                   var_offset=jnp.asarray([1.0])))[0]
    np.testing.assert_allclose(got2[ok], want[ok] * 2 + 1, rtol=1e-13)


def test_ell_apply_matches_host_small_K():
    M = setup("IvE")  # ice-destination: small nnz/row
    counts = np.bincount(M.rows, minlength=M.shape[0])
    dm = DeviceELL.from_weighted(M, K=int(counts.max()), dtype=jnp.float64)
    assert dm.ov is None
    rng = np.random.default_rng(1)
    f = rng.uniform(1, 2, (4, M.shape[1]))
    got = np.asarray(apply_ell(dm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-13)


def test_ell_overflow_path():
    M = setup("AvI")  # A-destination: rows far wider than K
    dm = DeviceELL.from_weighted(M, K=4, dtype=jnp.float64)
    assert dm.ov is not None and dm.ov.nnz > 0
    f = np.cos(np.arange(M.shape[1]) * 0.01) + 2
    got = np.asarray(apply_ell(dm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-13)


def test_f32_accuracy():
    M = setup("AvI")
    dm = DeviceCOO.from_weighted(M, dtype=jnp.float32)
    f = np.cos(np.arange(M.shape[1]) * 0.01) + 2
    got = np.asarray(apply_matrix(dm, jnp.asarray(f, jnp.float32)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-5)


# -- BDT format ------------------------------------------------------------

def _bdt_case(name, small_axis, **kw):
    from icebin_tpu.ops.bdt import apply_bdt, bdt_from_weighted
    M = setup(name)
    kw.setdefault("dtype", jnp.float64)
    bm = bdt_from_weighted(M, small_axis=small_axis, **kw)
    rng = np.random.default_rng(7)
    f = rng.uniform(1, 2, (3, M.shape[1]))
    got = np.asarray(apply_bdt(bm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)
    assert np.isnan(got[~ok]).all()
    return bm


def test_bdt_dest_small():
    bm = _bdt_case("EvI", "rows")
    assert not bm.transposed


def test_bdt_dest_small_A():
    _bdt_case("AvI", "rows")


def test_bdt_dest_ice():
    bm = _bdt_case("IvE", "cols")
    assert bm.transposed


def test_bdt_dest_ice_A():
    _bdt_case("IvA", "cols")


def test_bdt_overflow_spill():
    from icebin_tpu.ops.bdt import apply_bdt, bdt_from_weighted
    M = setup("EvI")
    bm = bdt_from_weighted(M, small_axis="rows", max_tiles_per_block=1,
                           dtype=jnp.float64)
    assert bm.ov_rows is not None
    f = np.cos(np.arange(M.shape[1]) * 0.01) + 2
    got = np.asarray(apply_bdt(bm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)


def test_bdt_nan_source_zeroed():
    """NaN source entries must not contaminate via dense-tile zeros."""
    from icebin_tpu.ops.bdt import apply_bdt, bdt_from_weighted
    M = setup("AvI")
    bm = bdt_from_weighted(M, small_axis="rows", dtype=jnp.float64)
    f = np.ones(M.shape[1])
    f[::7] = np.nan
    got = np.asarray(apply_bdt(bm, jnp.asarray(f)))
    f0 = np.where(np.isfinite(f), f, 0.0)
    want = M.apply(f0)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)


def test_bdt_transposed_apply_shares_tiles():
    """One tile set serves both directions: apply_bdt_T(EvI) == IvE apply."""
    from icebin_tpu.ops.bdt import apply_bdt, apply_bdt_T, bdt_from_weighted
    M = setup("EvI")
    Mt = M.transpose()
    bm = bdt_from_weighted(M, small_axis="rows", dtype=jnp.float64)
    rng = np.random.default_rng(11)
    fE = rng.uniform(1, 2, (3, M.shape[0]))
    got = np.asarray(apply_bdt_T(bm, jnp.asarray(fE)))
    want = Mt.apply(fE)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)
    assert np.isnan(got[~ok]).all()
    # and the forward direction still works on the same object
    fI = rng.uniform(1, 2, M.shape[1])
    got2 = np.asarray(apply_bdt(bm, jnp.asarray(fI)))
    want2 = M.apply(fI)
    ok2 = np.isfinite(want2)
    np.testing.assert_allclose(got2[ok2], want2[ok2], rtol=1e-12)


def test_bdt_smoothed_matrix():
    """Device apply of a sigma-smoothed matrix (denser stencil composition)."""
    from icebin_tpu.ops.bdt import apply_bdt, bdt_from_weighted
    from helpers import toy_elevmask, toy_regridder
    gr = toy_regridder(nI=(48, 48), nA=(5, 5))
    specI = gr.sheets["toy"].specI
    elev = toy_elevmask(specI)
    rm = gr.regrid_matrices("toy", elev)
    dx = float(np.diff(specI.xb)[0])
    M = rm.matrix("IvE", RegridParams(scale=True, correctA=False,
                                      sigma=(2 * dx, 2 * dx)))
    bm = bdt_from_weighted(M, small_axis="cols", dtype=jnp.float64)
    rng = np.random.default_rng(21)
    f = rng.uniform(1, 2, (2, M.shape[1]))
    got = np.asarray(apply_bdt(bm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)
