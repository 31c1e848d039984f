"""Raw (unrepaired) Pallas apply accuracy contract (VERDICT r2 item #8).

The default dest-small kernel runs a 3-pass split-bf16 MXU contraction
(~4e-6 raw relative error); INTENSIVE fields (temperature) are NOT mass-
repaired, so that error reaches the ice model.  These tests pin the bound
and the ``CouplerConfig.prods_passes`` knob that restores ~1e-7
(precision=HIGHEST) for accuracy-critical runs.
"""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler, \
    IceSheetCoupler
from icebin_tpu.ops.pallas_bdt import apply_small, pallas_from_weighted
from icebin_tpu.regrid.matrices import RegridParams
from tests.helpers import toy_elevmask, toy_regridder

BOUND_3PASS = 1e-5      # documented contract: ~4e-6 measured on-chip
BOUND_6PASS = 5e-7      # precision=HIGHEST: ~1e-7 measured on-chip


def _setup():
    gr = toy_regridder(nI=(96, 96))
    elev = toy_elevmask(gr.sheets["toy"].specI)
    rm = gr.regrid_matrices("toy", elev)
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    pm = pallas_from_weighted(Me, small_axis="rows", nv=8)
    rng = np.random.default_rng(0)
    # temperature-like intensive field: offset + small variation
    f = 260.0 + rng.uniform(0.0, 30.0, Me.shape[1])
    M = sp.coo_matrix((Me.vals, (Me.rows, Me.cols)), shape=Me.shape).tocsr()
    wM = np.asarray(Me.wM)
    ref = np.where(wM > 0, (M @ f) / np.where(wM > 0, wM, 1.0), 0.0)
    return pm, Me, f, ref, wM


def test_intensive_raw_error_bounds():
    pm, Me, f, ref, wM = _setup()
    fj = jnp.asarray(f, jnp.float32)
    scale = np.abs(ref).max()
    errs = {}
    for passes, bound in ((3, BOUND_3PASS), (6, BOUND_6PASS)):
        out = np.asarray(apply_small(pm, fj, scale=True, passes=passes),
                         np.float64)
        err = np.abs(np.where(wM > 0, out, 0.0) - ref).max() / scale
        errs[passes] = err
        assert err < bound, f"passes={passes}: raw error {err:.2e}"
    # the 6-pass path is strictly tighter than the default
    assert errs[6] < errs[3]


def test_coupler_prods_passes_knob():
    """CouplerConfig.prods_passes reaches the kernels: a 6-pass coupler
    produces a (slightly) different ice->GCM elevation transport than the
    default 3-pass one, and both couple cleanly.  The quantitative bounds
    are pinned by test_intensive_raw_error_bounds; this guards the
    plumbing (the knob silently not reaching the kernel would keep the
    trajectories bit-identical)."""
    outs = {}
    for passes in (3, 6):
        gr = toy_regridder(nI=(64, 64))
        cfg = CouplerConfig(engine="pallas", prods_passes=passes,
                            regen_every=1 << 30, repair=False)
        sc = IceSheetCoupler(gr, "toy", cfg)
        cp = GCMCoupler(gr, cfg, sheets={"toy": sc})
        rng = np.random.default_rng(1)
        fE = np.zeros((8, gr.nE))
        fE[0] = 1e-6 * rng.uniform(0.5, 1.0, gr.nE)
        fE[4] = rng.uniform(-30.0, -5.0, gr.nE)     # degC, cold (no melt)
        r = cp.couple({"toy": jnp.asarray(fE, jnp.float32)})
        out = np.asarray(r["toy"]["fE_out"][0], np.float64)   # elevation
        assert np.isfinite(out).any()
        outs[passes] = np.where(np.isfinite(out), out, 0.0)
    # different MXU pass structure -> different rounding; identical
    # results would mean the knob never reached the kernel
    assert not np.array_equal(outs[3], outs[6])
    scale = np.abs(outs[6]).max()
    assert np.abs(outs[3] - outs[6]).max() / scale < BOUND_3PASS


def test_device_tunables_table():
    """Kernel tunables resolve by device kind (v5p readiness, VERDICT r2
    item #9): the table covers the named chips and the default, and the
    lazy installer sets sane module globals."""
    from icebin_tpu.ops import pallas_bdt as pb
    from icebin_tpu.ops.tuning import apply_tunables, tunables_for
    for kind in ("TPU v5 lite", "TPU v5e", "TPU v5p", "TPU v4", "cpu", ""):
        t = tunables_for(kind)
        assert set(t) == {"ps_chunk", "sec_blocks", "w8_cap",
                          "vmem_limit"}
        assert t["ps_chunk"] in (64, 128, 256)
        assert t["vmem_limit"] >= 16 * 1024 * 1024
    # v4-class chips get a smaller scoped-VMEM budget than v5e (round 5)
    assert (tunables_for("TPU v4")["vmem_limit"]
            < tunables_for("TPU v5e")["vmem_limit"])
    t = apply_tunables("TPU v5p")
    assert pb.PS_CHUNK == t["ps_chunk"]
    assert pb.SEC_BLOCKS == t["sec_blocks"]
    assert pb.W8_CAP == t["w8_cap"]
    assert pb.VMEM_LIMIT == t["vmem_limit"]


def test_huge_E_space_sectioned():
    """E spaces beyond one VMEM-resident E3 section no longer gate the
    Pallas path: the pack splits into per-E-section kernel calls (r5; was
    a hard ValueError through r4).  Both directions match the f64 COO
    reference."""
    from icebin_tpu.ops.pallas_bdt import (E_SEC, apply_ice, apply_small,
                                           pallas_from_weighted)
    from icebin_tpu.regrid.sparse import WeightedMatrix
    nsmall = (E_SEC + 8) * 8              # one window past one section
    n = 4096
    rng = np.random.default_rng(7)
    rows = np.linspace(0, nsmall - 1, n).astype(np.int64)
    vals = rng.uniform(0.5, 1.5, n)
    M = WeightedMatrix(rows=rows, cols=np.arange(n, dtype=np.int64),
                       vals=vals, shape=(nsmall, n))
    pm = pallas_from_weighted(M, small_axis="rows")
    assert pm.nesec == 2 and len(pm.egroups) == 2

    dense = np.zeros((nsmall, n))
    dense[rows, np.arange(n)] = vals
    wS, wI = dense.sum(1), dense.sum(0)

    f = rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32)
    ref = (dense @ f.T).T / np.where(wS == 0, 1.0, wS)[None, :]
    out = np.asarray(apply_small(pm, f, scale=True))
    assert np.allclose(out, ref, atol=1e-4)

    g = rng.uniform(-1.0, 1.0, (2, nsmall)).astype(np.float32)
    refi = (dense.T @ g.T).T / np.where(wI == 0, 1.0, wI)[None, :]
    outi = np.asarray(apply_ice(pm, g, scale=True))
    assert np.allclose(outi, refi, atol=1e-4)


def test_ice_passes_knob():
    """apply_ice's A1 accuracy knob (round 5): 3-pass is looser but
    bounded, 6-pass (the default -- the coupler's 1e-7 forcing contract)
    is strictly tighter."""
    import jax.numpy as jnp
    from icebin_tpu.ops.pallas_bdt import apply_ice
    pm, Me, f, _, _ = _setup()
    g = np.random.default_rng(7).uniform(0.5, 1.5, (2, Me.shape[0]))
    dense = np.zeros(Me.shape)
    dense[Me.rows, Me.cols] = Me.vals
    wI = dense.sum(0)
    ref = (dense.T @ g.T).T / np.where(wI == 0, 1.0, wI)[None, :]
    scale = np.abs(ref).max()
    errs = {}
    for passes in (3, 6, None):
        out = np.asarray(apply_ice(pm, jnp.asarray(g, jnp.float32),
                                   passes=passes), np.float64)
        errs[passes] = np.abs(np.where(wI[None, :] > 0, out, 0.0)
                              - ref).max() / scale
    assert errs[6] == errs[None]          # None == HIGHEST default
    assert errs[6] < BOUND_6PASS
    # the dest-ice K=32 contraction's 3-pass error runs a bit above the
    # dest-small bound (measured ~1.5e-5 on this toy)
    assert errs[3] < 5e-5
    assert errs[6] < errs[3]
