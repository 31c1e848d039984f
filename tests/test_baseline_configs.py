"""BASELINE.json configs #1-#5, each as an explicit acceptance test.

These are deliberately thin: every mechanism is covered in depth elsewhere;
this file maps the driver's config list 1:1 to runnable acceptance checks
(SURVEY.md section 7: 'configs 1->5 map 1:1 to stages')."""
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from icebin_tpu import GCMRegridder, RegridParams, make_exchange_grid
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY, modele_lonlat_grid

from helpers import toy_elevmask

P = RegridParams(scale=True, correctA=True)


def conserves(M, rng, rtol=1e-10):
    f = rng.uniform(1.0, 2.0, M.shape[1])
    out = M.apply(f)
    lhs = np.sum(np.where(np.isfinite(out), out, 0.0) * M.wM)
    assert abs(lhs - np.sum(f * M.Mw)) <= rtol * abs(lhs)
    return out


def test_config1_cartesian_100x100_vs_8x10():
    """#1: Cartesian 100x100 ice grid <-> 8x10 lat-lon GCM grid, single
    field, no elevation classes (CPU ref)."""
    specA = GridSpecLonLat(lonb=np.linspace(0, 40, 9),
                           latb=np.linspace(30, 80, 11))
    specI = GridSpecXY(xb=np.linspace(0, 40, 101), yb=np.linspace(30, 80, 101),
                       projection=PlateCarree())
    xg = make_exchange_grid(specA, specI, subdiv=1, engine="numpy")
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-12)
    gr = GCMRegridder(specA, hcdefs=[0.0])          # no elevation classes
    gr.add_sheet("ice", specI, exchange=xg)
    rm = gr.regrid_matrices("ice", np.zeros(specI.ncells))  # all iced at z=0
    rng = np.random.default_rng(1)
    AvI = rm.matrix("AvI", P)
    IvA = rm.matrix("IvA", P)
    fA = conserves(AvI, rng, 1e-12)
    conserves(IvA, rng, 1e-12)
    # round-trip mass identity (100/8 = 12.5: ice cells straddle A
    # boundaries, so values smooth but mass is exact)
    fI = IvA.apply(np.where(np.isfinite(fA), fA, 0.0))
    fA2 = AvI.apply(np.where(np.isfinite(fI), fI, 0.0))
    m0 = np.sum(np.where(np.isfinite(fA), fA, 0.0) * AvI.wM)
    m2 = np.sum(np.where(np.isfinite(fA2), fA2, 0.0) * AvI.wM)
    np.testing.assert_allclose(m2, m0, rtol=1e-12)


def test_config2_searise20_modele_roundtrip():
    """#2: SeaRISE Greenland 20 km <-> ModelE 2x2.5 with 5 elevation
    classes, IvA + AvI round trip."""
    sys.path.insert(0, "/root/repo/grids")
    from searise import searise_grid
    specA = modele_lonlat_grid(144, 90)
    specI = searise_grid(20.0)
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
    gr.add_sheet("greenland", specI, subdiv=2)
    elev = toy_elevmask(specI, ice_frac=0.6)
    rm = gr.regrid_matrices("greenland", elev)
    rng = np.random.default_rng(2)
    AvI = rm.matrix("AvI", P)
    IvA = rm.matrix("IvA", P)
    conserves(AvI, rng)
    conserves(IvA, rng)
    # mass-weighted round trip (north star < 1e-10 relative)
    fI = rng.uniform(0, 3, AvI.shape[1])
    fA = AvI.apply(fI)
    fI2 = IvA.apply(np.where(np.isfinite(fA), fA, 0.0))
    m0 = np.sum(fI * AvI.Mw)
    m2 = np.sum(np.where(np.isfinite(fI2), fI2, 0.0) * IvA.wM)
    assert abs(m2 - m0) / abs(m0) < 1e-10


def test_config3_greenland5km_full_set_scaled_down():
    """#3: Greenland 5 km <-> ModelE 2x2.5, full A/E/I matrix set with
    masking and area weights.  The full 5 km build runs in bench.py on the
    chip; here the identical path at 10 km keeps CI fast."""
    sys.path.insert(0, "/root/repo/grids")
    from searise import searise_grid
    specA = modele_lonlat_grid(144, 90)
    specI = searise_grid(10.0)
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3500.0])
    gr.add_sheet("greenland", specI, subdiv=2)
    elev = toy_elevmask(specI, ice_frac=0.6)
    rm = gr.regrid_matrices("greenland", elev)
    rng = np.random.default_rng(3)
    for name in ("AvI", "IvA", "EvI", "IvE", "AvE", "EvA"):
        conserves(rm.matrix(name, P), rng)
    # device apply of the full set at this scale
    from icebin_tpu.ops.bdt import apply_bdt, apply_bdt_T, bdt_from_weighted
    M = rm.matrix("EvI", P)
    bm = bdt_from_weighted(M, small_axis="rows", dtype=jnp.float64)
    f = rng.uniform(1, 2, (4, M.shape[1]))
    got = np.asarray(apply_bdt(bm, jnp.asarray(f)))
    want = M.apply(f)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)


def test_config4_transient_100_steps():
    """#4: transient coupling loop, conservation tracked per step.  100
    steps at reduced grid size (the per-step machinery is size-blind)."""
    from test_coupler import forcing, make_coupler
    cp = make_coupler(n_ice=24, regen_every=10)
    cp.run_transient(lambda t, s: forcing(t, s, coupler=cp), 100)
    rows = cp.ledger.to_rows()
    assert len(rows) == 100
    worst = max(abs(r["toy.mass_in_E"] - r["toy.mass_delivered_I"])
                / abs(r["toy.mass_in_E"]) for r in rows)
    assert worst < 1e-10


def test_config5_multisheet_sharded():
    """#5: multi-sheet <-> global GCM, domain-decomposed build + apply
    (single-host virtual mesh; see tests/test_multisheet.py and
    test_parallel.py for the component checks)."""
    from test_multisheet import build_two_sheet_regridder
    from test_parallel import setup_sharded
    from icebin_tpu.parallel.coupled import (make_sharded_step,
                                             shard_coupled_setup)
    from icebin_tpu.parallel.mesh import make_mesh

    # two sheets under one regridder...
    gr2 = build_two_sheet_regridder(res_km=150.0)
    assert set(gr2.sheets) == {"greenland", "antarctica"}
    # ...and the decomposed apply path executes on the 8-device mesh
    gr, ice_cfg, state, ive, evi = setup_sharded()
    mesh = make_mesh(8)
    ops, _ = shard_coupled_setup(mesh, ive, evi, state, ice_cfg)
    fn = make_sharded_step(mesh, ice_cfg, gr.nE, 86400.0 * 30)
    fE = jnp.asarray(np.zeros((2, gr.nE)), jnp.float32)
    H1, fI, fE_out = fn(ops["ive_tiles"], ops["ive_rs"], ops["ive_wI"],
                        ops["evi_tiles"], ops["evi_rs"], ops["evi_wS"],
                        ops["H"], ops["bed"], fE,
                        jnp.ones(2, jnp.float32), jnp.zeros(2, jnp.float32))
    assert np.isfinite(np.asarray(H1)).all()
