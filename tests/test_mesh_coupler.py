"""Mesh-decomposed PRODUCTION coupler (VERDICT round-1 items #2 and #8).

One coupler, every feature: the sharded Pallas SpMM applies and the
halo-ring SIA step run under the SAME f64 ledger / mass repair / regen
cadence / E1vE0 / writer / checkpoint machinery as the single-device path.
Oracles: per-step conservation < 1e-10 (config #4, 100 steps), trajectory
equivalence with the single-device Pallas coupler, two-sheet config #5.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler
from icebin_tpu.coupler.sharded import MeshIceSheetCoupler
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.parallel.mesh import make_mesh
from icebin_tpu.regrid.gcmregridder import GCMRegridder


def make_gr(n_ice=32, sheets=("toy",), scale=25e3):
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 7))
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    for k, name in enumerate(sheets):
        # offset windows so multi-sheet configs cover distinct ice domains
        x0 = 2.0 + 18.0 * k
        specI = GridSpecXY(
            xb=np.linspace(x0 * scale, (x0 + 16.0) * scale, n_ice + 1),
            yb=np.linspace(40.0 * scale, 72.0 * scale, n_ice + 1),
            projection=PlateCarree(scale=scale))
        gr.add_sheet(name, specI, subdiv=1)
    return gr


def forcing(t, nE, seed_extra=0):
    rng = np.random.default_rng((int(t) + seed_extra) % 100003)
    f = np.zeros((8, nE))
    f[0] = 1e-5 * rng.uniform(0.5, 1.0, nE)
    f[1] = 5.0
    f[3] = 2.0
    f[4] = -10.0
    return jnp.asarray(f)


def check_ledger_closure(rows, sheet):
    prev_mass = None
    for r in rows:
        m_in = r[f"{sheet}.mass_in_E"]
        m_del = r[f"{sheet}.mass_delivered_I"]
        assert abs(m_in - m_del) / abs(m_in) < 1e-10       # north star
        if prev_mass is not None:
            lhs = r[f"{sheet}.ice_mass"] - prev_mass
            rhs = (m_del - r[f"{sheet}.mass_returned_I"]
                   + r[f"{sheet}.mass_residual"])
            scale = max(abs(r[f"{sheet}.ice_mass"]), abs(m_del))
            assert abs(lhs - rhs) / scale < 1e-12
        prev_mass = r[f"{sheet}.ice_mass"]


def test_config4_transient_100_steps_mesh():
    """BASELINE config #4 on the 8-device mesh: 100-step transient with
    regen cadence + E1vE0 held-state remap, conservation < 1e-10/step."""
    gr = make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=10)
    cp = GCMCoupler(gr, cfg, mesh=make_mesh(8))
    sc = cp.sheets["toy"]
    assert isinstance(sc, MeshIceSheetCoupler)
    rng = np.random.default_rng(7)
    sc.set_held_state(rng.uniform(0.5, 2.0, (2, gr.nE)))
    m_prev = sc.held_mass()
    cp.run_transient(lambda t, s: forcing(t, gr.nE), 100)
    rows = cp.ledger.to_rows()
    assert len(rows) == 100
    check_ledger_closure(rows, "toy")
    # held EC state books close across every regeneration
    n_regens = 0
    for r in rows:
        if "toy.held_mass" in r:
            n_regens += 1
            budget = (m_prev - r["toy.held_mass_dropped"]
                      + r["toy.held_mass_gained"])
            assert (abs(r["toy.held_mass"] - budget)
                    / max(abs(m_prev), 1.0) < 1e-10)
            m_prev = r["toy.held_mass"]
    assert n_regens >= 9
    # the ice actually evolved and stayed sharded on the mesh
    assert "ice" in str(sc.state.H.sharding)


def test_mesh_matches_single_device():
    """Same config, same forcing: the mesh coupler's trajectory matches the
    single-device Pallas coupler to f32 apply noise."""
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=4)
    cp1 = GCMCoupler(make_gr(), cfg)                      # single device
    # force the single-device coupler onto the Pallas (interpret) engine so
    # both paths run the SAME kernels
    cfgp = CouplerConfig(dt=86400.0 * 30, regen_every=4, engine="pallas")
    cp1 = GCMCoupler(make_gr(), cfgp)
    cp8 = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    out1 = out8 = None
    for k in range(5):
        f = forcing(float(k), cp1.gr.nE)
        out1 = cp1.couple({"toy": f})["toy"]
        out8 = cp8.couple({"toy": f})["toy"]
    H1 = np.asarray(cp1.sheets["toy"].state.H)
    H8 = np.asarray(cp8.sheets["toy"].state.H)
    np.testing.assert_allclose(H8, H1, rtol=2e-5, atol=2e-4)
    e1 = np.asarray(out1["fE_out"])
    e8 = np.asarray(out8["fE_out"])
    both = np.isfinite(e1) & np.isfinite(e8)
    # finiteness masks agree (same wM support)
    np.testing.assert_array_equal(np.isfinite(e1), np.isfinite(e8))
    np.testing.assert_allclose(e8[both], e1[both], rtol=5e-4, atol=5e-3)


def test_config5_two_sheets_mesh():
    """BASELINE config #5 shape: two ice sheets coupled on one mesh, both
    conserving and regenerating."""
    gr = make_gr(sheets=("greenland", "antarctica"))
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=5)
    cp = GCMCoupler(gr, cfg, mesh=make_mesh(8))
    cp.run_transient(lambda t, s: forcing(t, gr.nE,
                                          seed_extra=hash(s) % 1000), 12)
    rows = cp.ledger.to_rows()
    assert len(rows) == 12
    for sheet in ("greenland", "antarctica"):
        check_ledger_closure(rows, sheet)


def test_mesh_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume restores a mesh-sharded run exactly (state, time,
    matrix vintage) -- resumed trajectory equals the uninterrupted one."""
    from icebin_tpu.coupler.checkpoint import load_checkpoint, save_checkpoint
    gr = make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=3)
    cp = GCMCoupler(gr, cfg, mesh=make_mesh(8))
    for k in range(4):
        cp.couple({"toy": forcing(float(k), gr.nE)})
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, cp)
    ref = cp.couple({"toy": forcing(99.0, gr.nE)})["toy"]

    cp2 = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    load_checkpoint(path, cp2)
    assert "ice" in str(cp2.sheets["toy"].state.H.sharding)
    out = cp2.couple({"toy": forcing(99.0, gr.nE)})["toy"]
    np.testing.assert_array_equal(np.asarray(cp2.sheets["toy"].state.H),
                                  np.asarray(cp.sheets["toy"].state.H))
    e_ref, e_out = np.asarray(ref["fE_out"]), np.asarray(out["fE_out"])
    both = np.isfinite(e_ref)
    np.testing.assert_array_equal(both, np.isfinite(e_out))
    np.testing.assert_array_equal(e_ref[both], e_out[both])


def test_layout_contract():
    """Non-divisible layouts are now ACCEPTED (ragged decomposition,
    tests/test_ragged_mesh.py); only a mesh that would leave some device
    with no real lattice rows is rejected."""
    gr = make_gr(n_ice=30)       # 30 rows over 8 devices: ragged, fine
    sc = MeshIceSheetCoupler(gr, "toy", CouplerConfig(), make_mesh(8))
    assert sc.ny_pad == 32 and sc.ny_real == 30
    gr2 = make_gr(n_ice=7)       # ceil(7/8)=1 -> shard 7 owns no real row
    with pytest.raises(ValueError, match="no real rows"):
        MeshIceSheetCoupler(gr2, "toy", CouplerConfig(), make_mesh(8))


def test_mesh_ave_eva_runtime():
    """The lazy AvE/EvA device pair works under the mesh coupler too
    (A/E fields are replicated, so the inherited apply is correct)."""
    import numpy as np
    import jax.numpy as jnp
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=1 << 30)
    cp = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    sc = cp.sheets["toy"]
    ave = sc.mat("AvE")
    fE = jnp.asarray(np.random.default_rng(5).uniform(1.0, 2.0,
                                                      (2, cp.gr.nE)))
    fA = np.asarray(sc.apply("AvE", fE), np.float64)
    m_src = np.sum(np.asarray(fE, np.float64) * np.asarray(ave.Mw), axis=1)
    m_dst = np.sum(np.where(np.isfinite(fA), fA, 0.0)
                   * np.asarray(ave.wM), axis=1)
    np.testing.assert_allclose(m_dst, m_src, rtol=1e-10)


def test_mesh_fused_transient_matches_stepwise():
    """Fused windows over the MESH (one jitted scan per regen window, with
    the sharded Pallas applies + halo-ring SIA inlined) must reproduce the
    stepwise mesh coupler's ledger and final state."""
    import numpy as np
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=4)
    cp1 = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    cp2 = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    f = lambda t, s: forcing(t, cp1.gr.nE)
    cp1.run_transient(f, 9)
    cp2.run_transient(f, 9, fused=True)
    r1, r2 = cp1.ledger.to_rows(), cp2.ledger.to_rows()
    assert len(r1) == len(r2) == 9
    for a, b in zip(r1, r2):
        for key in a:
            na, nb = a[key], b[key]
            if na == 0.0:
                assert nb == 0.0, key
                continue
            # roundoff-level rows (residuals, clamp books) compare to the
            # step's physical scale, not to themselves; energy rows carry
            # the f32 column's huge cold-content magnitudes, so their
            # stepwise-vs-fused agreement is bounded by f32 epsilon of the
            # STORED energy, not by the f64 ledger
            if "energy" in key:
                scale = abs(a["toy.energy_storage_I"])
                assert abs(na - nb) < 1e-6 * max(scale, abs(na)), \
                    (key, na, nb)
            else:
                scale = abs(a["toy.mass_delivered_I"])
                assert abs(na - nb) < 1e-9 * abs(na) + 1e-11 * scale, \
                    (key, na, nb)
        m_in, m_del = b["toy.mass_in_E"], b["toy.mass_delivered_I"]
        assert abs(m_in - m_del) / abs(m_in) < 1e-10
    np.testing.assert_allclose(np.asarray(cp2.sheets["toy"].state.H),
                               np.asarray(cp1.sheets["toy"].state.H),
                               rtol=1e-6, atol=1e-9)


def test_mesh_sigma_ive_canonical():
    """Smoothed configs on the MESH also build IvE from its canonical
    matrix (no transpose-sharing of the asymmetric smoother)."""
    import numpy as np
    import jax.numpy as jnp
    from icebin_tpu.regrid.matrices import RegridParams
    P = RegridParams(scale=True, correctA=True, sigma=(60e3, 60e3))
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=1 << 30, params=P)
    cp = GCMCoupler(make_gr(), cfg, mesh=make_mesh(8))
    sc = cp.sheets["toy"]
    Mi = sc.rm.matrix("IvE", P)
    rng = np.random.default_rng(13)
    fE = rng.uniform(1.0, 2.0, cp.gr.nE)
    got = np.asarray(sc.apply("IvE", jnp.asarray(fE)), np.float64)
    ref = Mi.apply(fE, scale=True, fill=np.nan)
    m = np.isfinite(ref)
    np.testing.assert_allclose(np.where(m, got, 0.0), np.where(m, ref, 0.0),
                               rtol=2e-5, atol=1e-8 * np.abs(ref[m]).max())
