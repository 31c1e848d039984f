"""The ice->GCM mass-LOSS half of the conservation loop (VERDICT r2 #2),
round-4 flux taxonomy (VERDICT r3 missing #1) and the energy-consuming
column (VERDICT r3 missing #2).

A warming transient: positive surface temperatures drive PDD melt
(-> ``runoff``), thin-margin calving removes front cells
(-> ``calving_flux``), and the contract's energy fluxes warm the enthalpy
column until its temperate excess melts ice at the base
(-> ``basal_melt`` -- driven by the ENERGY path, not tsurf).  Total system
mass AND energy close per step -- on a single device AND on the 8-device
mesh, with bit-matching books (reference: PISM's pism_out harvest through
``IceCoupler::couple`` and its enthalpy balance [U IceCoupler_PISM];
SURVEY.md section 3.3).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler, \
    IceSheetCoupler
from icebin_tpu.coupler.sharded import MeshIceSheetCoupler
from icebin_tpu.coupler.varset import ice_modele_output_contract
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.models.ice_sheet import (L_FUSION, RHO_ICE, IceSheetConfig,
                                         init_state, step, step_coupled)
from icebin_tpu.parallel.mesh import make_mesh
from icebin_tpu.regrid.gcmregridder import GCMRegridder

N_ICE = 32
SCALE = 25e3


def make_gr():
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 7))
    gr = GCMRegridder(specA, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    specI = GridSpecXY(
        xb=np.linspace(2.0 * SCALE, 18.0 * SCALE, N_ICE + 1),
        yb=np.linspace(40.0 * SCALE, 72.0 * SCALE, N_ICE + 1),
        projection=PlateCarree(scale=SCALE))
    gr.add_sheet("toy", specI, subdiv=1)
    return gr


def melt_cfg(specI, dtype="float32"):
    dx = float(np.diff(specI.xb).mean())
    dy = float(np.diff(specI.yb).mean())
    # calv_thk spans the toy dome's steep margin profile so the front keeps
    # calving as it retreats (a thin threshold only eats the initial ring)
    return IceSheetConfig(nx=specI.nx, ny=specI.ny, dx=dx, dy=dy,
                          calv_thk=700.0, calv_tau=86400.0 * 5, dtype=dtype)


def warm_forcing(t, nE, tdegc=5.0, heat=2.0):
    rng = np.random.default_rng(int(t) % 100003)
    f = np.zeros((8, nE))
    f[0] = 2e-6 * rng.uniform(0.5, 1.0, nE)   # smb_mass: weak accumulation
    f[1] = 5.0                                # smb_enth [W m-2]
    f[2] = 1.0                                # deltah [W m-2]
    f[3] = heat                               # heat_flux [W m-2]
    f[4] = tdegc                              # tsurf [degC] -> PDD melt
    f[5] = 0.06                               # geothermal_flux [W m-2]
    f[6] = 1e-7 * rng.uniform(0.2, 1.0, nE)   # rain_mass
    f[7] = 0.2                                # rain_enth
    return jnp.asarray(f)


def _closure(rows, sheet="toy"):
    """The ledger identities (exact by construction) + residuals small."""
    prev_m = prev_e = None
    for r in rows:
        m1 = r[f"{sheet}.ice_mass"]
        e1 = r[f"{sheet}.energy_storage_I"]
        if prev_m is not None:
            lhs = m1 - prev_m
            rhs = (r[f"{sheet}.mass_delivered_I"]
                   - r[f"{sheet}.mass_returned_I"]
                   + r[f"{sheet}.mass_clamp_I"]
                   + r[f"{sheet}.mass_residual"])
            scale = max(abs(m1), abs(r[f"{sheet}.mass_delivered_I"]))
            assert abs(lhs - rhs) / scale < 1e-12
            lhsE = e1 - prev_e
            rhsE = (r[f"{sheet}.energy_delivered_I"]
                    - r[f"{sheet}.energy_returned_I"]
                    - r[f"{sheet}.energy_clamp_I"]
                    + r[f"{sheet}.energy_residual"])
            scaleE = max(abs(e1), abs(r[f"{sheet}.energy_delivered_I"]))
            assert abs(lhsE - rhsE) / scaleE < 1e-12
        prev_m, prev_e = m1, e1


def _run_retreat(cp, n=24):
    gr = cp.gr
    outs = []
    for _ in range(n):
        outs.append(cp.couple({"toy": warm_forcing(cp.time, gr.nE)}))
    return outs, cp.ledger.to_rows()


def test_model_melt_and_calving_fluxes():
    """step_coupled returns exactly the mass it sheds; cold runs shed no
    melt and match the legacy step bit-for-bit."""
    cfg = IceSheetConfig(nx=24, ny=24, dx=20e3, dy=20e3,
                         calv_thk=300.0, calv_tau=86400.0)
    st = init_state(cfg, dome_height=2500.0)
    smb = np.zeros(24 * 24)
    dt = 86400.0 * 30
    cold = np.full((24, 24), 250.0)
    st_cold, fx_c = step_coupled(cfg, st, smb, cold, dt)
    # cold: no melt; calving still active at thin margins
    assert float(jnp.abs(fx_c.runoff).max()) == 0.0
    warm = np.full((24, 24), 280.0)
    st2, fx = step_coupled(cfg, st, smb, warm, dt)
    assert float(fx.runoff.max()) > 0.0
    assert float(fx.calving.max()) > 0.0
    # attribution: thickness change == dynamics - shed; dynamics conserves
    # except the >=0 clamp at margins, which only ADDS mass back (the
    # coupler ledger books that gap as mass_residual -- the EXACT closure
    # is asserted per step in the transient tests below)
    area = cfg.dx * cfg.dy
    dm = float((jnp.sum(st2.H) - jnp.sum(st.H))) * area * RHO_ICE
    shed = float(jnp.sum(fx.runoff + fx.basal_melt + fx.calving)) * area * dt
    clamp_gain = dm + shed
    assert clamp_gain > -1e-9 * shed          # clamp never removes mass
    assert clamp_gain < 1e-3 * shed           # and stays a small correction


def test_legacy_step_unchanged_by_ablation_config():
    """``step`` (no tsurf) is bit-identical regardless of ablation knobs."""
    cfg1 = IceSheetConfig(nx=16, ny=16, dx=20e3, dy=20e3)
    cfg2 = dataclasses.replace(cfg1, ddf=0.0, calv_thk=0.0)
    st = init_state(cfg1)
    smb = 1e-5 * np.ones(16 * 16)
    h1 = np.asarray(step(cfg1, st, smb, 86400.0 * 10).H)
    h2 = np.asarray(step(cfg2, st, smb, 86400.0 * 10).H)
    np.testing.assert_array_equal(h1, h2)


def test_model_energy_closure_f64():
    """The model's OWN energy account closes to f64 round-off: dU equals
    energy_in - every booked removal, < 1e-12 relative of the dominant
    flow (VERDICT r3 item #3 done-criterion; f64 state isolates the
    bookkeeping from f32 quantization)."""
    cfg = IceSheetConfig(nx=24, ny=24, dx=20e3, dy=20e3, calv_thk=400.0,
                         calv_tau=86400.0 * 2, dtype="float64")
    st = init_state(cfg, dome_height=2500.0)
    dt = 86400.0 * 30
    smb = 1e-6 * np.ones(24 * 24)
    ts = np.full((24, 24), 275.0)
    ef = np.full((24, 24), 12.0)
    for _ in range(4):
        st1, fx = step_coupled(cfg, st, smb, ts, dt, ef)
        dU = float(jnp.sum(st1.enth) - jnp.sum(st.enth))
        e_in = 12.0 * dt
        e_out = float(jnp.sum(fx.enth_runoff + fx.enth_basal
                              + fx.enth_calving + fx.enth_clamp)) * dt \
            / (24 * 24)
        dU_mean = dU / (24 * 24)
        scale = max(abs(dU_mean), e_in, abs(e_out), 1e-30)
        assert abs(dU_mean - (e_in - e_out)) / scale < 1e-12
        st = st1


def test_basal_melt_from_energy_path():
    """basal_melt is nonzero and driven by the ENERGY budget: a cold
    surface (no PDD melt) with a strong heat flux exhausts the cold
    content and melts at the base; with no energy input there is no basal
    melt (VERDICT r3 missing #2 done-criterion)."""
    cfg = IceSheetConfig(nx=16, ny=16, dx=20e3, dy=20e3, t_init=271.0,
                         dtype="float64")
    st = init_state(cfg, dome_height=500.0)
    dt = 86400.0 * 30
    smb = np.zeros(16 * 16)
    cold = np.full((16, 16), 260.0)           # no PDD melt
    strong = np.full((16, 16), 50.0)          # strong warming [W m-2]
    st_w, fx_w = step_coupled(cfg, st, smb, cold, dt, strong)
    assert float(fx_w.runoff.max()) == 0.0    # tsurf path inert
    assert float(fx_w.basal_melt.max()) > 0.0  # energy path melts
    # latent energy booked = L_f * basal mass, exactly
    np.testing.assert_allclose(np.asarray(fx_w.enth_basal),
                               L_FUSION * np.asarray(fx_w.basal_melt),
                               rtol=1e-12)
    st_0, fx_0 = step_coupled(cfg, st, smb, cold, dt, None)
    assert float(jnp.abs(fx_0.basal_melt).max()) == 0.0


def test_pdd_latent_drawn_from_column():
    """Round 5 (VERDICT r4 weak #5 / next #7): surface melt's latent heat
    draws on the column's temperate excess FIRST, so surface and basal
    melt share one budget -- surface melt COOLS the column, shrinking
    basal melt; a cold column supplies nothing (latent stays implied)."""
    from icebin_tpu.models.ice_sheet import (L_FUSION, RHO_ICE,
                                             apply_ablation_energy)
    import jax.numpy as jnp

    # unit level: temperate column fully supplies the surface latent
    H1 = jnp.full((2, 2), 1000.0, jnp.float64)
    U_warm = jnp.full((2, 2), 5e8, jnp.float64)     # temperate excess
    melt = jnp.full((2, 2), 1.0, jnp.float64)       # 1 m surface melt
    z = jnp.zeros_like(H1)
    need = RHO_ICE * L_FUSION * 1.0                  # 3.04e8 J m-2
    (H4, U4, basal, eU_run, eU_calv, e_clamp,
     e_lat) = apply_ablation_energy(H1, U_warm, melt, z)
    share = 5e8 * (1.0 / 1000.0)                     # enthalpy of shed mass
    np.testing.assert_allclose(np.asarray(e_lat), need, rtol=1e-12)
    # remaining excess melts basally; total drained excess conserved
    np.testing.assert_allclose(
        np.asarray(basal) * RHO_ICE * L_FUSION,
        5e8 - share - need, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(eU_run), share + need,
                               rtol=1e-12)
    # cold column: nothing supplied, cold content untouched by the debit
    U_cold = jnp.full((2, 2), -5e8, jnp.float64)
    (_, U4c, basalc, eU_runc, _, _,
     e_latc) = apply_ablation_energy(H1, U_cold, melt, z)
    assert float(jnp.abs(e_latc).max()) == 0.0
    assert float(jnp.abs(basalc).max()) == 0.0

    # step level: with a temperate column, turning PDD surface melt ON
    # reduces BASAL melt (the excess was spent at the surface) and the
    # implied-PDD row drops below L_f * runoff by exactly that supply
    cfg = IceSheetConfig(nx=16, ny=16, dx=20e3, dy=20e3, t_init=273.0,
                         dtype="float64")
    st = init_state(cfg, dome_height=500.0)
    dt = 86400.0 * 30
    smb = np.zeros(16 * 16)
    warm_col = np.full((16, 16), 60.0)        # drives temperate excess
    hot = np.full((16, 16), 278.0)            # strong PDD melt
    cold = np.full((16, 16), 260.0)           # no PDD melt
    _, fx_hot = step_coupled(cfg, st, smb, hot, dt, warm_col)
    _, fx_cold = step_coupled(cfg, st, smb, cold, dt, warm_col)
    assert float(fx_hot.runoff.max()) > 0.0
    assert (float(jnp.sum(fx_hot.basal_melt))
            < float(jnp.sum(fx_cold.basal_melt)))
    implied = np.asarray(fx_hot.latent_pdd)
    full = L_FUSION * np.asarray(fx_hot.runoff)
    assert (implied <= full * (1 + 1e-12)).all()
    assert implied.sum() < full.sum() * 0.999   # some latent came from U


def test_retreat_transient_single_device():
    gr = make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=6)
    specI = gr.sheets["toy"].specI
    sc = IceSheetCoupler(gr, "toy", cfg, ice_cfg=melt_cfg(specI))
    cp = GCMCoupler(gr, cfg, sheets={"toy": sc})
    out, rows = _run_retreat(cp)
    _closure(rows)
    # the sheet RETREATS: net mass decreases
    assert rows[-1]["toy.ice_mass"] < rows[0]["toy.ice_mass"]
    ret = np.array([r["toy.mass_returned_I"] for r in rows])
    assert (ret > 0).all()
    # residual = the explicit scheme's >=0 margin clamp (+ f32
    # quantization); it is EXACTLY booked (closure above) and stays a
    # small fraction of the returned mass, so the loss is attributed to
    # the harvested fluxes, not to slop
    res = np.array([abs(r["toy.mass_residual"]) for r in rows])
    assert (res < 0.05 * ret).all()
    assert res.sum() < 0.05 * ret.sum()
    # the taxonomy rows come back nonzero through EvI/AvI -- runoff every
    # step, calving whenever the front calves
    vs = ice_modele_output_contract()
    kr, kb, kc = (vs.index("runoff"), vs.index("basal_melt"),
                  vs.index("calving_flux"))
    sums = {(s, k): 0.0 for s in ("E", "A") for k in (kr, kc)}
    for o in out:
        fE = np.asarray(o["toy"]["fE_out"])
        fA = np.asarray(o["toy"]["fA_out"])
        assert np.nansum(np.abs(fE[kr])) > 0     # runoff every step
        for side, f in (("E", fE), ("A", fA)):
            for k in (kr, kc):
                sums[(side, k)] += np.nansum(np.abs(f[k]))
    assert all(v > 0 for v in sums.values())
    out = out[-1]
    # the repaired EvI transport conserves the returned-flux rows: harvest
    # the current state with known nonzero flux fields and compare
    # weighted measures across the apply
    sc = cp.sheets["toy"]
    rng = np.random.default_rng(3)
    from icebin_tpu.models.ice_sheet import IceFluxes
    z = jnp.zeros_like(sc.state.H)
    fx = IceFluxes(
        runoff=jnp.asarray(1e-5 * rng.uniform(0.5, 1.0, sc.state.H.shape)),
        basal_melt=jnp.asarray(5e-6 * rng.uniform(0.5, 1.0,
                                                  sc.state.H.shape)),
        calving=jnp.asarray(2e-5 * rng.uniform(0.5, 1.0, sc.state.H.shape)),
        mass_clamp=z, enth_runoff=z, enth_basal=z, enth_calving=z,
        enth_clamp=z, latent_pdd=z)
    outI = np.asarray(sc._ice_outputs(sc.state, fx))
    fE2 = np.asarray(sc._apply_mat(sc.mat("EvI"), jnp.asarray(outI)))
    # conservation in the ENGINE's measure (the repair target): weighted
    # E-sum equals weighted I-sum of the harvested flux rows to f64
    wM = np.asarray(sc.mat("EvI").wM, np.float64)
    Mw = np.asarray(sc.mat("EvI").Mw, np.float64)
    for k in (kr, kb, kc):
        m_E = np.nansum(np.where(np.isfinite(fE2[k]), fE2[k], 0.0) * wM)
        m_I = np.sum(np.where(np.isfinite(outI[k]), outI[k], 0.0) * Mw)
        assert m_I > 0
        assert abs(m_E - m_I) <= 1e-10 * m_I


def test_retreat_transient_mesh_matches_single():
    """Same retreat on the 8-device mesh coupler: closure holds and the
    returned-mass AND energy books match the single-device run."""
    gr1, gr2 = make_gr(), make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=6)
    ice_cfg = melt_cfg(gr1.sheets["toy"].specI)
    sc1 = IceSheetCoupler(gr1, "toy", cfg, ice_cfg=ice_cfg)
    cp1 = GCMCoupler(gr1, cfg, sheets={"toy": sc1})
    mesh = make_mesh(8)
    sc2 = MeshIceSheetCoupler(gr2, "toy", cfg, mesh, ice_cfg=ice_cfg)
    cp2 = GCMCoupler(gr2, cfg, sheets={"toy": sc2})
    _, rows1 = _run_retreat(cp1, n=13)
    _, rows2 = _run_retreat(cp2, n=13)
    _closure(rows1)
    _closure(rows2)
    for key, tol in (("mass_returned_I", 1e-6), ("ice_mass", 1e-7),
                     ("energy_storage_I", 1e-6),
                     ("energy_returned_I", 1e-6)):
        a = np.array([r[f"toy.{key}"] for r in rows1])
        b = np.array([r[f"toy.{key}"] for r in rows2])
        np.testing.assert_allclose(b, a, rtol=tol)
    r1 = np.array([r["toy.mass_returned_I"] for r in rows1])
    assert (r1 > 0).all()


def test_coupler_energy_closure_f64_mesh_matches_single():
    """VERDICT r3 item #3 done-criterion: with an f64-state model the
    COUPLER's energy account closes < 1e-10 relative per step -- the
    energy-residual row collapses to round-off -- on one device AND the
    8-device mesh, with basal melt live from the energy path."""
    gr1, gr2 = make_gr(), make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=1 << 30)
    ice_cfg = dataclasses.replace(melt_cfg(gr1.sheets["toy"].specI,
                                           dtype="float64"),
                                  t_init=273.1)
    sc1 = IceSheetCoupler(gr1, "toy", cfg, ice_cfg=ice_cfg)
    cp1 = GCMCoupler(gr1, cfg, sheets={"toy": sc1})
    mesh = make_mesh(8)
    sc2 = MeshIceSheetCoupler(gr2, "toy", cfg, mesh, ice_cfg=ice_cfg)
    cp2 = GCMCoupler(gr2, cfg, sheets={"toy": sc2})
    vs = ice_modele_output_contract()
    kb = vs.index("basal_melt")
    for cp in (cp1, cp2):
        basal_sum = 0.0
        for _ in range(6):
            out = cp.couple({"toy": warm_forcing(cp.time, cp.gr.nE,
                                                 tdegc=-5.0, heat=40.0)})
            fE = np.asarray(out["toy"]["fE_out"])
            basal_sum += np.nansum(np.abs(fE[kb]))
        # energy path alive: a cold surface (no PDD) + strong heating
        # exhausts the thin cold content and melts at the base
        assert basal_sum > 0
        rows = cp.ledger.to_rows()
        _closure(rows)
        for r in rows:
            # transport identity: E-side source == repaired I-side arrival
            e_in, e_del = r["toy.energy_in_E"], r["toy.energy_delivered_I"]
            assert e_in != 0.0
            assert abs(e_in - e_del) / abs(e_in) < 1e-10
            # f64 state: the residual row is round-off, i.e. the storage
            # change is FULLY explained by delivered/returned/clamp rows
            scale = max(abs(r["toy.energy_delivered_I"]),
                        abs(r["toy.energy_returned_I"]),
                        abs(r["toy.energy_storage_I"]))
            assert abs(r["toy.energy_residual"]) / scale < 1e-10
            assert abs(r["toy.mass_residual"]) / max(
                abs(r["toy.mass_delivered_I"]),
                abs(r["toy.mass_returned_I"])) < 1e-10
    # the two engines agree (the mesh transport kernels are f32, so the
    # f64-state books differ at f32 epsilon of the delivered fields; each
    # engine's own closure above is the 1e-10 criterion)
    rows1, rows2 = cp1.ledger.to_rows(), cp2.ledger.to_rows()
    for key in ("energy_storage_I", "energy_returned_I", "ice_mass"):
        a = np.array([r[f"toy.{key}"] for r in rows1])
        b = np.array([r[f"toy.{key}"] for r in rows2])
        np.testing.assert_allclose(b, a, rtol=1e-6)


def test_retreat_fused_window_books_match_stepwise():
    """couple_window carries the full 14-row stats identically."""
    gr1, gr2 = make_gr(), make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=4)
    ice_cfg = melt_cfg(gr1.sheets["toy"].specI)
    cp1 = GCMCoupler(gr1, cfg, sheets={
        "toy": IceSheetCoupler(gr1, "toy", cfg, ice_cfg=ice_cfg)})
    cp2 = GCMCoupler(gr2, cfg, sheets={
        "toy": IceSheetCoupler(gr2, "toy", cfg, ice_cfg=ice_cfg)})
    fn = lambda t, s: warm_forcing(t, gr1.nE)
    cp1.run_transient(fn, 8, fused=False)
    cp2.run_transient(fn, 8, fused=True)
    rows1, rows2 = cp1.ledger.to_rows(), cp2.ledger.to_rows()
    assert len(rows2) == 8
    _closure(rows2)
    for k in ("mass_returned_I", "ice_mass", "mass_delivered_I",
              "energy_storage_I", "energy_returned_I", "energy_clamp_I",
              "mass_rain_through", "energy_rain_through"):
        a = np.array([r[f"toy.{k}"] for r in rows1])
        b = np.array([r[f"toy.{k}"] for r in rows2])
        np.testing.assert_allclose(b, a, rtol=1e-12)


def test_energy_books():
    """The contract's enthalpy/heat fields are first-class ledger rows:
    transported energy conserves < 1e-10 (same repaired identity as mass),
    the PDD latent row matches the runoff mass exactly when calving is
    off, and the rain pass-through is booked on both sides (reference:
    PISM's energy balance consumes smb_enth/heat_flux
    [U IceCoupler_PISM])."""
    gr = make_gr()
    cfg = CouplerConfig(dt=86400.0 * 30, regen_every=1 << 30)
    specI = gr.sheets["toy"].specI
    ice_cfg = dataclasses.replace(melt_cfg(specI), calv_thk=0.0)
    sc = IceSheetCoupler(gr, "toy", cfg, ice_cfg=ice_cfg)
    cp = GCMCoupler(gr, cfg, sheets={"toy": sc})
    for _ in range(6):
        cp.couple({"toy": warm_forcing(cp.time, gr.nE)})
    rows = cp.ledger.to_rows()
    for r in rows:
        e_in = r["toy.energy_in_E"]
        e_del = r["toy.energy_delivered_I"]
        assert e_in != 0.0
        assert abs(e_in - e_del) / abs(e_in) < 1e-10
        # calving off: PDD latent = L_f * PDD melt; returned mass is PDD
        # melt + basal melt + rain
        lat = r["toy.energy_pdd_implied"]
        ret = r["toy.mass_returned_I"]
        rain = r["toy.mass_rain_through"]
        assert ret > rain > 0
        assert r["toy.energy_rain_through"] > 0
        assert lat > 0
        assert lat < L_FUSION * ret
