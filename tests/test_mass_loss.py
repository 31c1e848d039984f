"""The ice->GCM mass-LOSS half of the conservation loop (VERDICT r2 #2).

A warming transient: positive surface temperatures drive PDD melt and
thin-margin calving removes front cells; the sheet RETREATS, both
``basal_flux`` and ``calving_flux`` contract fields come back NONZERO, and
total system mass (ice + delivered - returned) closes per step -- on a
single device AND on the 8-device mesh, with bit-matching returned-mass
books (reference: PISM's pism_out basal/calving harvest through
``IceCoupler::couple`` [U IceCoupler_PISM]; SURVEY.md section 3.3).
"""
import numpy as np
import jax.numpy as jnp

from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler, \
    IceSheetCoupler
from icebin_tpu.coupler.sharded import MeshIceSheetCoupler
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.models.ice_sheet import (RHO_ICE, IceSheetConfig,
                                         IceSheetState, init_state,
                                         step, step_coupled)
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


def melt_cfg(specI):
    dx = float(np.diff(specI.xb).mean())
    dy = float(np.diff(specI.yb).mean())
    # calv_thk spans the toy dome's steep margin profile so the front keeps
    # calving as it retreats (a thin threshold only eats the initial ring)
    return IceSheetConfig(nx=specI.nx, ny=specI.ny, dx=dx, dy=dy,
                          calv_thk=700.0, calv_tau=86400.0 * 5)


def warm_forcing(t, nE, tdegc=5.0):
    rng = np.random.default_rng(int(t) % 100003)
    f = np.zeros((4, nE))
    f[0] = 2e-6 * rng.uniform(0.5, 1.0, nE)   # weak SMB: melt dominates
    f[1] = 5.0
    f[2] = 2.0
    f[3] = tdegc                              # warm surface -> PDD melt
    return jnp.asarray(f)


def _closure(rows, sheet="toy"):
    prev = None
    for r in rows:
        if prev is not None:
            lhs = r[f"{sheet}.ice_mass"] - prev
            rhs = (r[f"{sheet}.mass_delivered_I"]
                   - r[f"{sheet}.mass_returned_I"]
                   + r[f"{sheet}.mass_residual"])
            scale = max(abs(r[f"{sheet}.ice_mass"]),
                        abs(r[f"{sheet}.mass_delivered_I"]))
            assert abs(lhs - rhs) / scale < 1e-12
        prev = r[f"{sheet}.ice_mass"]


def _run_retreat(cp, n=24):
    gr = cp.gr
    outs = []
    for _ in range(n):
        outs.append(cp.couple({"toy": warm_forcing(cp.time, gr.nE)}))
    return outs, cp.ledger.to_rows()


def test_model_melt_and_calving_fluxes():
    """step_coupled returns exactly the mass it sheds; cold runs shed 0 and
    match the legacy step bit-for-bit."""
    cfg = IceSheetConfig(nx=24, ny=24, dx=20e3, dy=20e3,
                         calv_thk=300.0, calv_tau=86400.0)
    st = init_state(cfg, dome_height=2500.0)
    smb = np.zeros(24 * 24)
    dt = 86400.0 * 30
    cold = np.full((24, 24), 250.0)
    st_cold, melt_c, calv_c = step_coupled(cfg, st, smb, cold, dt)
    # cold: no melt; calving still active at thin margins
    assert float(jnp.abs(melt_c).max()) == 0.0
    warm = np.full((24, 24), 280.0)
    st2, melt, calv = step_coupled(cfg, st, smb, warm, dt)
    assert float(melt.max()) > 0.0
    assert float(calv.max()) > 0.0
    # attribution: thickness change == dynamics - (melt + calv); dynamics
    # conserves except the >=0 clamp at margins, which only ADDS mass back
    # (the coupler ledger books that gap as mass_residual -- the EXACT
    # closure is asserted per step in the transient tests below)
    area = cfg.dx * cfg.dy
    dm = float((jnp.sum(st2.H) - jnp.sum(st.H))) * area * RHO_ICE
    shed = float(jnp.sum(melt + calv)) * area * dt
    clamp_gain = dm + shed
    assert clamp_gain > -1e-9 * shed          # clamp never removes mass
    assert clamp_gain < 1e-3 * shed           # and stays a small correction


def dataclasses_replace_no_ablation(cfg):
    import dataclasses
    return dataclasses.replace(cfg, ddf=0.0, calv_thk=0.0)


def test_legacy_step_unchanged_by_ablation_config():
    """``step`` (no tsurf) is bit-identical regardless of ablation knobs."""
    cfg1 = IceSheetConfig(nx=16, ny=16, dx=20e3, dy=20e3)
    cfg2 = dataclasses_replace_no_ablation(cfg1)
    st = init_state(cfg1)
    smb = 1e-5 * np.ones(16 * 16)
    h1 = np.asarray(step(cfg1, st, smb, 86400.0 * 10).H)
    h2 = np.asarray(step(cfg2, st, smb, 86400.0 * 10).H)
    np.testing.assert_array_equal(h1, h2)


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
    # both contract fields come back nonzero through EvI/AvI -- on every
    # step for melt, and whenever the front calves for calving
    from icebin_tpu.coupler.varset import ice_modele_output_contract
    vs = ice_modele_output_contract()
    kb, kc = vs.index("basal_flux"), vs.index("calving_flux")
    sums = {("E", kb): 0.0, ("E", kc): 0.0, ("A", kb): 0.0, ("A", kc): 0.0}
    for o in out:
        fE = np.asarray(o["toy"]["fE_out"])
        fA = np.asarray(o["toy"]["fA_out"])
        assert np.nansum(np.abs(fE[kb])) > 0     # melt every step
        for side, f in (("E", fE), ("A", fA)):
            for k in (kb, kc):
                sums[(side, k)] += np.nansum(np.abs(f[k]))
    assert all(v > 0 for v in sums.values())
    out = out[-1]
    # the repaired EvI transport conserves the returned-flux rows: harvest
    # the current state with known nonzero melt/calving fields and compare
    # weighted measures across the apply
    sc = cp.sheets["toy"]
    rng = np.random.default_rng(3)
    melt = jnp.asarray(1e-5 * rng.uniform(0.5, 1.0, sc.state.H.shape))
    calv = jnp.asarray(2e-5 * rng.uniform(0.5, 1.0, sc.state.H.shape))
    outI = np.asarray(sc._ice_outputs(sc.state, melt, calv))
    fE2 = np.asarray(sc._apply_mat(sc.mat("EvI"), jnp.asarray(outI)))
    # conservation in the ENGINE's measure (the repair target): weighted
    # E-sum equals weighted I-sum of the harvested flux rows to f64
    wM = np.asarray(sc.mat("EvI").wM, np.float64)
    Mw = np.asarray(sc.mat("EvI").Mw, np.float64)
    for k in (kb, kc):
        m_E = np.nansum(np.where(np.isfinite(fE2[k]), fE2[k], 0.0) * wM)
        m_I = np.sum(np.where(np.isfinite(outI[k]), outI[k], 0.0) * Mw)
        assert m_I > 0
        assert abs(m_E - m_I) <= 1e-10 * m_I


def test_retreat_transient_mesh_matches_single():
    """Same retreat on the 8-device mesh coupler: closure holds and the
    returned-mass books match the single-device run."""
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
    r1 = np.array([r["toy.mass_returned_I"] for r in rows1])
    r2 = np.array([r["toy.mass_returned_I"] for r in rows2])
    assert (r1 > 0).all() and (r2 > 0).all()
    np.testing.assert_allclose(r2, r1, rtol=1e-6)
    m1 = np.array([r["toy.ice_mass"] for r in rows1])
    m2 = np.array([r["toy.ice_mass"] for r in rows2])
    np.testing.assert_allclose(m2, m1, rtol=1e-7)


def test_retreat_fused_window_books_match_stepwise():
    """couple_window carries the returned-mass stats identically."""
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
    for k in ("mass_returned_I", "ice_mass", "mass_delivered_I"):
        a = np.array([r[f"toy.{k}"] for r in rows1])
        b = np.array([r[f"toy.{k}"] for r in rows2])
        np.testing.assert_allclose(b, a, rtol=1e-12)


def test_energy_books():
    """The contract's enthalpy/heat fields are first-class ledger rows:
    transported energy conserves < 1e-10 (same repaired identity as mass)
    and the melt's latent heat matches the returned mass exactly when
    calving is disabled (reference: PISM's energy balance consumes
    smb_enth/heat_flux [U IceCoupler_PISM])."""
    import dataclasses
    from icebin_tpu.models.ice_sheet import L_FUSION
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
        # calving off: returned mass IS melt mass; latent = L_f * melt
        lat = r["toy.energy_latent_melt"]
        ret = r["toy.mass_returned_I"]
        assert ret > 0
        assert abs(lat - L_FUSION * ret) / lat < 1e-6
