import sys, os; sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler, IceSheetCoupler
from icebin_tpu.parallel.mesh import make_mesh
from icebin_tpu.regrid.gcmregridder import GCMRegridder

scale = 10e3
nyc = 4*8+4
specI2 = GridSpecXY(xb=np.linspace(0.0, 16.0*scale, 33),
                    yb=np.linspace(40.0*scale, 72.0*scale, nyc+1),
                    projection=PlateCarree(scale=scale))
specA2 = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                        latb=np.linspace(30.0, 80.0, 7))
def mk():
    gr = GCMRegridder(specA2, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    gr.add_sheet("s", specI2, subdiv=1)
    return gr
cfg = CouplerConfig(dt=86400.0*30, regen_every=4)
gr1, gr2 = mk(), mk()
cp_m = GCMCoupler(gr1, cfg, mesh=make_mesh(8))
cp_s = GCMCoupler(gr2, cfg, sheets={"s": IceSheetCoupler(gr2, "s", cfg)})
rng2 = np.random.default_rng(2)
fE = np.zeros((8, gr1.nE))
fE[0] = 1e-5*rng2.uniform(0.5, 1.0, gr1.nE)
fE[1] = 5.0; fE[3] = 2.0; fE[4] = 4.0; fE[5] = 0.06
cp_m.couple({"s": jnp.asarray(fE)})
cp_s.couple({"s": jnp.asarray(fE)})
rm, rs = cp_m.ledger.to_rows(), cp_s.ledger.to_rows()
for k in ("mass_in_E","mass_delivered_I","ice_mass","mass_returned_I","mass_clamp_I","energy_delivered_I","energy_storage_I","energy_returned_I"):
    a, b = rs[0][f"s.{k}"], rm[0][f"s.{k}"]
    print(f"{k:22s} single={a:.8e} mesh={b:.8e} rel={(b-a)/max(abs(a),1e-30):.2e}")
Hs = np.asarray(cp_s.sheets["s"].state.H)
Hm = np.asarray(cp_m.sheets["s"].state.H)[:nyc]
print("H maxdiff", np.abs(Hm-Hs).max(), "H scale", Hs.max())
Us = np.asarray(cp_s.sheets["s"].state.enth)
Um = np.asarray(cp_m.sheets["s"].state.enth)[:nyc]
print("U maxdiff", np.abs(Um-Us).max(), "U scale", np.abs(Us).max())

# phase 2: fused mesh window vs stepwise mesh
gr3, gr4 = mk(), mk()
cp_mf = GCMCoupler(gr3, cfg, mesh=make_mesh(8))
cp_ms = GCMCoupler(gr4, cfg, mesh=make_mesh(8))
cp_mf.run_transient(lambda t, s: fE, 4, fused=True)
cp_ms.run_transient(lambda t, s: fE, 4, fused=False)
rf, rs2 = cp_mf.ledger.to_rows(), cp_ms.ledger.to_rows()
for i in (0, 3):
    for k in ("ice_mass","mass_returned_I","mass_delivered_I","energy_storage_I"):
        a, b = rs2[i][f"s.{k}"], rf[i][f"s.{k}"]
        print(f"step{i} {k:20s} stepwise={a:.8e} fused={b:.8e} rel={(b-a)/max(abs(a),1e-30):.2e}")
Hs = np.asarray(cp_ms.sheets["s"].state.H)
Hm = np.asarray(cp_mf.sheets["s"].state.H)
print("H fused-vs-stepwise maxdiff", np.abs(Hm-Hs).max())

# phase 3: ONE-step fused window vs one stepwise couple, field-level diff
import jax.numpy as jnp
gr5, gr6 = mk(), mk()
cp_a = GCMCoupler(gr5, cfg, mesh=make_mesh(8))
cp_b = GCMCoupler(gr6, cfg, mesh=make_mesh(8))
sca, scb = cp_a.sheets["s"], cp_b.sheets["s"]
out_b = scb._couple_core(scb.mat("IvE"), scb.mat("EvI"), scb.mat("AvI"),
                         scb.state, jnp.asarray(fE))
stats_a, res_a = sca.couple_window(jnp.asarray(fE)[None])
fI_a = np.asarray(res_a["fI"]); fI_b = np.asarray(out_b[0])
print("fI shapes", fI_a.shape, fI_b.shape)
for k in range(8):
    fa = np.where(np.isfinite(fI_a[k]), fI_a[k], 0.0)
    fb_ = np.where(np.isfinite(fI_b[k]), fI_b[k], 0.0)
    print(f"fI row {k}: maxdiff {np.abs(fa-fb_).max():.3e}  scale {np.abs(fb_).max():.3e}")
sb = np.asarray(out_b[4]); sa = np.asarray(stats_a[0])
print("stats stepwise:", [f"{v:.6e}" for v in sb[:5]])
print("stats fused   :", [f"{v:.6e}" for v in sa[:5]])

# phase 4: WHICH cells differ?
d1 = np.where(np.isfinite(fI_a[1]), fI_a[1], 0.0) - np.where(np.isfinite(fI_b[1]), fI_b[1], 0.0)
bad = np.nonzero(np.abs(d1) > 0.1)[0]
nx2, nyc2 = 32, nyc
print("n bad cells:", len(bad), "of", fI_a.shape[1])
print("bad rows (y):", sorted(set((bad // nx2).tolist()))[:20])
print("real rows:", nyc2, "padded rows:", fI_a.shape[1] // nx2)
print("vals a:", fI_a[1][bad[:5]], "vals b:", fI_b[1][bad[:5]])

# phase 5: ShardedPallasView vs ArgShardedView on the same input
from icebin_tpu.ops.pallas_bdt import PallasBDT
from icebin_tpu.parallel.pallas_spmv import (ArgShardedView,
                                             ShardedPallasBDT, _statics_of)
mesh8 = sca.mesh
m = sca.mat("IvE")
nk = tuple(n for n in PallasBDT._ARRAYS if m.spm.stacked[n] is not None)
lite = ShardedPallasBDT(stacked={}, template=m.spm.template,
                        n_shards=m.spm.n_shards, blk_ranges=m.spm.blk_ranges)
arrs = [m.spm.stacked[n] for n in nk]
av = ArgShardedView(mesh8, lite, nk, arrs, m.transposed, m.nice,
                    np.asarray(m._wS64), np.asarray(m._wI64), None, None)
fE_j = jnp.asarray(fE)
o1 = np.asarray(m.apply_coupler(fE_j, scale=True))
o2 = np.asarray(av.apply_coupler(fE_j, scale=True))
o1 = np.where(np.isfinite(o1), o1, 0.0); o2 = np.where(np.isfinite(o2), o2, 0.0)
print("view diff:", np.abs(o1 - o2).max(), "scale", np.abs(o1).max())
