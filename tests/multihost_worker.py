"""Worker process for tests/test_multihost.py — one simulated HOST.

Run as: python multihost_worker.py <process_id> <num_processes> <port>

Each process gets 4 virtual CPU devices; ``jax.distributed`` joins them
into one 8-device multi-controller program (the DCN story of SURVEY.md
§5.8 — the reference's MPI ranks [U GCMCoupler.cpp] with no root rank).
The worker builds the SAME small regrid matrix set on every process
(determinism replaces broadcast), runs the sharded Pallas EvI + IvE
applies over the global mesh, and asserts against the host f64 oracle +
the conservation identity.  Exit code 0 == pass.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # f64 conservation ledger

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from icebin_tpu.parallel.distributed import (global_field, global_ice_mesh,  # noqa: E402
                                             init_multihost, local_ice_range)


def main():
    init_multihost(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_dev = len(jax.devices())
    assert n_dev == ndev * nproc, f"global devices {n_dev}"

    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
    from icebin_tpu.parallel.pallas_spmv import (make_sharded_apply_ice,
                                                 make_sharded_apply_small,
                                                 sharded_pallas_from_weighted)
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.regrid.matrices import RegridParams

    # small real matrix set, built identically on every process
    scale = 10e3
    nx, ny, na, nhc = 64, 128, 8, 3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, na + 1),
                           latb=np.linspace(30.0, 70.0, na + 1))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, nx + 1),
                       yb=np.linspace(30.0 * scale, 70.0 * scale, ny + 1),
                       projection=PlateCarree(scale=scale))
    gr = GCMRegridder(specA, hcdefs=np.linspace(0.0, 3000.0, nhc))
    gr.add_sheet("s", specI, subdiv=1)
    c = specI.cell_centers()
    r2 = (((c[:, 0] - specI.xb.mean()) / (np.ptp(specI.xb) / 2.1)) ** 2
          + ((c[:, 1] - specI.yb.mean()) / (np.ptp(specI.yb) / 2.1)) ** 2)
    elev = np.where(r2 < 1.0, 2500.0 * (1.0 - r2), np.nan)
    rm = gr.regrid_matrices("s", elev)
    Me = rm.matrix("EvI", RegridParams(scale=True, correctA=True))
    nice = Me.shape[1]

    mesh = global_ice_mesh()
    spm = sharded_pallas_from_weighted(mesh, Me, small_axis="rows", nv=8)

    rng = np.random.default_rng(0)
    f = rng.uniform(0.5, 1.5, (8, nice))

    # host-side shard-blocked layout; this process contributes ONLY the rows
    # of its addressable devices (no host ever holds the device-global array)
    fb_host = spm.ice_to_blocked_host(f, nice)
    bpd = spm.template.nblkpad
    mine = sorted({d.process_index for d in mesh.devices.reshape(-1)})
    assert mine == list(range(nproc))
    my_devs = [i for i, d in enumerate(mesh.devices.reshape(-1))
               if d.process_index == jax.process_index()]
    r0, r1 = min(my_devs) * bpd, (max(my_devs) + 1) * bpd
    fb = global_field(mesh, fb_host[r0:r1])

    e3 = make_sharded_apply_small(mesh, spm, interpret=True)(fb)

    # oracle: scaled EvI apply in f64 on host
    import scipy.sparse as sp
    M = sp.coo_matrix((Me.vals, (Me.rows, Me.cols)), shape=Me.shape).tocsr()
    wM = np.asarray(Me.wM)
    ref = (M @ f.T).T / np.where(wM == 0, 1.0, wM)[None, :]
    got = np.asarray(spm.template.e3_to_small(np.asarray(e3)))
    np.testing.assert_allclose(got[:, :len(wM)][:, wM != 0],
                               ref[:, wM != 0], rtol=2e-5, atol=1e-7)

    # conservation identity on the sharded apply: sum(out*wM) == sum(f*Mw)
    m_out = (got[:, :len(wM)] * wM[None, :]).sum(axis=1)
    m_src = (f * np.asarray(Me.Mw)[None, :]).sum(axis=1)
    np.testing.assert_allclose(m_out, m_src, rtol=1e-5)

    # reverse direction: IvE over the same tile set, purely local per device
    out_blocked = make_sharded_apply_ice(mesh, spm, interpret=True)(e3)
    i0, i1 = local_ice_range(mesh, nice)
    assert (i1 - i0) > 0
    # validate this process's local shards against the oracle
    MT = M.T.tocsr()
    wI = np.asarray(Me.Mw)
    refI = (MT @ got[:, :len(wM)].T).T / np.where(wI == 0, 1.0, wI)[None, :]
    shards = sorted(out_blocked.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    loc = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    width = spm.blk_ranges[0][1] - spm.blk_ranges[0][0]
    # strip per-device block padding before comparing
    cols = []
    for k in range(len(my_devs)):
        cols.append(loc[k * bpd:k * bpd + width]
                    .transpose(1, 0, 2).reshape(8, -1))
    locI = np.concatenate(cols, axis=1)[:, :max(0, i1 - i0)]
    refI_loc = refI[:, i0:i1]
    ok = wI[i0:i1] != 0
    np.testing.assert_allclose(locI[:, ok], refI_loc[:, ok],
                               rtol=2e-5, atol=1e-7)
    # --- phase 2: the PRODUCTION mesh coupler, fused transient windows,
    # across processes (multi-controller coupling with regen + E1vE0;
    # state sharded over the global mesh, elevmask re-assembled with one
    # process_allgather at regeneration)
    from icebin_tpu.coupler.coupler import (CouplerConfig, GCMCoupler,
                                            IceSheetCoupler)
    from icebin_tpu.models.ice_sheet import IceSheetConfig
    # RAGGED row count (not divisible by the nproc x ndev global mesh):
    # exercises the replicated-pad-row decomposition across PROCESSES
    nyc = 4 * (ndev * nproc) + 4
    specI2 = GridSpecXY(xb=np.linspace(0.0, 16.0 * scale, 33),
                        yb=np.linspace(40.0 * scale, 72.0 * scale, nyc + 1),
                        projection=PlateCarree(scale=scale))
    specA2 = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                            latb=np.linspace(30.0, 80.0, 7))
    gr2 = GCMRegridder(specA2, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    gr2.add_sheet("s", specI2, subdiv=1)
    cfg2 = CouplerConfig(dt=86400.0 * 30, regen_every=4)
    cp = GCMCoupler(gr2, cfg2, mesh=mesh)
    rng2 = np.random.default_rng(2)
    fE = np.zeros((8, gr2.nE))
    fE[0] = 1e-5 * rng2.uniform(0.5, 1.0, gr2.nE)
    fE[1] = 5.0                     # surface enthalpy: energy books live
    fE[3] = 2.0
    fE[4] = 4.0                     # WARM: PDD melt -> mass-loss fluxes
    fE[5] = 0.06
    cp.run_transient(lambda t, s: fE, 6, fused=True)    # crosses a regen
    rows = cp.ledger.to_rows()
    assert len(rows) == 6
    worst = max(abs(r["s.mass_in_E"] - r["s.mass_delivered_I"])
                / abs(r["s.mass_in_E"]) for r in rows)
    assert worst < 1e-10, worst
    # per-step closure incl. the returned-mass and energy books; the
    # mass-loss path is ALIVE (nonzero runoff under the warm forcing)
    prev = prev_e = None
    for r in rows:
        if prev is not None:
            lhs = r["s.ice_mass"] - prev
            rhs = (r["s.mass_delivered_I"] - r["s.mass_returned_I"]
                   + r["s.mass_clamp_I"] + r["s.mass_residual"])
            assert abs(lhs - rhs) / abs(r["s.ice_mass"]) < 1e-12
            lhe = r["s.energy_storage_I"] - prev_e
            rhe = (r["s.energy_delivered_I"] - r["s.energy_returned_I"]
                   - r["s.energy_clamp_I"] + r["s.energy_residual"])
            scaleE = max(abs(r["s.energy_storage_I"]),
                         abs(r["s.energy_delivered_I"]))
            assert abs(lhe - rhe) / scaleE < 1e-12
        assert r["s.mass_returned_I"] > 0
        prev = r["s.ice_mass"]
        prev_e = r["s.energy_storage_I"]

    # books match a SINGLE-DEVICE single-process run of the same config
    # (each process computes the reference locally; determinism replaces
    # broadcast)
    gr3 = GCMRegridder(specA2, hcdefs=[0.0, 500.0, 1000.0, 2000.0, 3000.0])
    gr3.add_sheet("s", specI2, subdiv=1)
    cp1 = GCMCoupler(gr3, cfg2, sheets={
        "s": IceSheetCoupler(gr3, "s", cfg2)})
    cp1.run_transient(lambda t, s: fE, 6, fused=False)
    rows1 = cp1.ledger.to_rows()
    for key in ("ice_mass", "mass_returned_I", "energy_storage_I",
                "energy_returned_I"):
        a = np.array([r[f"s.{key}"] for r in rows1])
        b = np.array([r[f"s.{key}"] for r in rows])
        np.testing.assert_allclose(b, a, rtol=1e-6)

    print(f"proc {pid}: multihost OK ({nproc} procs x {ndev} devices; "
          f"fused mesh coupler worst {worst:.2e})", flush=True)


if __name__ == "__main__":
    main()
