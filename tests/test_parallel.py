"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md section 4:
the multi-host fake the reference never had)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icebin_tpu.grid.proj import PlateCarree
from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
from icebin_tpu.models.ice_sheet import IceSheetConfig, init_state, step
from icebin_tpu.ops.bdt import bdt_from_weighted
from icebin_tpu.parallel.coupled import make_sharded_step, shard_coupled_setup
from icebin_tpu.parallel.mesh import ICE_AXIS, make_mesh
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.matrices import RegridParams


def setup_sharded(nx=128, ny=32, na=6, nhc=3):
    scale = 10e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, na + 1),
                           latb=np.linspace(30.0, 70.0, na + 1))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, nx + 1),
                       yb=np.linspace(30.0 * scale, 70.0 * scale, ny + 1),
                       projection=PlateCarree(scale=scale))
    gr = GCMRegridder(specA, hcdefs=np.linspace(0.0, 3000.0, nhc))
    gr.add_sheet("s", specI, subdiv=1)
    ice_cfg = IceSheetConfig(nx=nx, ny=ny,
                             dx=float(np.diff(specI.xb)[0]),
                             dy=float(np.diff(specI.yb)[0]),
                             n_substeps_max=8)
    state = init_state(ice_cfg, dome_height=2000.0)
    elev = np.asarray(state.elevmask())
    rm = gr.regrid_matrices("s", elev)
    P_ = RegridParams(scale=True, correctA=True)
    # T must be uniform across shards: fix it explicitly
    ive = bdt_from_weighted(rm.matrix("IvE", P_), small_axis="cols",
                            max_tiles_per_block=6)
    evi = bdt_from_weighted(rm.matrix("EvI", P_), small_axis="rows",
                            max_tiles_per_block=6)
    assert ive.ov_rows is None and evi.ov_rows is None
    return gr, ice_cfg, state, ive, evi


def test_halo_exchange_matches_pad():
    from icebin_tpu.parallel.halo import halo_exchange_rows
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    mesh = make_mesh(4)
    x = jnp.arange(32.0 * 8).reshape(32, 8)

    fn = shard_map(lambda b: halo_exchange_rows(b, 2, ICE_AXIS)[2:-2],
                   mesh=mesh, in_specs=P(ICE_AXIS), out_specs=P(ICE_AXIS),
                   check_vma=False)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x))

    # ghosts themselves: compare halo width 1 against numpy edge-pad
    def keep_ghosts(b):
        g = halo_exchange_rows(b, 1, ICE_AXIS)
        return g[:1], g[-1:]  # lo ghost, hi ghost per shard

    fn2 = shard_map(keep_ghosts, mesh=mesh, in_specs=P(ICE_AXIS),
                    out_specs=(P(ICE_AXIS), P(ICE_AXIS)), check_vma=False)
    lo, hi = fn2(x)
    xs = np.asarray(x).reshape(4, 8, 8)
    expect_lo = np.stack([xs[0, 0], xs[0, -1], xs[1, -1], xs[2, -1]])
    expect_hi = np.stack([xs[1, 0], xs[2, 0], xs[3, 0], xs[3, -1]])
    np.testing.assert_allclose(np.asarray(lo), expect_lo)
    np.testing.assert_allclose(np.asarray(hi), expect_hi)


def test_sharded_step_matches_single_device():
    """The 8-way sharded coupled step reproduces the single-device step."""
    gr, ice_cfg, state, ive, evi = setup_sharded()
    mesh = make_mesh(8)
    ops, specs = shard_coupled_setup(mesh, ive, evi, state, ice_cfg)
    dt = 86400.0 * 30
    fn = make_sharded_step(mesh, ice_cfg, gr.nE, dt)
    n_in = 2
    rng = np.random.default_rng(0)
    fE = jnp.asarray(np.stack([1e-5 * rng.uniform(0.5, 1, gr.nE),
                               np.full(gr.nE, 300.0)]), jnp.float32)
    fac = jnp.ones(n_in, jnp.float32)
    off = jnp.zeros(n_in, jnp.float32)
    H1, fI, fE_out = fn(ops["ive_tiles"], ops["ive_rs"], ops["ive_wI"],
                        ops["evi_tiles"], ops["evi_rs"], ops["evi_wS"],
                        ops["H"], ops["bed"], fE, fac, off)

    # single-device reference using the plain apply + model step
    from icebin_tpu.ops.bdt import apply_bdt
    fI_ref = apply_bdt(ive, fE, scale=True, fill=jnp.nan)
    smb = jnp.where(jnp.isfinite(fI_ref[0]), fI_ref[0], 0.0)
    st_ref = step(ice_cfg, state, smb, dt)
    got = np.asarray(H1)
    want = np.asarray(st_ref.H)
    np.testing.assert_allclose(got, want, atol=1e-5)

    fI_np = np.asarray(fI)
    fI_ref_np = np.where(np.isfinite(np.asarray(fI_ref)), np.asarray(fI_ref), 0.0)
    np.testing.assert_allclose(fI_np, fI_ref_np, atol=1e-7)

    # EvI output: compare against plain apply of the same harvested fields
    icy = want.reshape(-1) > 1.0
    bed = np.asarray(state.bed).reshape(-1)
    outI = np.stack([np.where(icy, want.reshape(-1) + bed, 0.0),
                     np.where(icy, want.reshape(-1), 0.0),
                     icy.astype(np.float32)])
    fE_ref = apply_bdt(evi, jnp.asarray(outI), scale=True, fill=jnp.nan)
    a, b = np.asarray(fE_out), np.asarray(fE_ref)
    ok = np.isfinite(b)
    np.testing.assert_allclose(a[ok], b[ok], atol=1e-4)
    # masked rows agree too
    assert (np.isnan(a) == ~ok).all()


def test_sharded_conservation():
    """Mass reduction over the mesh equals the E-side inflow (no root
    gather, psum only)."""
    gr, ice_cfg, state, ive, evi = setup_sharded()
    mesh = make_mesh(8)
    ops, _ = shard_coupled_setup(mesh, ive, evi, state, ice_cfg)
    dt = 86400.0 * 30
    fn = make_sharded_step(mesh, ice_cfg, gr.nE, dt)
    fE = jnp.asarray(np.stack([np.full(gr.nE, 1e-5),
                               np.full(gr.nE, 300.0)]), jnp.float32)
    one = jnp.ones(2, jnp.float32)
    zero = jnp.zeros(2, jnp.float32)
    H1, fI, _ = fn(ops["ive_tiles"], ops["ive_rs"], ops["ive_wI"],
                   ops["evi_tiles"], ops["evi_rs"], ops["evi_wS"],
                   ops["H"], ops["bed"], fE, one, zero)
    m_in = float(np.sum(np.asarray(fE[0], np.float64) * np.asarray(ive.Mw, np.float64)))
    m_del = float(np.sum(np.asarray(fI[0], np.float64) * np.asarray(ive.wM, np.float64)))
    assert abs(m_in - m_del) / abs(m_in) < 1e-6   # f32 transport noise


def test_2d_sharded_step_matches_single_device():
    """(2, 4) 2-D decomposition: shared tile set applied both ways, halos
    on both axes, psum over the mesh -- trajectory equals single-device."""
    import dataclasses
    from icebin_tpu.parallel.coupled import (make_mesh_2d,
                                             make_sharded_step_2d,
                                             shard_coupled_setup_2d)

    gr, ice_cfg, state, ive, evi = setup_sharded(nx=256, ny=16)
    mesh = make_mesh_2d((4, 2))   # 4-way y, 2-way x (x shards need 128-cell blocks)
    ops = shard_coupled_setup_2d(mesh, evi, state, ice_cfg)
    dt = 86400.0 * 30
    fn = make_sharded_step_2d(mesh, ice_cfg, gr.nE, dt)
    rng = np.random.default_rng(0)
    fE = jnp.asarray(np.stack([1e-5 * rng.uniform(0.5, 1, gr.nE),
                               np.full(gr.nE, 300.0)]), jnp.float32)
    fac = jnp.ones(2, jnp.float32)
    off = jnp.zeros(2, jnp.float32)
    H1, fI, fE_out = fn(ops, fE, fac, off)

    from icebin_tpu.ops.bdt import apply_bdt, apply_bdt_T
    fI_ref = apply_bdt_T(evi, fE, scale=True, fill=jnp.nan)
    smb = jnp.where(jnp.isfinite(fI_ref[0]), fI_ref[0], 0.0)
    st_ref = step(ice_cfg, state, smb, dt)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(st_ref.H),
                               atol=1e-5)
    fI_ref0 = np.where(np.isfinite(np.asarray(fI_ref)),
                       np.asarray(fI_ref), 0.0)
    np.testing.assert_allclose(np.asarray(fI), fI_ref0, atol=1e-7)
    icy = np.asarray(st_ref.H).reshape(-1) > 1.0
    outI = np.stack([np.where(icy, np.asarray(st_ref.surface).reshape(-1), 0.0),
                     np.where(icy, np.asarray(st_ref.H).reshape(-1), 0.0),
                     icy.astype(np.float32)])
    fE_ref = apply_bdt(evi, jnp.asarray(outI), scale=True, fill=jnp.nan)
    a, b = np.asarray(fE_out), np.asarray(fE_ref)
    ok = np.isfinite(b)
    np.testing.assert_allclose(a[ok], b[ok], atol=1e-4)
