"""Explicitly-sharded coupled step: ice-domain decomposition via shard_map.

The multi-chip design mandated by the north star (SURVEY.md section 2.11):
the ice grid's y axis is decomposed over the "ice" mesh axis; the small A/E
spaces and their weights are replicated.  Per step, on each device:

  1. IvE transport: purely LOCAL (fE replicated, local BDT blocks produce
     the local ice rows) -- zero communication.
  2. SIA ice dynamics: local stencil update with ONE row of ghosts exchanged
     per substep via ppermute rings over ICI (``parallel.halo``) -- the ring
     halo pattern replacing PISM's PETSc DA ghost updates; the stability
     (CFL) reduction is a pmin.
  3. EvI harvest: local partial E sums, then ONE psum over the mesh --
     replacing the reference's gather-everything-to-root with a reduction
     (SURVEY.md section 5.8 design rule).

Layout requirements (enforced by ``shard_coupled_setup``): nx % 128 == 0 so
BDT ice blocks align with lattice rows, and ny % n_devices == 0 so the block
axis shards evenly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from icebin_tpu.models.ice_sheet import (IceSheetConfig,
                                         sia_flux_div_energy_ghosted,
                                         sia_flux_div_ghosted)
from icebin_tpu.ops.bdt import (TILE_C, TILE_R, BDTMatrix,
                                tiles_dest_ice_unscaled,
                                tiles_dest_small_unscaled)
from icebin_tpu.parallel.halo import halo_exchange_rows
from icebin_tpu.parallel.mesh import ICE_AXIS

__all__ = ["shard_coupled_setup", "make_sharded_step",
           "make_sharded_ice_step"]


def make_sharded_ice_step(mesh, ny_real=None):
    """``models.ice_sheet.step_coupled``-compatible ice advance over the
    mesh.

    Returns fn(cfg, state, smb_flux, tsurf, dt, enth_flux=None) ->
    (state, IceFluxes) with the SIA + enthalpy-column substeps running in
    shard_map (1-D y decomposition, ppermute halo rings of H AND the
    energy column, pmax CFL) -- the PISM/PETSc-DA ghost-update analog.
    Drop-in for ``IceSheetCoupler.ice_step`` so the PRODUCTION coupler
    (ledger, E1vE0, regen cadence, writer) runs mesh-decomposed.

    ``ny_real``: RAGGED decomposition support (cfg.ny is the row-PADDED
    lattice; only the first ny_real rows are physical).  The pad rows
    hold a copy of the last real row, maintained after every substep: the
    surface slope across the real/pad face is then EXACTLY zero, so the
    boundary flux matches the single-device edge-replicated ghost
    bit-for-bit, and pad-row fluxes are masked out of the returned books
    (reference: PETSc DA ragged decomposition [U]; SURVEY.md
    section 5.7).
    """
    import functools
    from icebin_tpu.models.ice_sheet import (L_FUSION as _LF,
                                             RHO_ICE as _RHO, IceFluxes,
                                             IceSheetState)

    n = int(mesh.devices.size)

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "dt", "has_ts", "has_ef"))
    def _advance(cfg, H, bed, U, smb_flux, tsurf, enth_flux, dt, has_ts,
                 has_ef):
        smb2 = (jnp.asarray(smb_flux).reshape(cfg.ny, cfg.nx) / _RHO
                ).astype(H.dtype)
        ts2 = (jnp.asarray(tsurf).reshape(cfg.ny, cfg.nx).astype(H.dtype)
               if has_ts else jnp.zeros_like(smb2))
        ef2 = (jnp.asarray(enth_flux).reshape(cfg.ny, cfg.nx)
               .astype(H.dtype) if has_ef else jnp.zeros_like(smb2))
        ny_l = cfg.ny // n

        def local(Hl, bedl, Ul, smbl, tsl, efl):
            if ny_real is not None and ny_real != cfg.ny:
                d = jax.lax.axis_index(ICE_AXIS)
                r0 = jnp.clip(ny_real - d * ny_l, 0, ny_l)
            else:
                r0 = None
            return _sia_substeps_local(Hl, bedl, smbl,
                                       tsl if has_ts else None, dt, cfg,
                                       cfg.dx, cfg.dy, cfg.n_substeps_max,
                                       rows_real=r0, U=Ul,
                                       e_srf=efl if has_ef else None)

        sm = shard_map(local, mesh=mesh, in_specs=(P(ICE_AXIS),) * 6,
                       out_specs=(P(ICE_AXIS),) * 10, check_vma=False)
        return sm(H, bed, U, smb2, ts2, ef2)

    def step_like(cfg, state, smb_flux, tsurf, dt, enth_flux=None):
        if cfg.ny % n:
            raise ValueError(f"ny={cfg.ny} not divisible by {n} devices")
        (H1, U1, melt, basal, calv, er, ec, elat, clamp_s,
         eclamp_s) = _advance(
            cfg, state.H, state.bed, state.enth, smb_flux,
            tsurf if tsurf is not None else state.H,
            enth_flux if enth_flux is not None else state.H,
            dt, tsurf is not None, enth_flux is not None)
        new_state = IceSheetState(H=H1, bed=state.bed, t=state.t + dt,
                                  enth=U1)
        fx = IceFluxes(runoff=melt * (_RHO / dt),
                       basal_melt=basal * (_RHO / dt),
                       calving=calv * (_RHO / dt),
                       mass_clamp=jnp.sum(clamp_s) * (_RHO / dt),  # scalar
                       enth_runoff=er / dt,
                       enth_basal=basal * (_RHO * _LF / dt),  # derived
                       enth_calving=ec / dt,
                       enth_clamp=jnp.sum(eclamp_s) / dt,     # scalar
                       # implied-atmospheric share only (round 5; the
                       # column-supplied part rides enth_runoff)
                       latent_pdd=melt * (_RHO * _LF / dt) - elat / dt)
        return new_state, fx

    step_like.jittable = True    # pure shard_map: safe under an outer jit
    return step_like


def shard_coupled_setup(mesh, ive: BDTMatrix, evi: BDTMatrix, state,
                        ice_cfg: IceSheetConfig):
    """Device-place the operands with the ice-decomposed sharding.

    Returns (operands dict, shardings dict) ready for ``make_sharded_step``.
    """
    n = mesh.devices.size
    if ice_cfg.nx % TILE_C != 0:
        raise ValueError(f"sharded path requires nx % {TILE_C} == 0")
    if ice_cfg.ny % n != 0:
        raise ValueError(f"ny={ice_cfg.ny} not divisible by {n} devices")
    shard_blk = NamedSharding(mesh, P(ICE_AXIS))         # leading block axis
    shard_rows = NamedSharding(mesh, P(ICE_AXIS))        # leading y axis
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    ops = {
        "ive_tiles": put(ive.tiles, shard_blk),
        "ive_rs": put(ive.row_start, shard_blk),
        "ive_wI": put(ive.wI.reshape(ice_cfg.ny, ice_cfg.nx), shard_rows),
        "evi_tiles": put(evi.tiles, shard_blk),
        "evi_rs": put(evi.row_start, shard_blk),
        "evi_wS": put(evi.wS, repl),
        "H": put(state.H, shard_rows),
        "bed": put(state.bed, shard_rows),
    }
    specs = {
        "ive_tiles": P(ICE_AXIS), "ive_rs": P(ICE_AXIS),
        "ive_wI": P(ICE_AXIS), "evi_tiles": P(ICE_AXIS),
        "evi_rs": P(ICE_AXIS), "evi_wS": P(), "H": P(ICE_AXIS),
        "bed": P(ICE_AXIS),
    }
    return ops, specs


def _sia_substeps_local(H, bed, smb, tsurf, dt, cfg: IceSheetConfig, dx, dy,
                        n_substeps, rows_real=None, U=None, e_srf=None):
    """Local SIA + enthalpy-column substepping with per-substep 1-row halo
    exchange (H AND U ride the ring -- the energy column advects with the
    mass flux), plus the shared ablation/energy pass on the SAME ghosted
    thickness the dynamics used -- sharded trajectories and returned
    mass/energy books are bit-identical to the single-device
    ``step_coupled``.

    ``rows_real``: per-shard count of PHYSICAL rows (ragged decomposition);
    trailing pad rows are re-replicated from the last real row after every
    update so the real/pad boundary flux is exactly zero, and pad-row
    fluxes never reach the cumulative books.

    Returns (H1, U1, melt, basal, calv, eU_run, eU_calv, elat, clamp_s,
    eclamp_s): six cumulative per-cell totals [m] / [J m-2] plus two
    (1,)-shaped LOCAL scalar clamp books (ledger-only; the caller sums
    across shards); ``U=None`` runs a zero energy column (demo paths).
    ``elat`` is the column-supplied share of the surface-melt latent heat
    (round 5 PDD/enthalpy unification -- see
    ``models.ice_sheet.apply_ablation_energy``)."""
    from icebin_tpu.models.ice_sheet import (ablation_ghosted,
                                             apply_ablation_energy)

    if U is None:
        U = jnp.zeros_like(H)
    if rows_real is not None:
        live = (jax.lax.broadcasted_iota(jnp.int32, H.shape, 0)
                < rows_real)

    def _fix_pad(Hn):
        """Copy the last real row into the pad rows (no-op when all real)."""
        last = jnp.take(Hn, jnp.maximum(rows_real - 1, 0), axis=0)
        return jnp.where(live, Hn, last[None, :])

    def padx(a):   # x is unsharded in the 1-D decomposition
        return jnp.concatenate([a[:, :1], a, a[:, -1:]], axis=1)

    bg = padx(halo_exchange_rows(bed, 1, ICE_AXIS))   # loop-invariant

    def substep(carry):
        Hl, Ul, t_done, cums, clamp_s, eclamp_s, it = carry
        Hg = padx(halo_exchange_rows(Hl, 1, ICE_AXIS))
        Ug = padx(halo_exchange_rows(Ul, 1, ICE_AXIS))
        div, divE, Dmax_local = sia_flux_div_energy_ghosted(
            Hg, Hg + bg, Ug, dx, dy)
        Dmax = jax.lax.pmax(Dmax_local, ICE_AXIS)
        cfl = jnp.where(Dmax > 0, 0.25 * min(dx, dy) ** 2 / (Dmax + 1e-30),
                        cfg.dt_max)
        dt_sub = jnp.maximum(
            jnp.minimum(jnp.minimum(cfl, cfg.dt_max), dt - t_done), 0.0)
        dts = dt_sub.astype(Hl.dtype)
        H_dyn = Hl + (div + smb) * dts
        Hn2 = jnp.maximum(H_dyn, 0.0)
        clampg = Hn2 - H_dyn
        if rows_real is not None:
            clampg = jnp.where(live, clampg, 0.0)
        clamp_s = clamp_s + jnp.sum(clampg)
        Un2 = Ul + divE * dts
        if e_srf is not None:
            Un2 = Un2 + e_srf * dts
        if tsurf is not None:
            Hn2, melt, calv = ablation_ghosted(Hg, Hn2, tsurf, cfg, dts)
            H_pre = Hn2 + melt + calv
            (Hn2, Un2, basal, eU_run, eU_calv,
             e_clamp, e_lat) = apply_ablation_energy(H_pre, Un2, melt,
                                                     calv)
            deltas = (melt, basal, calv, eU_run, eU_calv, e_lat)
            if rows_real is not None:
                deltas = tuple(jnp.where(live, d, 0.0) for d in deltas)
            cums = [c + d for c, d in zip(cums, deltas)]
        else:
            e_clamp = jnp.where(Hn2 > 0, 0.0, Un2)
            Un2 = jnp.where(Hn2 > 0, Un2, 0.0)
        if rows_real is not None:
            e_clamp = jnp.where(live, e_clamp, 0.0)
            Hn2 = _fix_pad(Hn2)
            Un2 = _fix_pad(Un2)
        eclamp_s = eclamp_s + jnp.sum(e_clamp)
        return (Hn2, Un2, t_done + dt_sub, cums, clamp_s, eclamp_s,
                it + 1)

    z = jnp.zeros_like(H)
    zs = jnp.zeros((), H.dtype)
    # while_loop early exit (bit-identical: zero-dt substeps are exact
    # no-ops); every shard agrees on the trip count because dt_sub comes
    # from the GLOBAL pmax'd CFL
    (H1, U1, _, cums, clamp_s, eclamp_s, _it) = jax.lax.while_loop(
        lambda c: (c[2] < dt) & (c[6] < n_substeps),
        substep,
        (H, U, jnp.zeros((), H.dtype), [z] * 6, zs, zs,
         jnp.zeros((), jnp.int32)))
    return (H1, U1) + tuple(cums) + (clamp_s.reshape(1),
                                     eclamp_s.reshape(1))


def make_sharded_step(mesh, ice_cfg: IceSheetConfig, nsmall_E: int,
                      dt: float, rho_ice: float = 910.0):
    """Build the jitted, explicitly-sharded coupled step.

    Returned fn(ops, fE_in, fac, off) -> (H_new, fI_local..., fE_out):
    fE_in (n_in, nE) replicated; H/tiles sharded per ``shard_coupled_setup``.
    """
    n = mesh.devices.size
    ny_l = ice_cfg.ny // n
    nblk_row = ice_cfg.nx // TILE_C

    def local_step(ive_tiles, ive_rs, ive_wI, evi_tiles, evi_rs, evi_wS,
                   H, bed, fE_in, fac, off):
        # 1. IvE transport (local; fE replicated)
        raw = tiles_dest_ice_unscaled(ive_tiles, ive_rs,
                                      jnp.where(jnp.isfinite(fE_in), fE_in, 0.0))
        wI = ive_wI.reshape(-1)
        safe = jnp.where(wI != 0, wI, 1.0)
        fI = jnp.where(wI[None, :] != 0, raw / safe, 0.0)
        fI = fI * fac[:, None] + off[:, None] * (wI[None, :] != 0)
        smb = (fI[0] / rho_ice).reshape(ny_l, ice_cfg.nx).astype(H.dtype)

        # 2. local ice dynamics with ring halo exchange (mass only: the
        #    demo step carries no energy column)
        H1 = _sia_substeps_local(H, bed, smb, None, dt, ice_cfg,
                                 ice_cfg.dx, ice_cfg.dy,
                                 ice_cfg.n_substeps_max)[0]

        # 3. EvI harvest: local partials + ONE psum (no root gather)
        icy = H1.reshape(-1) > 1.0
        elev = jnp.where(icy, (H1 + bed).reshape(-1), 0.0)
        outI = jnp.stack([elev, jnp.where(icy, H1.reshape(-1), 0.0),
                          icy.astype(H1.dtype)])
        fi_blocks = outI.reshape(3, ny_l * nblk_row, TILE_C)
        partial = tiles_dest_small_unscaled(evi_tiles, evi_rs, fi_blocks,
                                            nsmall_E)
        tot = jax.lax.psum(partial, ICE_AXIS)
        safeS = jnp.where(evi_wS != 0, evi_wS, 1.0)
        fE_out = jnp.where(evi_wS[None, :] != 0, tot / safeS, jnp.nan)
        return H1, fI, fE_out

    sm = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(ICE_AXIS), P(ICE_AXIS), P(ICE_AXIS), P(ICE_AXIS),
                  P(ICE_AXIS), P(), P(ICE_AXIS), P(ICE_AXIS), P(), P(), P()),
        out_specs=(P(ICE_AXIS), P(None, ICE_AXIS), P()),
        check_vma=False)
    return jax.jit(sm)


# -- 2-D decomposition (SURVEY.md section 5.7: PETSc-DA-style 2-D blocks) --

ICE_X = "icex"
ICE_Y = "icey"


def make_mesh_2d(shape):
    """(ny_dev, nx_dev) mesh with axes (icey, icex)."""
    import numpy as _np
    devs = jax.devices()
    n = shape[0] * shape[1]
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return jax.sharding.Mesh(_np.array(devs[:n]).reshape(shape),
                             (ICE_Y, ICE_X))


def shard_coupled_setup_2d(mesh, evi: BDTMatrix, state,
                           ice_cfg: IceSheetConfig):
    """Place operands for the 2-D step.  One shared tile set (EvI; IvE is
    its transpose).  Tiles reshape to (ny, nbx, T, 8, 128) so BOTH leading
    dims shard; requires nx % (128 * nx_dev) == 0 and ny % ny_dev == 0."""
    ny_dev, nx_dev = mesh.devices.shape
    nbx = ice_cfg.nx // TILE_C
    if ice_cfg.nx % (TILE_C * nx_dev) or ice_cfg.ny % ny_dev:
        raise ValueError("grid does not tile the 2-D mesh")
    nblk, T = evi.row_start.shape
    if nblk != ice_cfg.ny * nbx:
        raise ValueError("BDT blocks do not match the lattice")
    P2 = P(ICE_Y, ICE_X)
    sh = lambda spec: jax.sharding.NamedSharding(mesh, spec)
    tiles = jnp.reshape(evi.tiles, (ice_cfg.ny, nbx, T, TILE_R, TILE_C))
    rs = jnp.reshape(evi.row_start, (ice_cfg.ny, nbx, T))
    wI2 = jnp.reshape(evi.wI, (ice_cfg.ny, ice_cfg.nx))
    ops = {
        "tiles": jax.device_put(tiles, sh(P2)),
        "rs": jax.device_put(rs, sh(P2)),
        "wI": jax.device_put(wI2, sh(P2)),
        "wS": jax.device_put(evi.wS, sh(P())),
        "H": jax.device_put(state.H, sh(P2)),
        "bed": jax.device_put(state.bed, sh(P2)),
    }
    return ops


def make_sharded_step_2d(mesh, ice_cfg: IceSheetConfig, nsmall_E: int,
                         dt: float, rho_ice: float = 910.0):
    """2-D (icey, icex) coupled step: one shared tile set applied in both
    directions, halo exchange on both axes, psum over the whole mesh."""
    ny_dev, nx_dev = mesh.devices.shape
    ny_l = ice_cfg.ny // ny_dev
    nbx_l = ice_cfg.nx // TILE_C // nx_dev
    nx_l = ice_cfg.nx // nx_dev
    from icebin_tpu.parallel.halo import halo_exchange_cols

    def local_step(tiles, rs, wI, wS, H, bed, fE_in, fac, off):
        tl = tiles.reshape(ny_l * nbx_l, tiles.shape[2], TILE_R, TILE_C)
        rl = rs.reshape(ny_l * nbx_l, rs.shape[2])
        # IvE transport: transposed apply of the shared tiles, local blocks
        fs = jnp.where(jnp.isfinite(fE_in), fE_in, 0.0)
        fs = jnp.where(wS[None, :] != 0, fs, 0.0)
        # scale SOURCE means into integrals is not needed: transposed apply
        # consumes E means directly (entries are areas)
        raw = tiles_dest_ice_unscaled(tl, rl, fs)
        wIl = wI.reshape(-1)
        safe = jnp.where(wIl != 0, wIl, 1.0)
        fI = jnp.where(wIl[None, :] != 0, raw / safe, 0.0)
        fI = fI * fac[:, None] + off[:, None] * (wIl[None, :] != 0)
        smb = (fI[0] / rho_ice).reshape(ny_l, nx_l).astype(H.dtype)

        def substep(carry, _):
            Hl, t_done = carry
            Hg = halo_exchange_cols(
                halo_exchange_rows(Hl, 1, ICE_Y), 1, ICE_X)
            bg = halo_exchange_cols(
                halo_exchange_rows(bed, 1, ICE_Y), 1, ICE_X)
            div, Dm = sia_flux_div_ghosted(Hg, Hg + bg, ice_cfg.dx,
                                           ice_cfg.dy)
            Dmax = jax.lax.pmax(jax.lax.pmax(Dm, ICE_Y), ICE_X)
            cfl = jnp.where(Dmax > 0,
                            0.25 * min(ice_cfg.dx, ice_cfg.dy) ** 2
                            / (Dmax + 1e-30), ice_cfg.dt_max)
            dt_sub = jnp.maximum(
                jnp.minimum(jnp.minimum(cfl, ice_cfg.dt_max), dt - t_done),
                0.0)
            Hn = jnp.maximum(Hl + (div + smb) * dt_sub.astype(Hl.dtype), 0.0)
            return (Hn, t_done + dt_sub), None

        (H1, _), _ = jax.lax.scan(substep, (H, jnp.zeros((), H.dtype)),
                                  None, length=ice_cfg.n_substeps_max)

        icy = H1.reshape(-1) > 1.0
        outI = jnp.stack([jnp.where(icy, (H1 + bed).reshape(-1), 0.0),
                          jnp.where(icy, H1.reshape(-1), 0.0),
                          icy.astype(H1.dtype)])
        fi_blocks = outI.reshape(3, ny_l * nbx_l, TILE_C)
        partial = tiles_dest_small_unscaled(tl, rl, fi_blocks, nsmall_E)
        tot = jax.lax.psum(jax.lax.psum(partial, ICE_Y), ICE_X)
        safeS = jnp.where(wS != 0, wS, 1.0)
        fE_out = jnp.where(wS[None, :] != 0, tot / safeS, jnp.nan)
        return H1, fI.reshape(fI.shape[0], ny_l, nx_l), fE_out

    P2 = P(ICE_Y, ICE_X)
    sm = shard_map(
        local_step, mesh=mesh,
        in_specs=(P2, P2, P2, P(), P2, P2, P(), P(), P()),
        out_specs=(P2, P(None, ICE_Y, ICE_X), P()),
        check_vma=False)

    def fn(ops, fE_in, fac, off):
        H1, fI, fE_out = sm(ops["tiles"], ops["rs"], ops["wI"], ops["wS"],
                            ops["H"], ops["bed"], fE_in, fac, off)
        # fI arrives (nvar, ny, nx) lattice-shaped; flatten to cell order
        return H1, fI.reshape(fI.shape[0], -1), fE_out

    return jax.jit(fn)
