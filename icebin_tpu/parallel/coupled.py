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
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from icebin_tpu.models.ice_sheet import IceSheetConfig, sia_flux_div_ghosted
from icebin_tpu.ops.bdt import (TILE_C, BDTMatrix, tiles_dest_ice_unscaled,
                                tiles_dest_small_unscaled)
from icebin_tpu.parallel.halo import halo_exchange_rows
from icebin_tpu.parallel.mesh import ICE_AXIS

__all__ = ["shard_coupled_setup", "make_sharded_step"]


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


def _sia_substeps_local(H, bed, smb, dt, cfg: IceSheetConfig, dx, dy,
                        n_substeps):
    """Local SIA substepping with per-substep 1-row halo exchange."""

    def substep(carry, _):
        Hl, t_done = carry
        Hg = halo_exchange_rows(Hl, 1, ICE_AXIS)
        bg = halo_exchange_rows(bed, 1, ICE_AXIS)
        div, Dmax_local = sia_flux_div_ghosted(Hg, Hg + bg, dx, dy)
        Dmax = jax.lax.pmax(Dmax_local, ICE_AXIS)
        cfl = jnp.where(Dmax > 0, 0.25 * min(dx, dy) ** 2 / (Dmax + 1e-30),
                        cfg.dt_max)
        dt_sub = jnp.maximum(
            jnp.minimum(jnp.minimum(cfl, cfg.dt_max), dt - t_done), 0.0)
        Hn2 = jnp.maximum(Hl + (div + smb) * dt_sub.astype(Hl.dtype), 0.0)
        return (Hn2, t_done + dt_sub), None

    (H1, _), _ = jax.lax.scan(substep, (H, jnp.zeros((), H.dtype)), None,
                              length=n_substeps)
    return H1


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

        # 2. local ice dynamics with ring halo exchange
        H1 = _sia_substeps_local(H, bed, smb, dt, ice_cfg,
                                 ice_cfg.dx, ice_cfg.dy,
                                 ice_cfg.n_substeps_max)

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
