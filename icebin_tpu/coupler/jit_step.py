"""The jittable coupled step: one fused device computation per coupling
interval (the 'flagship model forward step').

Reference equivalent: the inner body of ``IceCoupler::couple`` -- IvE apply,
unit conversion, ice model timestep, EvI harvest [U] -- which the reference
runs as separate host-orchestrated stages on the MPI root.  Here the whole
chain is ONE XLA computation: transport, ice dynamics, and harvest fuse, and
the same function jits under a device mesh with sharded operands
(``icebin_tpu.parallel.coupled`` is the explicitly-sharded shard_map twin).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from icebin_tpu.models.ice_sheet import IceSheetConfig, IceSheetState, step
from icebin_tpu.ops.bdt import BDTMatrix, apply_bdt

__all__ = ["coupled_step"]


@functools.partial(jax.jit, static_argnames=("ice_cfg", "dt"))
def coupled_step(ive: BDTMatrix, evi: BDTMatrix, ice_cfg: IceSheetConfig,
                 state: IceSheetState, fE_in, fac, off, dt: float):
    """One coupling interval, fully on device.

    fE_in: (n_in, nE) GCM-side forcings (row 0 = SMB mass flux after
    conversion by fac/off).  Returns (new_state, fI, fE_out).
    """
    fI = apply_bdt(ive, fE_in, scale=True, var_factor=fac, var_offset=off,
                   fill=jnp.nan)
    smb = jnp.where(jnp.isfinite(fI[0]), fI[0], 0.0)
    new_state = step(ice_cfg, state, smb, dt)
    icy = new_state.H.reshape(-1) > 1.0
    elev = jnp.where(icy, new_state.surface.reshape(-1), 0.0)
    thick = jnp.where(icy, new_state.H.reshape(-1), 0.0)
    outI = jnp.stack([elev, thick, icy.astype(elev.dtype)])
    fE_out = apply_bdt(evi, outI, scale=True, fill=jnp.nan)
    return new_state, fI, fE_out
