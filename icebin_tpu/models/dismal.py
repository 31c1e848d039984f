"""DISMAL: the do-nothing 'writer' ice model.

Reference: besides PISM, IceBin ships a second ice-coupler family, DISMAL
(Demo Ice Sheet Model and Landice), which performs no dynamics -- it simply
records the forcing fields it receives each coupling step and reports an
unchanged surface (reference: the DISMAL ``IceCoupler`` variant [U];
SURVEY.md section 2 coupling runtime).  It exists to exercise the coupling
plumbing and to produce diagnostic files without an ice model in the loop.

Here DISMAL is a drop-in for the SIA model in ``IceSheetCoupler``: same
``step()`` signature, static thickness, optional per-step npz dumps of the
received forcings.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import Optional

import numpy as np

from icebin_tpu.models.ice_sheet import IceSheetConfig, IceSheetState

__all__ = ["DismalModel"]


@dataclasses.dataclass
class DismalModel:
    """State-preserving stand-in with forcing capture.

    Use: ``sc = IceSheetCoupler(...); sc.ice_step = DismalModel(dir).step``
    or call ``step(cfg, state, smb, tsurf, dt, enth_flux)`` anywhere the
    coupled ice-step protocol fits (returns all-zero shed fluxes).
    """

    out_dir: Optional[str] = None
    _count: int = 0

    def step(self, cfg: IceSheetConfig, state: IceSheetState, smb_flux,
             tsurf, dt: float, enth_flux=None):
        if self.out_dir is not None:
            d = pathlib.Path(self.out_dir)
            d.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                d / f"dismal_{self._count:06d}.npz",
                smb_flux=np.asarray(smb_flux).reshape(cfg.ny, cfg.nx),
                tsurf=np.asarray(tsurf).reshape(cfg.ny, cfg.nx)
                if tsurf is not None else np.zeros((cfg.ny, cfg.nx)),
                enth_flux=np.asarray(enth_flux).reshape(cfg.ny, cfg.nx)
                if enth_flux is not None else np.zeros((cfg.ny, cfg.nx)),
                t=float(state.t), dt=float(dt))
        self._count += 1
        import jax.numpy as jnp
        from icebin_tpu.models.ice_sheet import IceFluxes
        z = jnp.zeros_like(state.H)
        return (IceSheetState(H=state.H, bed=state.bed, t=state.t + dt,
                              enth=state.enth),
                IceFluxes(z, z, z, z, z, z, z, z, z))
