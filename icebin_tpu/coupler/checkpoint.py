"""Coupling-loop checkpoint/resume.

Reference: coupled runs restart from ModelE restart files + PISM state
files; IceBin itself re-inits from its NetCDF artifacts (SURVEY.md section
5.3-5.4).  TPU build: the coupler's full resumable state -- step index,
model time, per-sheet ice state, and the f64 ledger -- saves to one .npz;
matrices are NOT stored (they rebuild deterministically from the restored
elevmask, which is the same determinism contract the reference relies on).
"""
from __future__ import annotations

import json

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, coupler) -> None:
    import jax.numpy as jnp  # noqa: F401  (device -> host pull below)
    arrs = {"time": np.asarray(coupler.time),
            "ledger": np.frombuffer(
                json.dumps(coupler.ledger.to_rows()).encode(), dtype=np.uint8)}
    for name, sc in coupler.sheets.items():
        st = sc.state
        arrs[f"{name}.H"] = np.asarray(st.H)
        arrs[f"{name}.bed"] = np.asarray(st.bed)
        arrs[f"{name}.t"] = np.asarray(st.t)
        arrs[f"{name}.enth"] = np.asarray(st.enth)
        arrs[f"{name}.steps_since_regen"] = np.asarray(sc.steps_since_regen)
        arrs[f"{name}.regen_elevmask"] = np.asarray(sc.regen_elevmask)
    np.savez_compressed(path, **arrs)


def load_checkpoint(path: str, coupler) -> None:
    """Restore state into an ALREADY-CONSTRUCTED coupler (same config);
    matrices regenerate from the restored ice surface."""
    import jax.numpy as jnp
    from icebin_tpu.coupler.ledger import Ledger
    from icebin_tpu.models.ice_sheet import IceSheetState

    z = np.load(path)
    coupler.time = float(z["time"])
    rows = json.loads(bytes(z["ledger"].tobytes()).decode())
    coupler.ledger = Ledger(steps=rows)
    from icebin_tpu.models.ice_sheet import default_enthalpy
    for name, sc in coupler.sheets.items():
        H = jnp.asarray(z[f"{name}.H"])
        sc.state = IceSheetState(
            H=H,
            bed=jnp.asarray(z[f"{name}.bed"]),
            t=jnp.asarray(z[f"{name}.t"]),
            # pre-r4 checkpoints carry no energy column: default cold
            # state at the SHEET's configured t_init (not the dataclass
            # default -- advisor r4)
            enth=jnp.asarray(z[f"{name}.enth"])
            if f"{name}.enth" in z
            else default_enthalpy(H, sc.ice_cfg.t_init))
        sc.place_state()          # mesh couplers re-shard over the ice axis
        sc.regen_matrices(elevmask=z[f"{name}.regen_elevmask"])
        sc.steps_since_regen = int(z[f"{name}.steps_since_regen"])
