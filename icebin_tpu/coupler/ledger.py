"""Per-step conservation ledger and on-device mass repair.

Reference: conservation in IceBin comes from CGAL exactness plus per-step
NetCDF dumps that let one *diff* mass offline (reference: ``GCMCoupler``
``gcm-out``/``gcm-in`` writers [U]; SURVEY.md section 5.5).  The TPU build
makes conservation an *active* runtime feature (north star: "conservation
tracked per step"):

* All mass accounting runs in f64 ON DEVICE (XLA emulates f64 on TPU; it is
  only reductions, a few MB per step, so the cost is negligible) -- f32
  apply noise never enters the books.
* ``repair_mass`` redistributes the f64-measured apply error additively,
  weighted by destination weight, making every regrid step conserve to f64
  round-off even though the SpMV itself runs f32.  This is the runtime
  analog of the exchange-grid conservation-repair pass (SURVEY.md section 7
  hard part (a)).
* The ``Ledger`` accumulates named f64 totals per step; ``check`` returns
  the relative closure error -- the quantity the north star bounds at 1e-10.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp

__all__ = ["weighted_mass", "repair_mass", "Ledger"]


def weighted_mass(f, w):
    """f64 sum of f*w with NaN treated as 0 (masked cells). f: (..., n)."""
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    fv = jnp.where(jnp.isfinite(f), f, 0.0).astype(f64)
    return jnp.sum(fv * w.astype(f64), axis=-1)


def repair_mass(out, wM, m_src):
    """Additively correct ``out`` ((nvar, nrow) dest means) so that
    sum(out * wM) == m_src ((nvar,) f64) exactly in f64.

    The correction is uniform per unit weight (each dest cell absorbs error
    proportional to its area), preserving field shape while pinning the
    integral.  Cells with zero weight are untouched.

    Returns the repaired field in f64 (when x64 is enabled): the caller's
    LEDGER must be fed from this array -- a downcast to f32 for the hot path
    re-rounds at ~1e-7 relative, and that quantization belongs in the
    booked residual, not in the conservation measure (north star < 1e-10 is
    a property of the f64 account, with the f32 field noise explicitly
    carried).
    """
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    out64 = out.astype(f64)
    m_dst = weighted_mass(out64, wM)
    wtot = jnp.sum(wM.astype(f64))
    corr = (m_src.astype(f64) - m_dst) / jnp.where(wtot > 0, wtot, 1.0)
    fixed = out64 + corr[:, None]
    return jnp.where((wM > 0)[None, :] & jnp.isfinite(out64), fixed, out64)


@dataclasses.dataclass
class Ledger:
    """Host-side f64 account book, one row per coupling step.

    ``post`` forces a device->host sync per value; a stepwise coupling
    loop through a dispatch relay pays ~25 ms per sync, so the coupler's
    low-latency mode books rows with ``post_deferred`` (the device array
    is kept; JAX's async dispatch lets the host run ahead) and the books
    materialize in batches on ``flush`` -- which every reader calls, so
    the account is always complete when observed."""

    steps: List[Dict[str, float]] = dataclasses.field(default_factory=list)
    _pending: List[tuple] = dataclasses.field(default_factory=list)

    def open_step(self, t: float) -> Dict[str, float]:
        row = {"t": float(t)}
        self.steps.append(row)
        return row

    def post(self, key: str, value) -> None:
        self.steps[-1][key] = float(value)

    def post_deferred(self, keys, values) -> None:
        """Book ``keys[i] = values[i]`` into the CURRENT row without
        fetching: ``values`` stays a device array until ``flush``."""
        self._pending.append((self.steps[-1], tuple(keys), values))

    def flush(self) -> None:
        import numpy as np
        pending, self._pending = self._pending, []
        if not pending:
            return
        # ONE device concatenate + ONE host fetch for the whole backlog
        # (per-row fetches cost a full relay round trip each)
        flat = np.asarray(jnp.concatenate(
            [jnp.ravel(jnp.asarray(v)) for _, _, v in pending]))
        off = 0
        for row, keys, _ in pending:
            for i, k in enumerate(keys):
                row[k] = float(flat[off + i])
            off += len(keys)

    def closure_error(self, inflow_keys, outflow_keys, store_key,
                      step: int = -1) -> float:
        """Relative closure of: store_new - store_old == in - out."""
        self.flush()
        row = self.steps[step]
        prev = self.steps[step - 1] if len(self.steps) > 1 and step != 0 else None
        store_old = prev[store_key] if prev and store_key in prev else 0.0
        inflow = sum(row.get(k, 0.0) for k in inflow_keys)
        outflow = sum(row.get(k, 0.0) for k in outflow_keys)
        lhs = row[store_key] - store_old
        rhs = inflow - outflow
        scale = max(abs(row[store_key]), abs(inflow), abs(outflow), 1e-300)
        return abs(lhs - rhs) / scale

    def to_rows(self):
        self.flush()
        return list(self.steps)
