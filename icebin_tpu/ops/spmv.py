"""Device-resident sparse regrid-matrix apply (the runtime hot loop).

Reference: matrix application is ``linear::Weighted_Eigen::apply_M`` -- a
serial Eigen SpMV on the coupler root rank (reference: ``ibmisc
linear/eigen.*`` [U]; SURVEY.md section 3.2 "SpMV <- runtime HOT LOOP").
TPU-native re-design:

* The matrix lives on device as **row-sorted COO** (int32 indices, f32 or
  f64 values).  Apply = gather source values, multiply, `segment_sum` over
  sorted row ids -- XLA lowers this to a vectorized one-pass reduction with
  deterministic (sorted-order) accumulation, and fuses the multiply, the
  per-variable unit conversion, and the destination scaling into one kernel.
* Multi-field apply (the coupler's VectorMultivec transport) is the same op
  over a (nvar, ncol) block -- bandwidth-optimal: indices are read once per
  nvar fields.
* A Pallas dense-tile block-sparse kernel (``icebin_tpu.ops.pallas_spmv``)
  covers the speed-of-light path for the HBM-roof benchmark; this module is
  the portable XLA fallback and the correctness reference for it.

Precision: on TPU the apply runs f32; per-step *conservation* is restored
exactly by the coupler's f64 mass-repair ledger
(``icebin_tpu.coupler.ledger``), mirroring how the exchange-grid build
replaces CGAL exactness with f64 repair (SURVEY.md section 7 hard part (a)).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icebin_tpu.regrid.sparse import WeightedMatrix

__all__ = ["DeviceCOO", "DeviceELL", "apply_matrix", "apply_ell"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceCOO:
    """Row-sorted COO on device, with dest/src weight vectors."""

    rows: jnp.ndarray   # (nnz,) int32, sorted ascending
    cols: jnp.ndarray   # (nnz,) int32
    vals: jnp.ndarray   # (nnz,)
    wM: jnp.ndarray     # (nrow,)
    Mw: jnp.ndarray     # (ncol,)
    nrow: int
    ncol: int

    def tree_flatten(self):
        return ((self.rows, self.cols, self.vals, self.wM, self.Mw),
                (self.nrow, self.ncol))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    @classmethod
    def from_weighted(cls, M: WeightedMatrix, dtype=jnp.float32) -> "DeviceCOO":
        # WeightedMatrix is already dedup'd and row-major sorted.
        return cls(rows=jnp.asarray(M.rows, jnp.int32),
                   cols=jnp.asarray(M.cols, jnp.int32),
                   vals=jnp.asarray(M.vals, dtype),
                   wM=jnp.asarray(M.wM, dtype),
                   Mw=jnp.asarray(M.Mw, dtype),
                   nrow=int(M.shape[0]), ncol=int(M.shape[1]))


@functools.partial(jax.jit, static_argnames=("scale",))
def apply_matrix(dm: DeviceCOO, f, scale: bool = True,
                 var_factor: Optional[jnp.ndarray] = None,
                 var_offset: Optional[jnp.ndarray] = None,
                 fill=jnp.nan):
    """out[..., r] = (sum_c M[r,c] f[..., c]) / wM[r], fused with an optional
    per-variable affine unit conversion (factor * x + offset applied to the
    *destination mean*, i.e. after scaling -- the coupler's contract
    conversion, reference ``CVConverter`` use in ``IceCoupler::couple`` [U]).

    f: (ncol,) or (nvar, ncol).  Returns matching leading shape with nrow.
    Zero-weight destination cells get ``fill`` when scaling.
    """
    single = f.ndim == 1
    fv = f[None, :] if single else f
    fv = fv.astype(dm.vals.dtype)

    gathered = jnp.take(fv, dm.cols, axis=1)            # (nvar, nnz)
    contrib = gathered * dm.vals[None, :]
    out = jax.vmap(lambda c: jax.ops.segment_sum(
        c, dm.rows, num_segments=dm.nrow, indices_are_sorted=True))(contrib)

    if scale:
        w = dm.wM
        safe = jnp.where(w != 0, w, 1.0)
        out = jnp.where(w[None, :] != 0, out / safe, fill)
    if var_factor is not None:
        out = out * var_factor[:, None]
    if var_offset is not None:
        out = out + var_offset[:, None]
    return out[0] if single else out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceELL:
    """Padded-row (ELL) device format: TPU-friendly fixed-width rows.

    ``cols``/``vals`` are (nrow, K); padding entries have val 0 and col 0.
    The apply is gather + reshape + sum -- fully dense ops XLA vectorizes
    cleanly; best for destination spaces with small, bounded nnz/row (the
    I-destination coupling direction: each ice cell overlaps <= ~8 (A, EC)
    parents).  Row widths above K fall back to extra 'overflow' COO entries.
    """

    cols: jnp.ndarray   # (nrow, K) int32
    vals: jnp.ndarray   # (nrow, K)
    wM: jnp.ndarray
    Mw: jnp.ndarray
    nrow: int
    ncol: int
    ov: Optional[DeviceCOO]  # overflow entries, or None

    def tree_flatten(self):
        return ((self.cols, self.vals, self.wM, self.Mw, self.ov),
                (self.nrow, self.ncol))

    @classmethod
    def tree_unflatten(cls, aux, children):
        c, v, wM, Mw, ov = children
        return cls(c, v, wM, Mw, aux[0], aux[1], ov)

    @classmethod
    def from_weighted(cls, M: WeightedMatrix, K: int = 8,
                      dtype=jnp.float32) -> "DeviceELL":
        nrow, ncol = M.shape
        counts = np.bincount(M.rows, minlength=nrow)
        pos_in_row = np.arange(M.nnz) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        main = pos_in_row < K
        cols = np.zeros((nrow, K), dtype=np.int32)
        vals = np.zeros((nrow, K), dtype=np.float64)
        cols[M.rows[main], pos_in_row[main]] = M.cols[main]
        vals[M.rows[main], pos_in_row[main]] = M.vals[main]
        ov = None
        if (~main).any():
            ov = DeviceCOO(
                rows=jnp.asarray(M.rows[~main], jnp.int32),
                cols=jnp.asarray(M.cols[~main], jnp.int32),
                vals=jnp.asarray(M.vals[~main], dtype),
                wM=jnp.zeros(nrow, dtype), Mw=jnp.zeros(ncol, dtype),
                nrow=nrow, ncol=ncol)
        return cls(cols=jnp.asarray(cols), vals=jnp.asarray(vals, dtype),
                   wM=jnp.asarray(M.wM, dtype), Mw=jnp.asarray(M.Mw, dtype),
                   nrow=nrow, ncol=ncol, ov=ov)


@functools.partial(jax.jit, static_argnames=("scale",))
def apply_ell(dm: DeviceELL, f, scale: bool = True,
              var_factor: Optional[jnp.ndarray] = None,
              var_offset: Optional[jnp.ndarray] = None,
              fill=jnp.nan):
    """ELL apply; same semantics as ``apply_matrix``."""
    single = f.ndim == 1
    fv = (f[None, :] if single else f).astype(dm.vals.dtype)
    g = jnp.take(fv, dm.cols.reshape(-1), axis=1)       # (nvar, nrow*K)
    g = g.reshape(fv.shape[0], dm.nrow, dm.cols.shape[1])
    out = jnp.einsum("vrk,rk->vr", g, dm.vals)
    if dm.ov is not None:
        ov = dm.ov
        gathered = jnp.take(fv, ov.cols, axis=1) * ov.vals[None, :]
        out = out + jax.vmap(lambda c: jax.ops.segment_sum(
            c, ov.rows, num_segments=dm.nrow, indices_are_sorted=True))(gathered)
    if scale:
        w = dm.wM
        safe = jnp.where(w != 0, w, 1.0)
        out = jnp.where(w[None, :] != 0, out / safe, fill)
    if var_factor is not None:
        out = out * var_factor[:, None]
    if var_offset is not None:
        out = out + var_offset[:, None]
    return out[0] if single else out
