"""Halo exchange over the ice-domain mesh axis (ppermute rings).

Reference: PISM/PETSc DA ghost updates over MPI [U]; the TPU equivalent is a
`jax.lax.ppermute` ring over ICI -- the identical communication skeleton as
ring attention, reused for stencil ghosts (SURVEY.md sections 2.11, 5.7).
Used inside ``shard_map`` regions where arrays carry a leading sharded y
block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange_rows", "halo_exchange_cols"]


def halo_exchange_rows(x, width: int, axis_name: str):
    """Return x padded with ``width`` ghost rows on both y-ends, filled from
    ring neighbors (edge shards get edge-replicated ghosts, i.e. the global
    boundary condition is zero-gradient).

    x: (ny_local, nx) block of a y-sharded lattice.  All collectives are
    ppermute shifts, so on TPU hardware this rides the ICI ring.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:width]          # rows to send upward (to rank-1's bottom ghost)
    bot = x[-width:]
    # neighbor shifts (ring; wrap values discarded below)
    from_prev = jax.lax.ppermute(bot, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    # global edges: replicate own edge rows (zero-gradient BC)
    first = idx == 0
    last = idx == n - 1
    ghost_lo = jnp.where(first, jnp.broadcast_to(x[:1], from_prev.shape),
                         from_prev)
    ghost_hi = jnp.where(last, jnp.broadcast_to(x[-1:], from_next.shape),
                         from_next)
    return jnp.concatenate([ghost_lo, x, ghost_hi], axis=0)


def halo_exchange_cols(x, width: int, axis_name: str):
    """x-axis twin of ``halo_exchange_rows`` for 2-D domain decomposition:
    pads ``width`` ghost COLUMNS from ring neighbors along ``axis_name``
    (edge-replicated at the global x boundaries)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    left = x[:, :width]
    right = x[:, -width:]
    from_prev = jax.lax.ppermute(right, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(left, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    first = idx == 0
    last = idx == n - 1
    ghost_lo = jnp.where(first, jnp.broadcast_to(x[:, :1], from_prev.shape),
                         from_prev)
    ghost_hi = jnp.where(last, jnp.broadcast_to(x[:, -1:], from_next.shape),
                         from_next)
    return jnp.concatenate([ghost_lo, x, ghost_hi], axis=1)
