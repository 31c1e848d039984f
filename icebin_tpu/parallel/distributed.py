"""Multi-host (multi-process) scale-out over DCN.

The reference's cross-host story is MPI: every ModelE rank sends its sparse
E-grid fields to a root rank, which runs the matrix algebra serially and
scatters the results back (``VectorMultivec`` gather in ``GCMCoupler`` [U];
SURVEY.md §2.11, §5.8).  The TPU-native replacement has no root at all:

* **process group**: ``jax.distributed.initialize`` (the JAX coordination
  service over DCN) replaces ``MPI_Init``; every host then sees the GLOBAL
  device list and participates in one multi-controller program.
* **field transport**: per-host field slabs become ONE global sharded array
  (``jax.make_array_from_process_local_data``) on the ice mesh axis —
  the analog of each MPI rank contributing its subdomain, except no rank
  ever holds global state.
* **matrix algebra**: the sharded Pallas/XLA applies (``parallel.
  pallas_spmv``, ``parallel.coupled``) run unchanged: `psum`/`ppermute`
  collectives ride ICI within a slice and DCN across hosts, inserted by
  XLA from the same `shard_map` program that runs single-host.

Nothing in the kernel layer is multi-host-specific — this module is only
the bootstrap (process-group init, global mesh construction) and the
host-data → global-array plumbing.  Tested without TPU pods by running
N OS processes, each with K virtual CPU devices (``tests/test_multihost.py``
runs 2×4; the same code boots a v5p pod slice by passing the real
coordinator address).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["init_multihost", "global_ice_mesh", "global_field",
           "replicated_field", "local_ice_range"]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join the multi-host process group (call once, before device use).

    On TPU pods all three arguments are discovered from the environment
    (``jax.distributed.initialize()`` with no args); on CPU/GPU test rigs
    pass them explicitly.  Replaces the reference's ``MPI_Init`` +
    communicator plumbing [U GCMCoupler.cpp]; the coordination service
    carries only control-plane traffic — field data rides XLA collectives.
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_ice_mesh(n_devices: Optional[int] = None):
    """1-D ice-axis mesh over the GLOBAL device list (all hosts).

    Device order is JAX's global enumeration: each host's devices are
    contiguous, so contiguous ice-block ranges land host-local first and
    the EvI psum tree does intra-host reduction over ICI before touching
    DCN (the layout rule of SURVEY.md §2.11: collectives ride ICI first).
    """
    import jax
    from jax.sharding import Mesh

    from icebin_tpu.parallel.mesh import ICE_AXIS
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ICE_AXIS,))


def local_ice_range(mesh, nice: int) -> tuple:
    """[start, stop) of the global ice axis owned by THIS process.

    Contiguous equal-width per-device column ranges (the
    ``sharded_pallas_from_weighted`` partition), restricted to this
    process's addressable devices.
    """
    import jax

    from icebin_tpu.ops.bdt import TILE_C
    devs = list(mesh.devices.reshape(-1))
    n = len(devs)
    bpd = -(-(-(-nice // TILE_C)) // n)         # blocks per device (padded)
    per = bpd * TILE_C
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        return (0, 0)
    return (min(min(mine) * per, nice), min((max(mine) + 1) * per, nice))


def global_field(mesh, local_block: np.ndarray, axis: int = 0):
    """Assemble a global array sharded on the ice axis from per-host blocks.

    ``local_block`` is this host's contiguous slab along ``axis`` (every
    host passes its own slab; slabs concatenate in process order to the
    global array).  The MPI-gather replacement: data never leaves the
    owning host.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icebin_tpu.parallel.mesh import ICE_AXIS
    spec = [None] * local_block.ndim
    spec[axis] = ICE_AXIS
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*spec)), local_block)


def replicated_field(mesh, host_value: np.ndarray):
    """Replicate identical host data (small A/E fields, weights) mesh-wide.

    Every process must pass the same value (they compute it independently
    from the shared matrix artifacts — determinism replaces broadcast).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P())
    return jax.make_array_from_callback(
        np.shape(host_value), sh, lambda idx: np.asarray(host_value)[idx])
