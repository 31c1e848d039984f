"""Device-mesh construction for ice-domain decomposition.

Reference concurrency model: ModelE MPI ranks own (i,j) atmosphere
subdomains; the IceBin coupler gathers everything to root (reference:
``VectorMultivec`` MPI gather in ``GCMCoupler`` [U]; SURVEY.md section 2.11).
TPU-native replacement: ONE mesh axis ("ice") decomposing the ice grid's y
dimension across devices -- the long axis of the problem (SURVEY.md section
5.7: the ice grid is the 'sequence dimension' analog).  The small A/E spaces
are replicated; distributed regridding reduces partial A/E sums with psum
instead of gathering state to a root.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ICE_AXIS", "P", "NamedSharding"]

ICE_AXIS = "ice"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ICE_AXIS,))
