"""icebin-tpu: TPU-native conservative regridding and ice<->GCM coupling.

Full capability set of citibeth/icebin, architecture built from scratch for
JAX/XLA/Pallas.  See docs/design.md for the architecture and the
reference-component map.

Public API convenience re-exports (the reference's ``icebin`` Python module
surface: ``GCMRegridder``, ``RegridMatrices`` via ``regrid_matrices``,
``Hntr`` [U pylib/_icebin.pyx]):
"""

__version__ = "0.1.0"

from icebin_tpu.grid.exchange import ExchangeGrid, make_exchange_grid
from icebin_tpu.grid.proj import PlateCarree, Stereographic, from_proj4
from icebin_tpu.grid.spec import (Grid, GridSpecLonLat, GridSpecXY,
                                  modele_lonlat_grid)
from icebin_tpu.regrid.gcmregridder import GCMRegridder
from icebin_tpu.regrid.hntr import Hntr, hntr_spec
from icebin_tpu.regrid.matrices import RegridMatrices, RegridParams
from icebin_tpu.regrid.sparse import WeightedMatrix

__all__ = [
    "ExchangeGrid", "GCMRegridder", "Grid", "GridSpecLonLat", "GridSpecXY",
    "Hntr", "PlateCarree", "RegridMatrices", "RegridParams", "Stereographic",
    "WeightedMatrix", "from_proj4", "hntr_spec", "make_exchange_grid",
    "modele_lonlat_grid",
]
