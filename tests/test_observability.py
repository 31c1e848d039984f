"""Writer dumps, roofline accounting, plotting (smoke on Agg backend)."""
import os

import numpy as np
import pytest

from icebin_tpu.coupler.writer import CouplerWriter
from icebin_tpu.utils.profiling import Roofline, bdt_apply_bytes


def test_writer_round_trip(tmp_path):
    w = CouplerWriter(str(tmp_path / "dumps"), every=2)
    p0 = w.dump(0.0, {"s.fI": np.array([1.0, np.nan, 3.0]),
                      "s.fE": np.ones((2, 4))},
                ledger_row={"s.mass_in_E": 42.0})
    p1 = w.dump(1.0, {"s.fI": np.zeros(3)})
    p2 = w.dump(2.0, {"s.fI": np.zeros(3)})
    assert p0 and p2 and p1 is None          # cadence
    d = CouplerWriter.read(p0)
    np.testing.assert_array_equal(np.isnan(d["s_fI"]), [False, True, False])
    assert d["ledger_s_mass_in_E"][0] == 42.0
    assert d["_attrs"]["step"] == 0.0
    assert d["s_fE"].shape == (2, 4)


def test_roofline_accounting():
    import jax.numpy as jnp
    from icebin_tpu.ops.bdt import bdt_from_weighted
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import toy_elevmask, toy_regridder
    from icebin_tpu.regrid.matrices import RegridParams

    gr = toy_regridder(nI=(40, 40), nA=(4, 4))
    rm = gr.regrid_matrices("toy", toy_elevmask(gr.sheets["toy"].specI))
    bm = bdt_from_weighted(rm.matrix("EvI", RegridParams()))
    nbytes = bdt_apply_bytes(bm, 8)
    assert nbytes > bm.tiles.size * 4
    roof = Roofline(hbm_gbps=100.0)
    with roof.measure("EvI", bytes=nbytes):
        pass
    rep = roof.report()
    assert "EvI" in rep and "% of roof" in rep


def test_plotting_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from icebin_tpu.utils.plot import plot_exchange, plot_fhc, plot_field
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import toy_grids
    from icebin_tpu.grid.exchange import make_exchange_grid

    specA, specI = toy_grids((20, 20), (4, 4))
    ax = plot_field(specA, np.arange(specA.ncells), title="A field")
    ax.figure.savefig(str(tmp_path / "a.png"))
    ax = plot_field(specI, np.arange(specI.ncells))
    ax.figure.savefig(str(tmp_path / "i.png"))
    xg = make_exchange_grid(specA, specI, subdiv=1)
    ax = plot_exchange(xg)
    ax.figure.savefig(str(tmp_path / "x.png"))
    fhc = np.random.default_rng(0).uniform(0, 1, (2, specA.ncells))
    axes = plot_fhc(specA, fhc, [0.0, 1000.0])
    axes[0].figure.savefig(str(tmp_path / "fhc.png"))
    assert (tmp_path / "x.png").stat().st_size > 0


def test_coupler_writer_integration(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_coupler import forcing, make_coupler
    from icebin_tpu.coupler.writer import CouplerWriter

    cp = make_coupler()
    cp.writer = CouplerWriter(str(tmp_path / "dumps"))
    cp.run_transient(lambda t, s: forcing(t, s, coupler=cp), 2)
    files = sorted((tmp_path / "dumps").iterdir())
    assert len(files) == 2
    d = CouplerWriter.read(str(files[0]))
    assert "toy_fI" in d and "ledger_toy_mass_in_E" in d
    # dumped transport conserves (diffable-observability contract)
    assert d["ledger_toy_mass_in_E"][0] != 0.0
