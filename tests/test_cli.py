"""CLI tools end-to-end on small grids (reference L7 parity: overlap,
make_topoo, global_ec, grid scripts), plus config + checkpoint round-trips."""
import subprocess
import sys

import numpy as np
import pytest

from icebin_tpu.cli.global_ec import main as global_ec_main
from icebin_tpu.cli.make_topoo import main as make_topoo_main, read_topo
from icebin_tpu.cli.overlap import main as overlap_main
from icebin_tpu.io.ncio import (read_exchange, read_grid, write_grid,
                                write_gcmregridder)
from icebin_tpu.utils.config import RunConfig, SheetConfig

from helpers import toy_elevmask, toy_grids


@pytest.fixture()
def grid_files(tmp_path):
    specA, specI = toy_grids((30, 30), (5, 5))
    pa = str(tmp_path / "gridA.nc")
    pi = str(tmp_path / "gridI.nc")
    write_grid(pa, specA)
    write_grid(pi, specI)
    return pa, pi, specA, specI


def test_overlap_cli(grid_files, tmp_path, capsys):
    pa, pi, specA, specI = grid_files
    out = str(tmp_path / "exgrid.nc")
    assert overlap_main([pa, pi, out, "--subdiv", "1"]) == 0
    xg = read_exchange(out)
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-12)
    assert "exchange cells" in capsys.readouterr().out


def test_make_topoo_cli_synthetic(tmp_path, capsys):
    out = str(tmp_path / "topoo.nc")
    assert make_topoo_main(["--synthetic", "72x46", "--om", "36x24",
                            "--out", out]) == 0
    topo = read_topo(out)
    s = topo.focean + topo.flake + topo.fgrnd + topo.fgice
    np.testing.assert_allclose(s, 1.0, atol=1e-9)


def test_global_ec_cli(grid_files, tmp_path, capsys):
    pa, pi, specA, specI = grid_files
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    gr = GCMRegridder(specA, hcdefs=[0.0, 1000.0, 3000.0])
    gr.add_sheet("toy", specI, subdiv=1)
    pgr = str(tmp_path / "gr.nc")
    write_gcmregridder(pgr, gr)
    pel = str(tmp_path / "elev.npy")
    np.save(pel, toy_elevmask(specI))
    out = str(tmp_path / "ec.nc")
    assert global_ec_main([pgr, out, "--elevmask", f"toy={pel}",
                           "--matrices", "AvI,EvI"]) == 0
    # round-trip one compressed matrix and check against direct build
    from scipy.io import netcdf_file
    from icebin_tpu.io.zarray import decode_zarray
    from icebin_tpu.regrid.matrices import RegridParams
    with netcdf_file(out, "r", mmap=False) as nc:
        blob = np.array(nc.variables["toy.EvI.zarray"][:]).tobytes()
        shape = (int(nc.__dict__["toy.EvI_nrow"]),
                 int(nc.__dict__["toy.EvI_ncol"]))
    r, c, v = decode_zarray(blob)
    M = gr.regrid_matrices("toy", np.load(pel)).matrix(
        "EvI", RegridParams(scale=True, correctA=True))
    assert shape == M.shape
    np.testing.assert_array_equal(np.sort(v), np.sort(M.vals))


def test_grid_scripts_run(tmp_path):
    import os
    import subprocess
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    for script, args, name in [
        ("grids/modele_ll_g4x5.py", [], "modele_ll"),
        ("grids/searise.py", ["20"], "sr_g20"),
        ("grids/antarctica.py", ["40"], "ant_g40"),
    ]:
        out = str(tmp_path / f"{name}.nc")
        r = subprocess.run([sys.executable, script] + args + [out],
                           capture_output=True, text=True, cwd="/root/repo",
                           env=env)
        assert r.returncode == 0, r.stderr
        g = read_grid(out)
        assert g.spec.ncells > 0


def test_run_config_round_trip(tmp_path):
    cfg = RunConfig(gridA_file="a.nc", hcdefs=[0.0, 500.0],
                    sheets=[SheetConfig(name="greenland", grid_file="g.nc")],
                    sigma=(5e3, 5e3), mesh_shape=[8])
    p = str(tmp_path / "run.json")
    cfg.to_json(p)
    cfg2 = RunConfig.from_json(p)
    assert cfg2 == cfg
    assert cfg2.regrid_params().sigma == (5e3, 5e3)


def test_checkpoint_round_trip(tmp_path):
    sys.path.insert(0, "tests")
    from test_coupler import forcing, make_coupler
    import jax.numpy as jnp
    from icebin_tpu.coupler.checkpoint import load_checkpoint, save_checkpoint

    cp = make_coupler()
    cp.run_transient(lambda t, s: forcing(t, s, coupler=cp), 3)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, cp)
    H_saved = np.asarray(cp.sheets["toy"].state.H).copy()
    t_saved = cp.time
    # fresh coupler, restore, continue
    cp2 = make_coupler()
    load_checkpoint(p, cp2)
    assert cp2.time == t_saved
    np.testing.assert_array_equal(np.asarray(cp2.sheets["toy"].state.H),
                                  H_saved)
    assert len(cp2.ledger.to_rows()) == 3
    # continuing both couplers produces identical trajectories
    cp.run_transient(lambda t, s: forcing(t, s, coupler=cp), 2)
    cp2.run_transient(lambda t, s: forcing(t, s, coupler=cp2), 2)
    np.testing.assert_array_equal(np.asarray(cp.sheets["toy"].state.H),
                                  np.asarray(cp2.sheets["toy"].state.H))


def test_run_cli_end_to_end(tmp_path, capsys, monkeypatch):
    """The standalone run driver: config -> transient -> ledger report."""
    from icebin_tpu.cli.run import main as run_main
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY

    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 7))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 33),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 33),
                       projection=PlateCarree(scale=scale))
    pa, pi = str(tmp_path / "a.nc"), str(tmp_path / "i.nc")
    write_grid(pa, specA)
    write_grid(pi, specI)
    cfgp = str(tmp_path / "run.json")
    RunConfig(gridA_file=pa, hcdefs=[0.0, 800.0, 2500.0],
              sheets=[SheetConfig(name="s", grid_file=pi, subdiv=1)],
              n_steps=3, dump_dir=str(tmp_path / "dumps"),
              checkpoint_every=2).to_json(cfgp)
    monkeypatch.chdir(tmp_path)
    assert run_main([cfgp]) == 0
    out = capsys.readouterr().out
    assert "worst per-step transport conservation" in out
    worst = float(out.strip().rsplit(" ", 1)[-1])
    assert worst < 1e-10
    assert len(list((tmp_path / "dumps").iterdir())) == 3
    assert (tmp_path / "checkpoint_000002.npz").exists()
    # dismal variant
    assert run_main([cfgp, "--ice", "dismal"]) == 0


def test_run_cli_fused_and_mesh(tmp_path, capsys, monkeypatch):
    """--fused scans regen windows in one dispatch; --mesh N runs the
    mesh-decomposed production coupler.  Conservation report unchanged."""
    from icebin_tpu.cli.run import main as run_main
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY

    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 7))
    specI = GridSpecXY(xb=np.linspace(0.0, 32.0 * scale, 33),
                       yb=np.linspace(40.0 * scale, 72.0 * scale, 33),
                       projection=PlateCarree(scale=scale))
    pa, pi = str(tmp_path / "a.nc"), str(tmp_path / "i.nc")
    write_grid(pa, specA)
    write_grid(pi, specI)
    cfgp = str(tmp_path / "run.json")
    RunConfig(gridA_file=pa, hcdefs=[0.0, 800.0, 2500.0],
              sheets=[SheetConfig(name="s", grid_file=pi, subdiv=1)],
              n_steps=4, checkpoint_every=2).to_json(cfgp)
    monkeypatch.chdir(tmp_path)
    assert run_main([cfgp, "--fused"]) == 0
    out = capsys.readouterr().out
    worst = float(out.strip().rsplit(" ", 1)[-1])
    assert worst < 1e-10
    assert (tmp_path / "checkpoint_000002.npz").exists()
    assert (tmp_path / "checkpoint_000004.npz").exists()
    # mesh-decomposed production coupler (+fused window over the mesh)
    assert run_main([cfgp, "--mesh", "8", "--fused"]) == 0
    out = capsys.readouterr().out
    worst = float(out.strip().rsplit(" ", 1)[-1])
    assert worst < 1e-10
