"""ModelE adapter: layout permutations, multivec wire format, the Python
gcmce API, and the C ABI driven through ctypes (the Fortran call path)."""
import ctypes
import os
import pathlib
import sys

import numpy as np
import pytest

from icebin_tpu.coupler.multivec import VectorMultivec, concatenate
from icebin_tpu.models.modele_adapter import (ModelEAdapter, from_modele_E,
                                              flatE_to_fortran_ijh,
                                              fortran_ijh_to_flatE,
                                              to_modele_E)

from helpers import toy_elevmask


def test_E_layout_permutations():
    nA, nhc = 6, 3
    f = np.arange(nA * nhc, dtype=float)      # a-major
    g = to_modele_E(f, nA, nhc)
    # element (a, k) at a*nhc+k must land at k*nA+a
    for a in range(nA):
        for k in range(nhc):
            assert g[k * nA + a] == f[a * nhc + k]
    np.testing.assert_array_equal(from_modele_E(g, nA, nhc), f)
    # batched leading dims
    fb = np.arange(2 * nA * nhc, dtype=float).reshape(2, nA * nhc)
    np.testing.assert_array_equal(
        from_modele_E(to_modele_E(fb, nA, nhc), nA, nhc), fb)


def test_fortran_marshalling():
    im, jm, nhc = 4, 3, 2
    nA = im * jm
    # Fortran A(im,jm,nhc) filled with i + 10j + 100k -> C view (nhc,jm,im)
    c_view = np.empty((nhc, jm, im))
    for k in range(nhc):
        for j in range(jm):
            for i in range(im):
                c_view[k, j, i] = i + 10 * j + 100 * k
    flat = fortran_ijh_to_flatE(c_view, nA, nhc)
    # canonical a-major: index a*nhc+k with a = j*im+i
    for j in range(jm):
        for i in range(im):
            for k in range(nhc):
                assert flat[(j * im + i) * nhc + k] == i + 10 * j + 100 * k
    back = flatE_to_fortran_ijh(flat, im, jm, nhc)
    np.testing.assert_array_equal(back, c_view)


def test_multivec_dense_round_trip():
    mv = VectorMultivec(index=[3, 1, 3], vals=[[1.0, 2.0, 4.0]])
    d = mv.to_dense(5)
    np.testing.assert_array_equal(d[0], [0, 2, 0, 5, 0])  # duplicates sum
    mv2 = VectorMultivec.from_dense(d)
    assert set(mv2.index.tolist()) == {1, 3}
    cat = concatenate([mv, mv2])
    assert cat.vals.shape[1] == mv.vals.shape[1] + mv2.vals.shape[1]


def make_adapter(tmp_path):
    import jax.numpy as jnp
    from icebin_tpu.coupler.coupler import CouplerConfig
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
    from icebin_tpu.regrid.gcmregridder import GCMRegridder

    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 6))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 31),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 31),
                       projection=PlateCarree(scale=scale))
    gr = GCMRegridder(specA, hcdefs=[0.0, 800.0, 2500.0])
    gr.add_sheet("s", specI, subdiv=1)
    return ModelEAdapter(gr, CouplerConfig(
        dt=86400.0 * 30, matrix_dtype=jnp.float64))


def test_adapter_couple_native(tmp_path):
    ad = make_adapter(tmp_path)
    nE = ad.gr.nE
    rng = np.random.default_rng(0)
    # two 'ranks' each owning half the E cells, ModelE ihc-major indices
    fE_canon = np.zeros((8, nE))
    fE_canon[0] = 1e-5 * rng.uniform(0.5, 1.0, nE)
    fE_canon[4] = -5.0
    fE_modele = to_modele_E(fE_canon, ad.nA, ad.nhc)
    half = nE // 2
    ad.add_rank_output(np.arange(half), fE_modele[:, :half])
    ad.add_rank_output(np.arange(half, nE), fE_modele[:, half:])
    res = ad.couple_native(0.0)["s"]
    # conservation posted by the underlying coupler
    row = ad.coupler.ledger.to_rows()[-1]
    err = abs(row["s.mass_in_E"] - row["s.mass_delivered_I"]) / abs(
        row["s.mass_in_E"])
    assert err < 1e-10
    fhc, elevE, underice = ad.topo()
    assert fhc.shape == (ad.nhc,) + ad.gr.specA.shape[::-1]
    s = fhc.sum(axis=0)
    np.testing.assert_allclose(s[s > 0], 1.0, rtol=1e-12)
    assert res["fE_out_modele"].shape == (10, ad.gr.nE)


def test_gcmce_c_abi(tmp_path):
    """Drive the C ABI (native/gcmce.cc) via ctypes -- the Fortran path."""
    from icebin_tpu.ops.native import ensure_gcmce_lib
    lib_path = ensure_gcmce_lib()
    assert lib_path is not None, "gcmce C ABI library failed to build"
    # write grids + config for gcmce_new
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
    from icebin_tpu.io.ncio import write_grid
    from icebin_tpu.utils.config import RunConfig, SheetConfig
    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 6))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 31),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 31),
                       projection=PlateCarree(scale=scale))
    pa, pi = str(tmp_path / "a.nc"), str(tmp_path / "i.nc")
    write_grid(pa, specA)
    write_grid(pi, specI)
    cfgp = str(tmp_path / "run.json")
    RunConfig(gridA_file=pa, hcdefs=[0.0, 800.0, 2500.0],
              sheets=[SheetConfig(name="s", grid_file=pi, subdiv=1,
                                  engine="numpy")]).to_json(cfgp)

    lib = ctypes.CDLL(str(lib_path))
    lib.gcmce_new.restype = ctypes.c_int
    h = lib.gcmce_new(cfgp.encode())
    assert h > 0
    im = ctypes.c_int()
    jm = ctypes.c_int()
    nhc = ctypes.c_int()
    assert lib.gcmce_dims(h, ctypes.byref(im), ctypes.byref(jm),
                          ctypes.byref(nhc)) == 0
    assert (im.value, jm.value, nhc.value) == (6, 5, 3)
    lib.gcmce_set_start_time(h, ctypes.c_double(0.0))

    nE = im.value * jm.value * nhc.value
    idx = np.arange(nE, dtype=np.int64)
    vals = np.zeros((8, nE))
    vals[0] = 1e-5
    vals[4] = -5.0
    lib.gcmce_add_gcm_outpute(
        h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(nE), 8)
    fhc = np.zeros(nE)
    elevE = np.zeros(nE)
    under = np.zeros(nE, dtype=np.int32)
    rc = lib.gcmce_couple_native(
        h, ctypes.c_double(0.0),
        fhc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        elevE.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        under.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(nE))
    assert rc == 0
    fhc3 = fhc.reshape(nhc.value, jm.value, im.value)
    s = fhc3.sum(axis=0)
    assert (np.abs(s[s > 0] - 1.0) < 1e-9).all()
    lib.gcmce_delete(h)


def test_gcmce_pure_c_driver(tmp_path):
    """Compile and run native/test_gcmce.c -- a Python-free C program
    driving the coupler through the gcmce ABI (the ModelE linking shape)."""
    import subprocess
    from icebin_tpu.ops.native import ensure_gcmce_lib
    assert ensure_gcmce_lib() is not None, "gcmce C ABI failed to build"
    lib_dir = pathlib.Path("/root/repo/native")
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY
    from icebin_tpu.io.ncio import write_grid
    from icebin_tpu.utils.config import RunConfig, SheetConfig
    scale = 25e3
    specA = GridSpecLonLat(lonb=np.linspace(0.0, 40.0, 7),
                           latb=np.linspace(30.0, 80.0, 6))
    specI = GridSpecXY(xb=np.linspace(0.0, 40.0 * scale, 31),
                       yb=np.linspace(30.0 * scale, 80.0 * scale, 31),
                       projection=PlateCarree(scale=scale))
    pa, pi = str(tmp_path / "a.nc"), str(tmp_path / "i.nc")
    write_grid(pa, specA)
    write_grid(pi, specI)
    cfgp = str(tmp_path / "run.json")
    RunConfig(gridA_file=pa, hcdefs=[0.0, 800.0, 2500.0],
              sheets=[SheetConfig(name="s", grid_file=pi,
                                  subdiv=1)]).to_json(cfgp)
    exe = str(tmp_path / "test_gcmce")
    r = subprocess.run(
        ["gcc", str(lib_dir / "test_gcmce.c"), "-o", exe,
         f"-I{lib_dir}", f"-L{lib_dir}", "-licebin_gcmce",
         f"-Wl,-rpath,{lib_dir}"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PYTHONHOME", None)
    # the embedded interpreter must not try to claim the TPU (single-tenant
    # chip; the test only needs the CPU backend)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run([exe, cfgp], capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout
