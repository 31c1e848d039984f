"""Distributed Pallas SpMM on the virtual 8-device CPU mesh vs the oracle.

Exercises the production multi-chip apply path: per-device PallasBDT over
ice-column partitions, local tile streams, one psum of E3 partials
(dest-small), purely local dest-ice. SURVEY.md §2.11 'no root gather'.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icebin_tpu.parallel.mesh import make_mesh
from icebin_tpu.parallel.pallas_spmv import (make_sharded_apply_ice,
                                             make_sharded_apply_small,
                                             sharded_pallas_from_weighted)
from tests.test_pallas_bdt import oracle_ice, oracle_small, synth


@pytest.fixture(scope="module")
def setup():
    M = synth(nx=256, ny=24)            # nI=6144 -> 48 blocks / 8 devices
    mesh = make_mesh(8)
    spm = sharded_pallas_from_weighted(mesh, M, small_axis="rows", nv=8)
    return M, mesh, spm


def test_sharded_apply_small(setup):
    M, mesh, spm = setup
    rng = np.random.default_rng(0)
    f = rng.uniform(0.5, 1.5, (8, M.shape[1]))
    f[1, ::5] = np.nan
    fb = spm.ice_to_blocked_global(jnp.asarray(f, jnp.float32), M.shape[1])
    fn = make_sharded_apply_small(mesh, spm)
    e3 = fn(fb)
    got = np.asarray(spm.template.e3_to_small(e3))[:, :M.shape[0]]
    ref = oracle_small(M, f)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5


def test_sharded_apply_ice_and_round_trip(setup):
    M, mesh, spm = setup
    rng = np.random.default_rng(1)
    g = rng.uniform(0.5, 1.5, (8, M.shape[0]))
    e3 = spm.template.small_to_e3(jnp.asarray(g, jnp.float32))
    fn = make_sharded_apply_ice(mesh, spm)
    out = fn(e3)
    got = np.asarray(spm.blocked_global_to_ice(out, M.shape[1]))
    ref = oracle_ice(M, g)
    assert np.max(np.abs(got - ref) / (np.abs(ref) + 1e-9)) < 2e-5

    # round trip EvI∘IvE conserves mass: sum(IvE(EvI f) * wI) relates via
    # the scaled-means identity; check the unscaled-mass identity on EvI
    f = rng.uniform(1.0, 2.0, (8, M.shape[1]))
    fb = spm.ice_to_blocked_global(jnp.asarray(f, jnp.float32), M.shape[1])
    e3f = make_sharded_apply_small(mesh, spm)(fb)
    e = np.asarray(spm.template.e3_to_small(e3f))[:, :M.shape[0]]
    lhs = (e * M.wM[None, :]).sum(axis=1)
    rhs = (f * M.Mw[None, :]).sum(axis=1)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
