"""Validate the fused Pallas BDT kernels against the WeightedMatrix oracle.

Runs on whatever backend is attached (interpret mode off-TPU). Small
synthetic matrix with deliberate irregularities: masked cells, multiple
windows per block, entries pushed to overflow via a tiny T cap.
"""
import numpy as np
import jax
import jax.numpy as jnp

from icebin_tpu.regrid.sparse import WeightedMatrix
from icebin_tpu.ops.pallas_bdt import (pallas_from_weighted, apply_small,
                                       apply_ice)


def synth(nx=640, ny=48, ratio=16, nhc=3, seed=0):
    rng = np.random.default_rng(seed)
    nI = nx * ny
    ii = np.arange(nI)
    ix, iy = ii % nx, ii // nx
    nxa = -(-nx // ratio)
    a = (iy // ratio) * nxa + ix // ratio
    nA = nxa * (-(-ny // ratio))
    elev = rng.uniform(0, 3400, nI)
    hc = np.linspace(0, 3500, nhc)
    k = np.clip(np.searchsorted(hc, elev) - 1, 0, nhc - 2)
    t = (elev - hc[k]) / np.diff(hc)[0]
    area = rng.uniform(20e6, 30e6, nI)
    rows = np.concatenate([a * nhc + k, a * nhc + k + 1])
    cols = np.concatenate([ii, ii])
    vals = np.concatenate([area * (1 - t), area * t])
    keep = rng.uniform(size=len(rows)) > 0.1      # irregular sparsity
    return WeightedMatrix(rows=rows[keep], cols=cols[keep], vals=vals[keep],
                          shape=(nA * nhc, nI))


def main():
    M = synth()
    nS, nI = M.shape
    print(f"nS={nS} nI={nI} nnz={M.nnz} backend={jax.default_backend()}")
    rng = np.random.default_rng(1)

    for tag, kw in [("T-capped (overflow exercised)",
                     dict(max_tiles_per_block=2)),
                    ("default T", dict())]:
        pm = pallas_from_weighted(M, small_axis="rows", nv=8, **kw)
        nov = 0 if pm.ov_s is None else pm.ov_s.size
        print(f"--- {tag}: nchunk={pm.nchunk} ts={pm.ts} npspad={pm.npspad} "
              f"W8={pm.W8} NWpad={pm.NWpad} overflow={nov}")

        f = rng.uniform(0.5, 1.5, (8, nI))
        f[0, ::7] = np.nan                         # masked cells
        fj = jnp.asarray(f, jnp.float32)

        # oracle: scipy-style COO apply
        f0 = np.where(np.isfinite(f), f, 0.0)
        ref = np.zeros((8, nS))
        np.add.at(ref.T, M.rows, (M.vals[None, :] * f0[:, M.cols]).T)
        refs = np.where(M.wM != 0, ref / np.where(M.wM == 0, 1, M.wM), 0.0)

        got = np.asarray(apply_small(pm, fj, scale=True))
        err = np.max(np.abs(got - refs) / (np.abs(refs) + 1e-9))
        print(f"dest-small rel err: {err:.2e}")
        assert err < 2e-5, err

        g = rng.uniform(0.5, 1.5, (8, nS))
        gj = jnp.asarray(g, jnp.float32)
        refI = np.zeros((8, nI))
        np.add.at(refI.T, M.cols, (M.vals[None, :] * g[:, M.rows]).T)
        refIs = np.where(M.Mw != 0, refI / np.where(M.Mw == 0, 1, M.Mw), 0.0)
        gotI = np.asarray(apply_ice(pm, gj, scale=True))
        errI = np.max(np.abs(gotI - refIs) / (np.abs(refIs) + 1e-9))
        print(f"dest-ice  rel err: {errI:.2e}")
        assert errI < 2e-5, errI

        # conservation: sum(out * wM) == sum(f * Mw)
        out = np.asarray(apply_small(pm, fj, scale=False))
        lhs = out.sum(axis=1)
        rhsv = (f0 * M.Mw[None, :]).sum(axis=1)
        cons = np.max(np.abs(lhs - rhsv) / np.abs(rhsv))
        print(f"conservation rel err: {cons:.2e}")
        assert cons < 1e-5
    print("OK")


if __name__ == "__main__":
    main()
