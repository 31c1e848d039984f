"""Chained-apply benchmark: N dependent EvI/IvE round trips inside one jit,
one sync fetch; subtract the ~27ms relay latency."""
import time
import numpy as np
import jax, jax.numpy as jnp

from icebin_tpu.regrid.sparse import WeightedMatrix
from icebin_tpu.ops.bdt import bdt_from_weighted, apply_bdt
from icebin_tpu.ops.spmv import DeviceCOO, DeviceELL, apply_ell, apply_matrix

from importlib import import_module
synth_evi = import_module("tools.bench_bdt").synth_evi if False else None

def synth(nx=1216, ny=1216, ratioA=48, nhc=5, seed=0):
    rng = np.random.default_rng(seed)
    nI = nx * ny
    ii = np.arange(nI)
    ix, iy = ii % nx, ii // nx
    nxa = -(-nx // ratioA)
    a = (iy // ratioA) * nxa + ix // ratioA
    nA = nxa * (-(-ny // ratioA))
    elev = rng.uniform(0, 3400, nI)
    hc = np.linspace(0, 3500, nhc)
    k = np.clip(np.searchsorted(hc, elev) - 1, 0, nhc - 2)
    t = (elev - hc[k]) / np.diff(hc)[0]
    rows = np.concatenate([a * nhc + k, a * nhc + k + 1])
    cols = np.concatenate([ii, ii])
    vals = np.concatenate([25e6 * (1 - t), 25e6 * t])
    return WeightedMatrix(rows=rows, cols=cols, vals=vals, shape=(nA * nhc, nI))

N = 16
LAT = 0.027

def bench(tag, apply_down, apply_up, Mdown, Mup, fI, per_iter_bytes):
    @jax.jit
    def chain(md, mu, f):
        def body(c, _):
            e = apply_down(md, c)          # EvI: ice -> E
            c2 = apply_up(mu, e)           # IvE: E -> ice
            return c2, ()
        c, _ = jax.lax.scan(body, f, None, length=N)
        return c.sum()
    float(chain(Mdown, Mup, fI))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(chain(Mdown, Mup, fI))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - LAT) / N
    print(f"{tag}: {per*1e3:7.2f} ms/round-trip -> {per_iter_bytes/per/1e9:6.1f} GB/s effective")
    return per

def main():
    M = synth()
    nvar = 8
    nE, nI = M.shape
    rng = np.random.default_rng(1)
    fI = jnp.asarray(rng.uniform(0.5, 1.5, (nvar, nI)), jnp.float32)

    bm = bdt_from_weighted(M, small_axis="rows")
    bmT = bdt_from_weighted(M.transpose(), small_axis="cols")
    tile_bytes = bm.tiles.size * 4 + bmT.tiles.size * 4
    io_bytes = 2 * (nvar * nI * 4 + nvar * nE * 4)
    print(f"tiles: {bm.tiles.size*4/1e6:.0f}+{bmT.tiles.size*4/1e6:.0f} MB, T={bm.row_start.shape[1]},{bmT.row_start.shape[1]}")
    bench("BDT  round-trip", lambda m, f: apply_bdt(m, f, scale=True, fill=0.0),
          lambda m, f: apply_bdt(m, f, scale=True, fill=0.0), bm, bmT, fI,
          tile_bytes + io_bytes)

    dm = DeviceCOO.from_weighted(M)
    de = DeviceELL.from_weighted(M.transpose(), K=4)
    coo_bytes = 2 * (M.nnz * 8) + io_bytes
    bench("XLA gather r-t ", lambda m, f: apply_matrix(m, f, scale=True, fill=0.0),
          lambda m, f: apply_ell(m, f, scale=True, fill=0.0), dm, de, fI,
          coo_bytes)

if __name__ == "__main__":
    main()
