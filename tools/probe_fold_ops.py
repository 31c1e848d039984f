"""Minimal Mosaic feasibility probes for the sublane<->lane fold ops the
lane-packed kernels need (VERDICT r2 #1): which of reshape / static sublane
slice / lane slice / lane concat / sublane concat compile on this chip?"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        out = np.asarray(jax.jit(fn)(x))
        print(f"{name:40s}: OK  sum={out.sum():.3f}")
        return out
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:40s}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    rng = np.random.default_rng(0)
    x328 = jnp.asarray(rng.uniform(-1, 1, (32, 8)), jnp.float32)
    x464 = jnp.asarray(rng.uniform(-1, 1, (4, 64)), jnp.float32)

    def k_reshape_down(x_ref, o_ref):      # (32, 8) -> (4, 64)
        o_ref[:] = x_ref[:].reshape(4, 64)

    def k_reshape_up(x_ref, o_ref):        # (4, 64) -> (32, 8)
        o_ref[:] = x_ref[:].reshape(32, 8)

    def k_subslice_concat(x_ref, o_ref):   # 8 x (4-row slices) -> lane concat
        x = x_ref[:]
        o_ref[:] = jnp.concatenate([x[r * 4:(r + 1) * 4, :]
                                    for r in range(8)], axis=1)

    def k_laneslice_concat(x_ref, o_ref):  # 8 x (8-lane slices) -> subl concat
        x = x_ref[:]
        o_ref[:] = jnp.concatenate([x[:, r * 8:(r + 1) * 8]
                                    for r in range(8)], axis=0)

    a = run("reshape (32,8)->(4,64)", k_reshape_down, x328, (4, 64))
    b = run("reshape (4,64)->(32,8)", k_reshape_up, x464, (32, 8))
    c = run("sublane slices + lane concat", k_subslice_concat, x328, (4, 64))
    d = run("lane slices + sublane concat", k_laneslice_concat, x464,
            (32, 8))
    # reference semantics
    ref_down = np.asarray(x328).reshape(4, 64)
    for name, got in (("reshape", a), ("slice+concat", c)):
        if got is not None:
            ok = np.array_equal(got, ref_down)
            print(f"  {name} matches row-major fold: {ok}")
    # V1 semantics: rows r*ts+t -> lanes r*8+v
    x_r = np.asarray(x328).reshape(8, 4, 8)
    ref_v1 = np.concatenate([x_r[r] for r in range(8)], axis=1)
    if c is not None:
        print(f"  slice+concat == V1 fold: {np.array_equal(np.asarray(c), ref_v1)}")

    # bigger, realistic shapes with a leading block dim
    x_big = jnp.asarray(rng.uniform(-1, 1, (64, 32, 8)), jnp.float32)

    def k_block_fold(x_ref, o_ref):
        for bb in range(64):
            xb = x_ref[bb]
            o_ref[bb] = jnp.concatenate([xb[r * 4:(r + 1) * 4, :]
                                         for r in range(8)], axis=1)
    run("64-block sublane-slice fold", k_block_fold, x_big, (64, 4, 64))

    def k_block_reshape(x_ref, o_ref):
        for bb in range(64):
            o_ref[bb] = x_ref[bb].reshape(4, 64)
    run("64-block reshape fold", k_block_reshape, x_big, (64, 4, 64))


if __name__ == "__main__":
    main()
