"""Measure the attached chip's REAL scoped-VMEM headroom (round 5).

Mosaic's default scoped-VMEM limit is 16 MB, but chips carry far more
(the attached v5e ran 2x48 MB of live kernel buffers).  This probe
binary-searches the largest in+out buffer pair a trivial kernel can hold
with ``vmem_limit_bytes`` raised, which is the number to feed
``icebin_tpu.ops.tuning`` ``vmem_limit`` for a new device kind (leave
~20% margin for the fused kernels' scratch).  Run: python
tools/probe_vmem.py
"""
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def try_mb(mb):
        n = mb * 1024 * 1024 // (128 * 4) // 8 * 8

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        try:
            x = jnp.ones((n, 128), jnp.float32)
            r = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=256 * 1024 * 1024),
            )(x)
            r.block_until_ready()
            return True
        except Exception:
            return False

    lo, hi = 8, 256
    while not try_mb(lo):
        lo //= 2
        if lo < 1:
            print("even 1 MB fails; relay/back-end problem", flush=True)
            return
    while try_mb(hi):
        hi *= 2
    while hi - lo > 2:
        mid = (lo + hi) // 2
        if try_mb(mid):
            lo = mid
        else:
            hi = mid
    print(f"largest OK in+out buffer pair: 2 x {lo} MB "
          f"(total live ~{2*lo} MB)", flush=True)
    print(f"suggested ops/tuning vmem_limit: "
          f"{int(2*lo*0.8)} MB = {int(2*lo*0.8)*1024*1024}", flush=True)


if __name__ == "__main__":
    main()
