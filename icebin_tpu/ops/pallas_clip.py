"""Pallas TPU kernel: batched Sutherland--Hodgman polygon-vs-rect clipping.

The north-star geometric kernel ('overlap cells/s', BASELINE.md): replaces
the reference's serial CGAL exact intersection (``GridGen_Exchange`` [U])
with a VPU-resident batch clipper.  Same scatter-free data flow as the
oracle (``icebin_tpu.oracle.clip``), laid out for Mosaic's strengths:

* ONE PAIR PER LANE: a tile processes 128 candidate pairs at once; vertex
  slots live on sublanes, so every operation is a dense (V, 128) vector op.
* No gather/scatter anywhere: the ring interleave [inter_k, v_k] is
  ``pltpu.repeat`` + an even/odd sublane mask, and invalid-slot fill is a
  log-step forward-fill (roll + select), since Mosaic only supports (8,128)
  sublane gathers on this toolchain (measured).
* Buffers double per half-plane pass: V0=8 subject vertices end in a
  128-sublane ring after the 4 passes -- exactly one f32 tile column.

Inputs are recentered per pair by the caller (coordinates O(cell size), so
f32 carries ~1e-7 relative error; the host f64 conservation repair makes
column sums exact regardless -- SURVEY.md section 7 hard parts (a,c)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["clip_areas_centroids_pallas", "clip_areas_centroids_poly_pallas",
           "PAIRS_PER_TILE", "V0", "V0_MAX", "VC_MAX"]

VC_MAX = 8      # max clip-ring vertex slots on the Pallas path (round 5:
                # hex/oct convex clips -- MPAS-style meshes -- run in-kernel;
                # triangles/pentagons duplicate-pad to the next step size in
                # {4, 8}, a zero-length clip edge being a no-op pass.  Each
                # clip-edge pass doubles the ring buffer, so a V0=8 subject
                # ends at 8*2^8 = 2048 sublanes for VC=8 (1 MB f32 per
                # buffer -- comfortably VMEM; wider convex clips route to
                # the jax/numpy engines).

PAIRS_PER_TILE = 128
V0 = 8          # default subject vertex slots (subdiv<=2 lat-lon cells)
V0_MAX = 16     # largest supported slot count (subdiv=4; buffers end at
                # 16*V0 sublanes after the 4 half-plane passes: 256 rows
                # x 128 lanes f32 = 128 KB per tile, comfortably VMEM)


def _row_iota(v):
    return jax.lax.broadcasted_iota(jnp.int32, (v, PAIRS_PER_TILE), 0)


def _ffill_ring(x, y, valid):
    """Replace invalid slots with the nearest preceding valid vertex;
    leading invalid slots wrap to the ring's last valid vertex.  All ops are
    roll+select (log-step), no gather.  Masks are carried as f32 0/1 --
    Mosaic cannot reshape/broadcast i1 vectors (observed trunci failure)."""
    v = x.shape[0]
    has = valid                        # f32 0/1
    s = 1
    while s < v:
        rows = _row_iota(v)
        xs = pltpu.roll(x, s, 0)
        ys = pltpu.roll(y, s, 0)
        hs = pltpu.roll(has, s, 0) * jnp.where(rows >= s, 1.0, 0.0)
        take = (1.0 - has) * hs
        x = jnp.where(take > 0.5, xs, x)
        y = jnp.where(take > 0.5, ys, y)
        has = jnp.maximum(has, hs)
        s *= 2
    # wrap: rows still invalid (before the first valid slot) get the LAST
    # resolved value; after ffill the bottom row holds it wherever any slot
    # was valid.
    xl = x[v - 1:v, :]
    yl = y[v - 1:v, :]
    x = jnp.where(has > 0.5, x, jnp.broadcast_to(xl, x.shape))
    y = jnp.where(has > 0.5, y, jnp.broadcast_to(yl, y.shape))
    return x, y


def _halfplane_pass(x, y, d):
    """One S--H pass keeping d >= 0: (V,128) -> (2V,128)."""
    v = x.shape[0]
    xp = pltpu.roll(x, 1, 0)
    yp = pltpu.roll(y, 1, 0)
    dp = pltpu.roll(d, 1, 0)
    inside = jnp.where(d >= 0.0, 1.0, 0.0)
    insp = jnp.where(dp >= 0.0, 1.0, 0.0)
    cross = jnp.abs(inside - insp)          # f32 0/1 mask
    denom = dp - d
    t = jnp.where(cross > 0.5,
                  dp / jnp.where(jnp.abs(denom) > 0.0, denom, 1.0), 0.0)
    xi = xp + t * (x - xp)
    yi = yp + t * (y - yp)
    # interleave [xi_k, x_k] along sublanes: element-repeat (broadcast +
    # reshape; NB pltpu.repeat TILES, it does not element-repeat) + parity
    def rep2(a):
        return jnp.broadcast_to(a[:, None, :], (v, 2, a.shape[1])
                                ).reshape(2 * v, a.shape[1])
    even = (_row_iota(2 * v) & 1) == 0
    xn = jnp.where(even, rep2(xi), rep2(x))
    yn = jnp.where(even, rep2(yi), rep2(y))
    valid = jnp.where(even, rep2(cross), rep2(inside))
    return _ffill_ring(xn, yn, valid)


def _finish_area_centroid(x, y, area_ref, cx_ref, cy_ref):
    vfin = x.shape[0]
    xn = pltpu.roll(x, vfin - 1, 0)   # roll by -1 == +(V-1); shift >= 0 only
    yn = pltpu.roll(y, vfin - 1, 0)
    cr = x * yn - xn * y
    a = 0.5 * jnp.sum(cr, axis=0, keepdims=True)
    area_ref[:] = a
    six_a = jnp.where(jnp.abs(a) > 0.0, 6.0 * a, 1.0)
    cx = jnp.sum((x + xn) * cr, axis=0, keepdims=True) / six_a
    cy = jnp.sum((y + yn) * cr, axis=0, keepdims=True) / six_a
    deg = jnp.abs(a) <= 0.0
    cx_ref[:] = jnp.where(deg, x[0:1, :], cx)
    cy_ref[:] = jnp.where(deg, y[0:1, :], cy)


def _polyclip_kernel(x_ref, y_ref, qx_ref, qy_ref, area_ref, cx_ref,
                     cy_ref):
    """Subject rings x CONVEX clip rings (round 4 quads; round 5 any
    Vc <= VC_MAX): one half-plane pass per clip edge, d = cross(b - a,
    p - a); duplicate clip vertices give d == 0 everywhere (a no-op
    pass), so smaller rings pad free.  Same buffer doubling as the rect
    kernel: V0 -> V0 * 2^Vc after the Vc passes."""
    x = x_ref[:]                      # (V0, 128)
    y = y_ref[:]
    qx = qx_ref[:]                    # (Vc, 128) clip-ring vertices
    qy = qy_ref[:]
    vc = qx.shape[0]
    for k in range(vc):
        ax = qx[k:k + 1, :]
        ay = qy[k:k + 1, :]
        bx = qx[(k + 1) % vc:(k + 1) % vc + 1, :]
        by = qy[(k + 1) % vc:(k + 1) % vc + 1, :]
        d = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        x, y = _halfplane_pass(x, y, d)
    _finish_area_centroid(x, y, area_ref, cx_ref, cy_ref)


def _clip_kernel(x_ref, y_ref, hx_ref, hy_ref, area_ref, cx_ref, cy_ref):
    x = x_ref[:]                      # (V0, 128)
    y = y_ref[:]
    hx = hx_ref[:]                    # (1, 128) rect half-extents
    hy = hy_ref[:]
    x, y = _halfplane_pass(x, y, x + hx)          # x >= -hx
    x, y = _halfplane_pass(x, y, hx - x)          # x <= +hx
    x, y = _halfplane_pass(x, y, y + hy)          # y >= -hy
    x, y = _halfplane_pass(x, y, hy - y)          # y <= +hy
    _finish_area_centroid(x, y, area_ref, cx_ref, cy_ref)


@jax.jit
def clip_areas_centroids_pallas(polys, rects):
    """Drop-in replacement for ``ops.clip.clip_areas_centroids``.

    polys: (B, v0, 2) recentered subject rings (duplicate padding),
    v0 in {8, 16} -- the kernel body is shape-generic, the buffers just
    double per half-plane pass from whatever v0 it starts at;
    rects: (B, 4) recentered rects (so x0 = -x1, y0 = -y1).
    B must be a multiple of 128 (the engine wrapper pads).
    Returns (areas (B,), centroids (B, 2)).
    """
    B = polys.shape[0]
    v0 = polys.shape[1]
    if v0 not in (V0, V0_MAX):
        raise ValueError(f"pallas clip kernel supports v0 in "
                         f"{{{V0}, {V0_MAX}}} (got {v0}); the engine "
                         "wrapper duplicate-pads to the next size")
    xs = polys[:, :, 0].T.astype(jnp.float32)       # (v0, B)
    ys = polys[:, :, 1].T.astype(jnp.float32)
    hx = (0.5 * (rects[:, 2] - rects[:, 0]))[None, :].astype(jnp.float32)
    hy = (0.5 * (rects[:, 3] - rects[:, 1]))[None, :].astype(jnp.float32)

    grid = (B // PAIRS_PER_TILE,)
    vspec = lambda v: pl.BlockSpec((v, PAIRS_PER_TILE),
                                   lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    area, cx, cy = pl.pallas_call(
        _clip_kernel,
        grid=grid,
        in_specs=[vspec(v0), vspec(v0), vspec(1), vspec(1)],
        out_specs=(vspec(1), vspec(1), vspec(1)),
        out_shape=(jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        interpret=jax.default_backend() != "tpu",
    )(xs, ys, hx, hy)
    return area[0], jnp.stack([cx[0], cy[0]], axis=-1)


@jax.jit
def clip_areas_centroids_poly_pallas(polys, clips):
    """Subject rings x convex clip QUADS on the Pallas path (round 4).

    polys: (B, v0, 2) recentered subject rings, v0 in {8, 16};
    clips: (B, vc, 2) recentered CCW convex clip rings, vc in {4, 8}
    (smaller rings duplicate-pad to the next step).  B a multiple of 128.
    """
    B = polys.shape[0]
    v0 = polys.shape[1]
    if v0 not in (V0, V0_MAX):
        raise ValueError(f"pallas poly-clip supports v0 in "
                         f"{{{V0}, {V0_MAX}}} (got {v0})")
    if clips.shape[1] not in (4, VC_MAX):
        raise ValueError(f"pallas poly-clip needs 4 or {VC_MAX} clip "
                         f"vertex slots (duplicate-pad smaller rings)")
    xs = polys[:, :, 0].T.astype(jnp.float32)       # (v0, B)
    ys = polys[:, :, 1].T.astype(jnp.float32)
    qx = clips[:, :, 0].T.astype(jnp.float32)       # (VC_MAX, B)
    qy = clips[:, :, 1].T.astype(jnp.float32)

    grid = (B // PAIRS_PER_TILE,)
    vspec = lambda v: pl.BlockSpec((v, PAIRS_PER_TILE),
                                   lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    area, cx, cy = pl.pallas_call(
        _polyclip_kernel,
        grid=grid,
        in_specs=[vspec(v0), vspec(v0), vspec(clips.shape[1]),
                  vspec(clips.shape[1])],
        out_specs=(vspec(1), vspec(1), vspec(1)),
        out_shape=(jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        interpret=jax.default_backend() != "tpu",
    )(xs, ys, qx, qy)
    return area[0], jnp.stack([cx[0], cy[0]], axis=-1)
