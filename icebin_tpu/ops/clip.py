"""Batched polygon-vs-rectangle clipping on TPU (XLA and Pallas engines).

Same scatter-free Sutherland--Hodgman data flow as the f64 oracle
(``icebin_tpu.oracle.clip`` -- see its docstring for the algorithm); here
expressed in jax so XLA fuses the whole 4-pass clip + shoelace into one
kernel launch, plus a hand-written Pallas version (``pallas_clip``) for
speed-of-light throughput on the 'overlap cells/s' north-star metric
(BASELINE.md).  Inputs are recentered per pair by the caller so f32 holds
~1e-7 relative accuracy; conservation is restored exactly by the host-side
f64 repair pass (``icebin_tpu.grid.exchange``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clip_polys_rects", "clip_polys_polys", "polygon_areas",
           "polygon_centroids", "clip_areas_centroids",
           "clip_areas_centroids_poly", "make_clip_engine",
           "make_polyclip_engine"]


def _propagate_last_valid(pts, valid):
    """(B, V, 2), (B, V) -> invalid slots replaced by nearest preceding valid
    vertex (ring wrap); rows with no valid slots become all-zero."""
    B, V, _ = pts.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    idx = jnp.where(valid, slot, -1)
    idx = jax.lax.cummax(idx, axis=1)
    last = idx[:, -1]
    any_valid = last >= 0
    idx = jnp.where(idx < 0, last[:, None], idx)
    idx = jnp.where(any_valid[:, None], idx, 0)
    out = jnp.take_along_axis(pts, idx[:, :, None], axis=1)
    return jnp.where(any_valid[:, None, None], out, 0.0)


def halfplane_pass(pts, d):
    """One S--H pass keeping d >= 0; (B, V, 2) -> (B, 2V, 2)."""
    prev = jnp.roll(pts, 1, axis=1)
    dprev = jnp.roll(d, 1, axis=1)
    inside = d >= 0.0
    inside_prev = dprev >= 0.0
    crossing = inside != inside_prev
    denom = dprev - d
    safe = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
    t = jnp.where(crossing, dprev / safe, 0.0)[:, :, None]
    inter = prev + t * (pts - prev)
    # Interleave [inter_k, v_k] along the vertex axis.
    out = jnp.stack([inter, pts], axis=2).reshape(pts.shape[0], -1, 2)
    valid = jnp.stack([crossing, inside], axis=2).reshape(pts.shape[0], -1)
    return _propagate_last_valid(out, valid)


def clip_polys_rects(polys, rects):
    """(B, V0, 2) polys x (B, 4) rects (x0,y0,x1,y1) -> (B, 16*V0, 2) rings."""
    p = polys
    p = halfplane_pass(p, p[:, :, 0] - rects[:, 0:1])
    p = halfplane_pass(p, rects[:, 2:3] - p[:, :, 0])
    p = halfplane_pass(p, p[:, :, 1] - rects[:, 1:2])
    p = halfplane_pass(p, rects[:, 3:4] - p[:, :, 1])
    return p


def polygon_areas(rings):
    x = rings[:, :, 0]
    y = rings[:, :, 1]
    xn = jnp.roll(x, -1, axis=1)
    yn = jnp.roll(y, -1, axis=1)
    return 0.5 * jnp.sum(x * yn - xn * y, axis=1)


def polygon_centroids(rings):
    x = rings[:, :, 0]
    y = rings[:, :, 1]
    xn = jnp.roll(x, -1, axis=1)
    yn = jnp.roll(y, -1, axis=1)
    cr = x * yn - xn * y
    a = 0.5 * jnp.sum(cr, axis=1)
    cx = jnp.sum((x + xn) * cr, axis=1)
    cy = jnp.sum((y + yn) * cr, axis=1)
    safe = jnp.where(jnp.abs(a) > 0.0, 6.0 * a, 1.0)
    c = jnp.stack([cx, cy], axis=-1) / safe[:, None]
    return jnp.where((jnp.abs(a) <= 0.0)[:, None], rings[:, 0, :], c)


@functools.partial(jax.jit, static_argnames=())
def clip_areas_centroids(polys, rects):
    rings = clip_polys_rects(polys, rects)
    return polygon_areas(rings), polygon_centroids(rings)


def clip_polys_polys(polys, clips):
    """XLA twin of ``oracle.clip.clip_polys_polys``: subject rings x CONVEX
    clip rings (CCW; duplicate clip vertices are no-op passes)."""
    p = polys
    Vc = clips.shape[1]
    for k in range(Vc):
        a = clips[:, k, :]
        b = clips[:, (k + 1) % Vc, :]
        ex = (b - a)[:, None, :]
        d = (ex[:, :, 0] * (p[:, :, 1] - a[:, None, 1])
             - ex[:, :, 1] * (p[:, :, 0] - a[:, None, 0]))
        p = halfplane_pass(p, d)
    return p


@functools.partial(jax.jit, static_argnames=())
def clip_areas_centroids_poly(polys, clips):
    rings = clip_polys_polys(polys, clips)
    return polygon_areas(rings), polygon_centroids(rings)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def make_clip_engine(engine: str = "jax", dtype=None):
    """Returns fn(subj (B,V0,2) np, rect (B,4) np) -> (areas, centroids).

    Pads the batch to a power of two so jit specializes on O(log B) shapes.
    """
    if engine == "pallas":
        from icebin_tpu.ops.pallas_clip import clip_areas_centroids_pallas
        kernel = clip_areas_centroids_pallas
    else:
        kernel = clip_areas_centroids
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def fn(subj: np.ndarray, rect: np.ndarray):
        B = subj.shape[0]
        Bp = max(8, _next_pow2(B))
        if engine == "pallas":
            Bp = max(128, Bp)  # kernel tiles are 128 pairs wide
            from icebin_tpu.ops.pallas_clip import V0 as KV0, V0_MAX
            kv = KV0 if subj.shape[1] <= KV0 else V0_MAX
            if subj.shape[1] > V0_MAX:
                raise ValueError(f"pallas engine supports <= {V0_MAX} "
                                 f"subject vertices (got {subj.shape[1]}); "
                                 f"use subdiv<=4 or engine='jax'")
            if subj.shape[1] < kv:    # duplicate-pad vertices to kernel v0
                pad = np.repeat(subj[:, -1:, :], kv - subj.shape[1], axis=1)
                subj = np.concatenate([subj, pad], axis=1)
        if Bp != B:
            subj = np.concatenate(
                [subj, np.zeros((Bp - B,) + subj.shape[1:], subj.dtype)])
            rect = np.concatenate(
                [rect, np.tile(np.array([[0.0, 0.0, 1.0, 1.0]]), (Bp - B, 1))])
        if engine == "pallas":
            # Mosaic rejects x64 (i64 roll shifts); the kernel is all-f32
            # regardless, so trace with x64 scoped off (the CLI and other
            # f64-ledger callers run under a global enable_x64)
            with jax.enable_x64(False):
                a, c = kernel(jnp.asarray(subj, jnp.float32),
                              jnp.asarray(rect, jnp.float32))
        else:
            a, c = kernel(jnp.asarray(subj, dtype), jnp.asarray(rect, dtype))
        # return ASYNC device slices -- the exchange builder dispatches all
        # chunks before fetching any (per-chunk np.asarray = one relay
        # round trip each, dominating large polar builds)
        return a[:B], c[:B]

    return fn


def make_polyclip_engine(engine: str = "jax", dtype=None):
    """Returns fn(subj (B,V0,2) np, clip (B,Vc,2) np) -> (areas, centroids)
    for CONVEX clip rings (round 4: generic x generic exchange grids).

    Engines: 'numpy' (f64 oracle), 'jax' (XLA), 'pallas' (TPU kernel;
    Vc <= 8 and V0 <= 16 -- smaller clip rings duplicate-pad to the next
    step size in {4, 8})."""
    if engine == "numpy":
        from icebin_tpu.oracle.clip import (clip_polys_polys as _cpp,
                                            polygon_areas as _pa,
                                            polygon_centroids as _pc)

        def fn(subj, clip):
            rings = _cpp(np.asarray(subj, np.float64),
                         np.asarray(clip, np.float64))
            return _pa(rings), _pc(rings)
        return fn

    if engine == "pallas":
        from icebin_tpu.ops.pallas_clip import (
            V0 as KV0, V0_MAX, VC_MAX, clip_areas_centroids_poly_pallas)
        kernel = clip_areas_centroids_poly_pallas
    else:
        kernel = clip_areas_centroids_poly
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def fn(subj: np.ndarray, clip: np.ndarray):
        B = subj.shape[0]
        Bp = max(8, _next_pow2(B))
        if engine == "pallas":
            Bp = max(128, Bp)
            if subj.shape[1] > V0_MAX or clip.shape[1] > VC_MAX:
                raise ValueError(
                    f"pallas poly-clip supports V0 <= {V0_MAX} subject and "
                    f"Vc <= {VC_MAX} clip vertices (got {subj.shape[1]}, "
                    f"{clip.shape[1]}); use engine='jax' or 'numpy'")
            kv = KV0 if subj.shape[1] <= KV0 else V0_MAX
            if subj.shape[1] < kv:
                pad = np.repeat(subj[:, -1:, :], kv - subj.shape[1], axis=1)
                subj = np.concatenate([subj, pad], axis=1)
            kc = 4 if clip.shape[1] <= 4 else VC_MAX   # step sizes {4, 8}
            if clip.shape[1] < kc:
                pad = np.repeat(clip[:, -1:, :], kc - clip.shape[1],
                                axis=1)
                clip = np.concatenate([clip, pad], axis=1)
        if Bp != B:
            # Pad-pair invariant: an all-zero CLIP ring is a NO-OP (every
            # zero-length clip edge gives d == 0, which KEEPS subject
            # vertices) -- pad results are zero-area only because the pad
            # SUBJECTS are also all-zero rings (zero shoelace area), and
            # the a[:B] slice drops them regardless.
            subj = np.concatenate(
                [subj, np.zeros((Bp - B,) + subj.shape[1:], subj.dtype)])
            clip = np.concatenate(
                [clip, np.zeros((Bp - B,) + clip.shape[1:], clip.dtype)])
        if engine == "pallas":
            with jax.enable_x64(False):
                a, c = kernel(jnp.asarray(subj, jnp.float32),
                              jnp.asarray(clip, jnp.float32))
        else:
            a, c = kernel(jnp.asarray(subj, dtype), jnp.asarray(clip, dtype))
        return a[:B], c[:B]

    return fn
