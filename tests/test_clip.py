"""Clipping kernel tests: oracle (numpy f64) and XLA engine parity.

The strongest oracle here is the partition identity: clipping a polygon
against every cell of a lattice that covers it must return areas summing to
the polygon's area (this exercises every S--H branch: inside, outside,
entering, leaving, corner-crossing)."""
import numpy as np
import pytest

from icebin_tpu.oracle.clip import (clip_polys_rects, polygon_areas,
                                    polygon_centroids)


def pad_poly(pts, V):
    pts = np.asarray(pts, dtype=np.float64)
    pad = np.repeat(pts[-1:], V - len(pts), axis=0)
    return np.concatenate([pts, pad], axis=0)


def clip1(poly, rect, V=8):
    polys = pad_poly(poly, V)[None]
    rects = np.asarray(rect, dtype=np.float64)[None]
    rings = clip_polys_rects(polys, rects)
    return (polygon_areas(rings)[0], polygon_centroids(rings)[0])


def test_square_inside():
    a, c = clip1([[1, 1], [2, 1], [2, 2], [1, 2]], [0, 0, 3, 3])
    np.testing.assert_allclose(a, 1.0)
    np.testing.assert_allclose(c, [1.5, 1.5])


def test_square_outside():
    a, _ = clip1([[5, 5], [6, 5], [6, 6], [5, 6]], [0, 0, 3, 3])
    np.testing.assert_allclose(a, 0.0, atol=1e-15)


def test_rect_overlap_analytic():
    rng = np.random.default_rng(1)
    for _ in range(200):
        ax0, ay0 = rng.uniform(-5, 5, 2)
        aw, ah = rng.uniform(0.1, 4, 2)
        bx0, by0 = rng.uniform(-5, 5, 2)
        bw, bh = rng.uniform(0.1, 4, 2)
        poly = [[ax0, ay0], [ax0 + aw, ay0], [ax0 + aw, ay0 + ah], [ax0, ay0 + ah]]
        rect = [bx0, by0, bx0 + bw, by0 + bh]
        a, _ = clip1(poly, rect)
        expect = (max(0.0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
                  * max(0.0, min(ay0 + ah, by0 + bh) - max(ay0, by0)))
        np.testing.assert_allclose(a, expect, atol=1e-12)


def test_triangle_corner_clip():
    # right triangle (0,0)-(2,0)-(0,2) clipped to unit square:
    # loses the triangle beyond x+y>... intersection area = 1 - 0.5*1*1 = wait:
    # region x<=1, y<=1 of the triangle: area = 1*1 - area{x+y>2 in square}=1
    # minus corner triangle {x+y>2} which has zero overlap with unit square?
    # x+y<=2 for all (x,y) in [0,1]^2 except point (1,1). So area = triangle
    # area inside square: the triangle covers {x>=0,y>=0,x+y<=2}; the whole
    # unit square satisfies that. Expect 1.0.
    a, _ = clip1([[0, 0], [2, 0], [0, 2]], [0, 0, 1, 1], V=8)
    np.testing.assert_allclose(a, 1.0, atol=1e-14)
    # clipped to [1,2]x[1,2]: only the empty corner -> 0
    a, _ = clip1([[0, 0], [2, 0], [0, 2]], [1, 1, 2, 2], V=8)
    np.testing.assert_allclose(a, 0.0, atol=1e-14)
    # clipped to [0.5,1.5]^2: region of triangle with .5<=x<=1.5,.5<=y<=1.5,
    # x+y<=2: square area 1 minus corner triangle beyond x+y=2 with legs 1
    # -> 1 - 0.5 = 0.5
    a, _ = clip1([[0, 0], [2, 0], [0, 2]], [0.5, 0.5, 1.5, 1.5], V=8)
    np.testing.assert_allclose(a, 0.5, atol=1e-14)


def test_partition_identity_random_polys():
    """Sum over lattice cells of clipped areas == polygon area (f64 exact)."""
    rng = np.random.default_rng(2)
    xb = np.linspace(0, 1, 8)
    yb = np.linspace(0, 1, 7)
    rects = []
    for j in range(6):
        for i in range(7):
            rects.append([xb[i], yb[j], xb[i + 1], yb[j + 1]])
    rects = np.array(rects)
    for _ in range(50):
        # random convex polygon inside [0,1]^2 via sorted angles
        n = rng.integers(3, 7)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.1, 0.45)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1)
        pts = np.clip(pts, 0, 1)
        V = 8
        polys = np.tile(pad_poly(pts, V)[None], (len(rects), 1, 1))
        rings = clip_polys_rects(polys, rects)
        areas = polygon_areas(rings)
        x, y = pts[:, 0], pts[:, 1]
        total = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        np.testing.assert_allclose(areas.sum(), total, rtol=1e-13)
        assert (areas > -1e-15).all()


def test_nonconvex_polygon():
    # L-shape: area 3, clip against square covering lower half
    L = [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]]
    a, _ = clip1(L, [0, 0, 2, 2], V=16)
    np.testing.assert_allclose(a, 3.0, atol=1e-13)
    a, _ = clip1(L, [0, 0, 2, 0.5], V=16)
    np.testing.assert_allclose(a, 1.0, atol=1e-13)
    a, _ = clip1(L, [0.5, 0.5, 2, 2], V=16)
    # region: x>=.5,y>=.5 of L = (full L) minus strips:
    # L ∩ box = [0.5,2]x[0.5,1] ∪ [0.5,1]x[1,2] = 1.5*0.5 + 0.5*1 = 1.25
    np.testing.assert_allclose(a, 1.25, atol=1e-13)


def test_centroid_of_offcenter_clip():
    a, c = clip1([[0, 0], [4, 0], [4, 4], [0, 4]], [3, 3, 10, 10])
    np.testing.assert_allclose(a, 1.0)
    np.testing.assert_allclose(c, [3.5, 3.5])


def test_jax_engine_matches_oracle():
    import jax.numpy as jnp
    from icebin_tpu.ops.clip import clip_areas_centroids

    rng = np.random.default_rng(3)
    B, V = 64, 8
    n = rng.integers(3, 8, B)
    polys = np.zeros((B, V, 2))
    for b in range(B):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n[b]))
        r = rng.uniform(0.2, 1.5)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=-1)
        polys[b] = pad_poly(pts, V)
    rects = np.stack([rng.uniform(-1, 0, B), rng.uniform(-1, 0, B),
                      rng.uniform(0.1, 1, B), rng.uniform(0.1, 1, B)], axis=-1)
    a_np = polygon_areas(clip_polys_rects(polys, rects))
    c_np = polygon_centroids(clip_polys_rects(polys, rects))
    a_j, c_j = clip_areas_centroids(jnp.asarray(polys), jnp.asarray(rects))
    np.testing.assert_allclose(np.asarray(a_j), a_np, atol=1e-13)
    np.testing.assert_allclose(np.asarray(c_j), c_np, atol=1e-12)


def test_pallas_kernel_matches_oracle():
    """Pallas TPU kernel (interpret mode on CPU) vs the f64 oracle."""
    import jax.numpy as jnp
    from icebin_tpu.ops.pallas_clip import clip_areas_centroids_pallas

    rng = np.random.default_rng(5)
    B, V = 256, 8
    polys = np.zeros((B, V, 2))
    for b in range(B):
        n = rng.integers(3, 8)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.2, 1.5)
        polys[b] = pad_poly(np.stack([r * np.cos(ang), r * np.sin(ang)], -1), V)
    h = rng.uniform(0.1, 1.0, (B, 2))
    rects = np.stack([-h[:, 0], -h[:, 1], h[:, 0], h[:, 1]], -1)
    a_np = polygon_areas(clip_polys_rects(polys, rects))
    c_np = polygon_centroids(clip_polys_rects(polys, rects))
    a, c = clip_areas_centroids_pallas(jnp.asarray(polys), jnp.asarray(rects))
    np.testing.assert_allclose(np.asarray(a), a_np, atol=2e-5)
    # centroids of tiny slivers amplify f32 noise (divide by 6*area); they
    # only feed smoother distances, so test at meaningful areas
    nz = np.abs(a_np) > 1e-4
    np.testing.assert_allclose(np.asarray(c)[nz], c_np[nz], atol=1e-3)


def test_pallas_engine_end_to_end_exchange():
    """engine='pallas' through make_exchange_grid (V0 padding, repair)."""
    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY

    specA = GridSpecLonLat(lonb=np.linspace(0, 40, 9),
                           latb=np.linspace(30, 80, 11))
    specI = GridSpecXY(xb=np.linspace(0, 40, 51), yb=np.linspace(30, 80, 51),
                       projection=PlateCarree())
    xg = make_exchange_grid(specA, specI, subdiv=1, engine="pallas")
    np.testing.assert_allclose(xg.area_sums_I(), specI.cell_areas(),
                               rtol=1e-12)


def test_native_engine_matches_oracle():
    """C++ host engine (native/clip.cc) vs the f64 numpy oracle, exact."""
    from icebin_tpu.ops import native
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    B, V = 4096, 8
    ang = np.sort(rng.uniform(0, 2 * np.pi, (B, V)), axis=1)
    r = rng.uniform(0.2, 1.5, (B, 1))
    polys = np.stack([r * np.cos(ang), r * np.sin(ang)], -1)
    rects = np.stack([rng.uniform(-1, 0, B), rng.uniform(-1, 0, B),
                      rng.uniform(0.1, 1, B), rng.uniform(0.1, 1, B)], -1)
    a1, c1 = native.clip_areas_centroids_native(polys, rects)
    a2 = polygon_areas(clip_polys_rects(polys, rects))
    c2 = polygon_centroids(clip_polys_rects(polys, rects))
    np.testing.assert_allclose(a1, a2, atol=1e-13)
    nz = np.abs(a2) > 1e-10
    np.testing.assert_allclose(c1[nz], c2[nz], atol=1e-10)


def test_native_engine_end_to_end_exchange():
    from icebin_tpu.ops import native
    if not native.available():
        pytest.skip("native library not built")
    from icebin_tpu.grid.exchange import make_exchange_grid
    from icebin_tpu.grid.proj import PlateCarree
    from icebin_tpu.grid.spec import GridSpecLonLat, GridSpecXY

    specA = GridSpecLonLat(lonb=np.linspace(0, 40, 9),
                           latb=np.linspace(30, 80, 11))
    specI = GridSpecXY(xb=np.linspace(0, 40, 101), yb=np.linspace(30, 80, 101),
                       projection=PlateCarree())
    xg_n = make_exchange_grid(specA, specI, subdiv=1, engine="native")
    xg_o = make_exchange_grid(specA, specI, subdiv=1, engine="numpy")
    np.testing.assert_array_equal(xg_n.iA, xg_o.iA)
    np.testing.assert_array_equal(xg_n.iI, xg_o.iI)
    np.testing.assert_allclose(xg_n.area, xg_o.area, rtol=1e-14)


def test_native_coo_sum():
    from icebin_tpu.ops import native
    if not native.available():
        pytest.skip("native library not built")
    r, c, v = native.coo_sum_sorted([0, 0, 1, 2, 2], [1, 1, 0, 3, 3],
                                    [1.0, 2.0, 3.0, 4.0, 5.0])
    assert r.tolist() == [0, 1, 2]
    assert c.tolist() == [1, 0, 3]
    assert v.tolist() == [3.0, 3.0, 9.0]
